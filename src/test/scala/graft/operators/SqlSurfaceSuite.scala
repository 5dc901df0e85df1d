package graft.operators

import graft.SparkSpec

/** The pure-SQL surface injected by GraftExtensions (applied to every
  * GraftSession-built session): the GRAFT_ASOF statement form must
  * plan the native AsOfJoinExec, everything else must pass through to
  * Spark's parser untouched.
  */
class SqlSurfaceSuite extends SparkSpec {

  private lazy val s2 = spark

  test("GRAFT_ASOF statement plans the native exec from pure SQL") {
    import s2.implicits._
    Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "t", "tag")
      .createOrReplaceTempView("asof_l")
    Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0)).toDF("k", "rt", "v")
      .createOrReplaceTempView("asof_r")
    val df = s2.sql("GRAFT_ASOF(asof_l, asof_r, k, t, rt, v)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec not planned:\n$plan")
    assert(!plan.contains("WindowExec"), s"fell back to the window form:\n$plan")
    val got = df.orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(100.0)), (1L, 20L, Some(150.0)), (2L, 5L, None)))
    // composes into larger SQL through a temp view, like any relation
    df.createOrReplaceTempView("asof_out")
    assert(s2.sql("SELECT count(*) FROM asof_out WHERE v IS NOT NULL")
      .head().getLong(0) == 2L)
  }

  test("non-GRAFT_ASOF statements pass through to Spark's parser") {
    assert(s2.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)
    // a look-alike with string-literal args is NOT the statement form:
    // it must fall through and fail with Spark's own diagnostics
    intercept[Exception] { s2.sql("GRAFT_ASOF('a', 'b', k, t, rt, v)") }
  }

  test("GRAFT_READ / GRAFT_VERSIONS expose versioned tables to pure SQL") {
    import graft.pipeline.{Append, MergeUpsert, SinkSpec, Writer}
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlvt").toString + "/t"
    Writer.write(s2, Seq((1L, "a"), (2L, "b")).toDF("hash_key", "v"),
      SinkSpec(root, mode = Append, versioned = true))
    Writer.write(s2, Seq((2L, "b2"), (3L, "c")).toDF("hash_key", "v"),
      SinkSpec(root, mode = MergeUpsert, versioned = true))
    // newest snapshot
    assert(s2.sql(s"GRAFT_READ('$root')").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // time travel
    assert(s2.sql(s"GRAFT_READ('$root', 1)").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "a", 2L -> "b"))
    // incremental read (v2 was a merge rewrite, so everything is new)
    assert(s2.sql(s"GRAFT_READ('$root', SINCE 1)").count() == 3L)
    // composes into larger SQL through a temp view
    s2.sql(s"GRAFT_READ('$root')").createOrReplaceTempView("vt_sql_out")
    assert(s2.sql("SELECT count(*) FROM vt_sql_out WHERE v LIKE 'b%'")
      .head().getLong(0) == 1L)
    // commit history
    val h = s2.sql(s"GRAFT_VERSIONS('$root')").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(h.forall(_.getInt(2) >= 1))
    // an unversioned path fails with the library's loud diagnostic —
    // GRAFT_VERSIONS included (an empty result would read as "no
    // commits yet")
    intercept[IllegalArgumentException] { s2.sql("GRAFT_READ('/tmp/nope_vt')") }
    intercept[IllegalArgumentException] { s2.sql("GRAFT_VERSIONS('/tmp/nope_vt')") }
    // a version literal too wide for Long is NOT the statement form:
    // strict fallthrough to SPARK'S parser and its own diagnostics —
    // pinned to ParseException so a regression back to toLong inside
    // graft's parser (NumberFormatException) cannot pass
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      s2.sql(s"GRAFT_READ('$root', 99999999999999999999)")
    }
    // the commit-time format record is honored: a json table reads
    // through the SQL surface without naming its format
    val jroot = java.nio.file.Files.createTempDirectory("graft_sqljt").toString + "/t"
    Writer.write(s2, Seq((7L, "j")).toDF("hash_key", "v"),
      SinkSpec(jroot, mode = Append, versioned = true, format = "json"))
    assert(s2.sql(s"GRAFT_READ('$jroot')").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq == Seq(7L -> "j"))
  }

  test("GRAFT_READ routes flat parquet tables through the DSv2 face: SQL gets skipping") {
    import graft.pipeline.VersionedTable
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlskip").toString + "/t"
    VersionedTable.commit(s2, root, "parquet",
      _ => s2.range(0, 800).select(col("id"), concat(lit("r"), col("id")).as("v"))
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    s2.sql(s"GRAFT_READ('$root')").createOrReplaceTempView("skip_vt")
    val df = s2.sql("SELECT v FROM skip_vt WHERE id = 7")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("r7"))
    val planned = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
          .fileIndex.inputFiles.length
    }
    assert(planned == Seq(1),
      s"SQL point lookup through GRAFT_READ must plan 1 of 8 files, planned $planned")
    // hive-partitioned tables still take the per-branch V1 route
    val hroot = java.nio.file.Files.createTempDirectory("graft_sqlhive").toString + "/t"
    import s2.implicits._
    VersionedTable.commit(s2, hroot, "parquet",
      _ => Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    assert(s2.sql(s"GRAFT_READ('$hroot')").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
  }

  test("GRAFT_DIFF exposes keyed versioned CDC to pure SQL") {
    import graft.pipeline.{Append, Overwrite, SinkSpec, Writer}
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqldiff").toString + "/t"
    Writer.write(s2, Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "v"),
      SinkSpec(root, mode = Overwrite, versioned = true))
    Writer.write(s2, Seq((1L, "a", 10), (2L, "B", 21), (3L, "c", 30)).toDF("k", "s", "v"),
      SinkSpec(root, mode = Overwrite, versioned = true))
    Writer.write(s2, Seq((9L, "z", 90)).toDF("k", "s", "v"),
      SinkSpec(root, mode = Append, versioned = true))
    // general path (v2 is a rewrite): full classification, COMPARE
    // defaulting to all non-key columns
    val got = s2.sql(s"GRAFT_DIFF('$root', 1, 2, KEY k)").collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("change_type"), r.getAs[String]("changed_cols"))).toMap
    assert(got == Map(2L -> (("changed", "s,v")), 3L -> (("added", null))))
    // explicit COMPARE list narrows the attribution
    val narrowed = s2.sql(s"GRAFT_DIFF('$root', 1, 2, KEY k, COMPARE s)").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("changed_cols")).toMap
    assert(narrowed == Map(2L -> "s", 3L -> null))
    // append-only span: O(delta) fast path, no join in the plan
    val fast = s2.sql(s"GRAFT_DIFF('$root', 2, 3, KEY k)")
    assert(!fast.queryExecution.executedPlan.toString.contains("Join"))
    assert(fast.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type")))
      .toSeq == Seq((9L, "added")))
    // composes into larger SQL through a temp view
    fast.createOrReplaceTempView("diff_sql_out")
    assert(s2.sql("SELECT count(*) FROM diff_sql_out WHERE change_type = 'added'")
      .head().getLong(0) == 1L)
    // absent table: the library's loud diagnostic
    intercept[IllegalArgumentException] { s2.sql("GRAFT_DIFF('/tmp/nope_vt', 1, 2, KEY k)") }
  }

  test("GRAFT_COMPACT / GRAFT_VACUUM expose table maintenance to pure SQL") {
    import graft.pipeline.{Append, SinkSpec, VersionedTable, Writer}
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlmnt").toString + "/t"
    (1 to 3).foreach { i =>
      Writer.write(s2, Seq((i.toLong, s"v$i")).toDF("k", "v"),
        SinkSpec(root, mode = Append, versioned = true))
    }
    assert(VersionedTable.currentSnapshot(s2, root).get.dataDirs.length == 3)
    // compaction folds the three delta dirs into one; the summary row
    // reports the committed version and the resulting entry count
    val c = s2.sql(s"GRAFT_COMPACT('$root')").head()
    assert(c.getLong(0) == 4L && c.getInt(1) == 1, s"unexpected summary: $c")
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 3L)
    // vacuum retires everything but the newest version (grace 0: this
    // test owns the table); the old delta dirs leave the disk
    val vac = s2.sql(s"GRAFT_VACUUM('$root', KEEP 1, GRACE 0)").head()
    // stable schema: (newest_version, files_swept, versions_kept) on
    // BOTH table formats; the inapplicable count is null
    assert(vac.getLong(0) == 4L && vac.isNullAt(1) && vac.getInt(2) == 1,
      s"unexpected summary: $vac")
    assert(VersionedTable.history(s2, root).map(_.version) == Seq(4L))
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 3L)

    // OPTIMIZE-with-ZORDER: the compacted dir is Morton-clustered into
    // the requested file count
    val zc = s2.sql(s"GRAFT_COMPACT('$root', ZORDER BY k, FILES 2)").head()
    assert(zc.getLong(0) == 5L && zc.getInt(1) == 1)
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 3L)

    // a hive-partitioned table compacts with its layout preserved
    val proot = java.nio.file.Files.createTempDirectory("graft_sqlmnp").toString + "/t"
    Seq("US", "DE").foreach { cc =>
      Writer.write(s2, Seq((1L, cc), (2L, cc)).toDF("k", "cc"),
        SinkSpec(proot, mode = Append, versioned = true, partitionBy = Seq("cc")))
    }
    s2.sql(s"GRAFT_COMPACT('$proot', PARTITION BY cc)")
    val dir = VersionedTable.currentSnapshot(s2, proot).get.dataDirs.head
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(proot, dir, "cc=US")),
      "compaction must preserve the hive layout under PARTITION BY")
    assert(s2.sql(s"GRAFT_READ('$proot')").where("cc = 'DE'").count() == 2L)

    // absent table: the library's loud diagnostics, not empty results
    intercept[IllegalArgumentException] { s2.sql("GRAFT_COMPACT('/tmp/nope_vt')") }
    intercept[IllegalArgumentException] { s2.sql("GRAFT_VACUUM('/tmp/nope_vt')") }
  }

  test("GRAFT_CHANGES serves the Delta change feed; non-delta roots refuse") {
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlcdf").toString + "/t"
    graft.sources.DeltaWrite.append(s2,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)                    // v0
    graft.sources.DeltaWrite.setProperties(s2, root,
      Map("delta.enableChangeDataFeed" -> "true"))                        // v1
    graft.sources.DeltaWrite.delete(s2, root, "id = 1")                   // v2
    val ch = s2.sql(s"GRAFT_CHANGES('$root', FROM 2)")
    assert(ch.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    val row = ch.select($"id", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(row == Seq((1L, "delete", 2L)))
    // the bounded TO form parses; pre-CDF history serves via derivation
    // (the CDF-enabled gate reads the END version's configuration)
    assert(s2.sql(s"GRAFT_CHANGES('$root', FROM 0, TO 2)")
      .where($"_change_type" === "insert" && $"_commit_version" === 0L)
      .count() == 2L)
    // WITH ROW IDS keys the feed (rowTracking + id-carrying cdc rows)
    graft.sources.DeltaWrite.setProperties(s2, root,
      Map("delta.enableRowTracking" -> "true",
        "delta.rowTracking.materializedRowIdColumnName" -> "_mat_rid"))   // v3
    val ridOf2 = graft.sources.DeltaRead.readWithRowIds(s2, root)
      .where($"id" === 2L).select($"_row_id").head().getLong(0)
    graft.sources.DeltaWrite.delete(s2, root, "id = 2")                   // v4
    val keyed = s2.sql(s"GRAFT_CHANGES('$root', FROM 4, WITH ROW IDS)")
    assert(keyed.columns.last == "_row_id")
    val krow = keyed.select($"id", $"_change_type", $"_row_id")
      .as[(Long, String, Long)].collect().toSeq
    // the delete row carries the retired id the live read had
    assert(krow == Seq((2L, "delete", ridOf2)), s"keyed feed: $krow")
    // versioned roots route to GRAFT_DIFF instead
    val vroot = java.nio.file.Files.createTempDirectory("graft_sqlcdf_v").toString + "/t"
    import graft.pipeline.{Append, SinkSpec, Writer}
    Writer.write(s2, Seq((1L, "x")).toDF("id", "v"),
      SinkSpec(format = "parquet", path = vroot, mode = Append, versioned = true))
    val e = intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_CHANGES('$vroot', FROM 0)")
    }
    assert(e.getMessage.contains("GRAFT_DIFF"), e.getMessage)
  }

  test("GRAFT_SET_PROPERTIES drives TBLPROPERTIES (and the CDF enable) from SQL") {
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlprops").toString + "/t"
    graft.sources.DeltaWrite.append(s2, Seq((1L, "a")).toDF("id", "v"), root) // v0
    val r = s2.sql(s"GRAFT_SET_PROPERTIES('$root', " +
      "SET 'delta.enableChangeDataFeed'='true', 'graft.owner'='teamA')").head()
    assert(r.getLong(0) == 1L && r.getInt(1) == 2 && r.getInt(2) == 0)
    val snap = graft.sources.DeltaRead.snapshot(s2, root)
    assert(snap.configuration("delta.enableChangeDataFeed") == "true" &&
      snap.configuration("graft.owner") == "teamA")
    assert(snap.minWriter >= 4, "enabling CDF from SQL must upgrade the protocol")
    // the whole SQL loop: delete under CDF, then read the change feed
    s2.sql(s"GRAFT_DELETE('$root', WHERE id = 1)")                            // v2
    assert(s2.sql(s"GRAFT_CHANGES('$root', FROM 2)").head().getString(2) == "delete")
    // UNSET drops a key; a no-op re-set commits nothing
    val u = s2.sql(s"GRAFT_SET_PROPERTIES('$root', UNSET 'graft.owner')").head()
    assert(u.getLong(0) == 3L && u.getInt(1) == 0 && u.getInt(2) == 1)
    assert(!graft.sources.DeltaRead.snapshot(s2, root).configuration.contains("graft.owner"))
    assert(s2.sql(s"GRAFT_SET_PROPERTIES('$root', UNSET 'graft.owner')")
      .head().getLong(0) == 3L)
    // versioned roots refuse (no configuration concept)
    val vroot = java.nio.file.Files.createTempDirectory("graft_sqlprops_v").toString + "/t"
    import graft.pipeline.{Append, SinkSpec, Writer}
    Writer.write(s2, Seq((1L, "x")).toDF("id", "v"),
      SinkSpec(format = "parquet", path = vroot, mode = Append, versioned = true))
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_SET_PROPERTIES('$vroot', SET 'a'='b')")
    }
  }

  test("delta roots route through the SAME maintenance SQL: compact/vacuum/delete/checkpoint/purge") {
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqldelta").toString + "/t"
    graft.sources.DeltaWrite.append(s2,
      (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4), root)
    // DV-emitting delete through the shared statement
    val d = s2.sql(s"GRAFT_DELETE('$root', WHERE id < 100)").head()
    assert(d.getLong(0) == 1L)
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 900L)
    assert(graft.sources.DeltaRead.snapshot(s2, root).dvs.nonEmpty)
    // purge materializes the masks (REORG PURGE)
    val p = s2.sql(s"GRAFT_PURGE('$root', FRACTION 0.01)").head()
    assert(p.getLong(0) == 2L && p.getInt(1) == 0, s"unexpected purge summary: $p")
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 900L)
    // compact folds the files
    val c = s2.sql(s"GRAFT_COMPACT('$root', FILES 1)").head()
    assert(c.getLong(0) == 3L && c.getInt(1) == 1, s"unexpected compact summary: $c")
    // PARTITION BY stays the Delta log's business
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_COMPACT('$root', PARTITION BY v, FILES 2)")
    }
    // checkpoint folds the log; vacuum (GRACE only) reclaims the old files
    val ck = s2.sql(s"GRAFT_CHECKPOINT('$root')").head()
    assert(ck.getLong(0) == 3L)
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_VACUUM('$root', KEEP 1, GRACE 0)")
    }
    val vac = s2.sql(s"GRAFT_VACUUM('$root', GRACE 0)").head()
    assert(vac.getLong(0) == 3L && vac.getInt(1) > 0 && vac.isNullAt(2),
      s"unexpected vacuum summary: $vac")
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 900L)
    // OPTIMIZE ZORDER parity: clustered dataChange=false rewrite
    val zc = s2.sql(s"GRAFT_COMPACT('$root', ZORDER BY id, FILES 2)").head()
    assert(zc.getLong(0) == 4L && zc.getInt(1) == 2, s"unexpected zorder summary: $zc")
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 900L)
    // multi-part checkpoint through SQL
    val ck2 = s2.sql(s"GRAFT_CHECKPOINT('$root', PARTS 2)").head()
    assert(ck2.getLong(0) == 4L)
    val partNames = new java.io.File(root, "_delta_log").list()
      .filter(_.matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
    assert(partNames.nonEmpty, "PARTS 2 must write a multi-part run")
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 900L)
  }

  test("GRAFT_DELETE removes matching rows through the stats-pruned commit") {
    import graft.pipeline.{Append, SinkSpec, VersionedTable, Writer}
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqldel").toString + "/t"
    Writer.write(s2, (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"),
      SinkSpec(root, mode = Append, versioned = true))
    val d = s2.sql(s"GRAFT_DELETE('$root', WHERE k > 7)").head()
    assert(d.getLong(0) == 2L)
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 7L)
    assert(s2.sql(s"GRAFT_READ('$root', 1)").count() == 10L) // time travel intact
    // string conditions with quotes pass through
    s2.sql(s"GRAFT_DELETE('$root', WHERE v = 'v3')")
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 6L)
    intercept[IllegalArgumentException] { s2.sql("GRAFT_DELETE('/tmp/nope_vt', WHERE k > 0)") }
  }

  test("GRAFT_READ TIMESTAMP: time travel by commit time on versioned and delta roots") {
    import graft.pipeline.{Append, SinkSpec, Writer}
    import s2.implicits._
    def fmtTs(ms: Long) = new java.sql.Timestamp(ms).toString
    // versioned root: v1, capture a mid-point, v2
    val root = java.nio.file.Files.createTempDirectory("graft_sqlts").toString + "/t"
    Writer.write(s2, Seq((1L, "a")).toDF("k", "v"), SinkSpec(root, mode = Append, versioned = true))
    Thread.sleep(1100)
    val mid = System.currentTimeMillis
    Thread.sleep(1100)
    Writer.write(s2, Seq((2L, "b")).toDF("k", "v"), SinkSpec(root, mode = Append, versioned = true))
    assert(s2.sql(s"GRAFT_READ('$root', TIMESTAMP '${fmtTs(mid)}')").count() == 1L)
    assert(s2.sql(s"GRAFT_READ('$root', TIMESTAMP '${fmtTs(System.currentTimeMillis)}')")
      .count() == 2L)
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_READ('$root', TIMESTAMP '2001-01-01 00:00:00')")
    }
    // delta root: same statement, delta-spark's timestampAsOf rule
    val droot = java.nio.file.Files.createTempDirectory("graft_sqltsd").toString + "/t"
    graft.sources.DeltaWrite.append(s2, Seq((1L, "a")).toDF("k", "v"), droot)
    Thread.sleep(1100)
    val dmid = System.currentTimeMillis
    Thread.sleep(1100)
    graft.sources.DeltaWrite.append(s2, Seq((2L, "b")).toDF("k", "v"), droot)
    assert(s2.sql(s"GRAFT_READ('$droot', TIMESTAMP '${fmtTs(dmid)}')").count() == 1L)
    // unparsable timestamp refuses loudly
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_READ('$droot', TIMESTAMP 'not-a-time')")
    }
  }

  test("GRAFT_UPDATE rewrites matching rows in place on a versioned root") {
    import graft.pipeline.{Append, SinkSpec, Writer}
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlupd").toString + "/t"
    Writer.write(s2, (1L to 10L).map(k => (k, k * 10, s"v$k")).toDF("k", "n", "v"),
      SinkSpec(root, mode = Append, versioned = true))
    // multi-assignment with an expression containing a comma (round's
    // second arg) and a swap-flavored RHS reading pre-update columns
    val u = s2.sql(s"GRAFT_UPDATE('$root', " +
      "SET n = round(n + k, 0), v = concat(v, '!'), WHERE k <= 3)").head()
    assert(u.getLong(0) == 2L)
    val rows = s2.sql(s"GRAFT_READ('$root')").orderBy("k")
      .as[(Long, Long, String)].collect()
    assert(rows.length == 10)
    rows.foreach { case (k, n, v) =>
      if (k <= 3) assert(n == k * 10 + k && v == s"v$k!", s"row $k: ($n, $v)")
      else assert(n == k * 10 && v == s"v$k", s"row $k must be untouched: ($n, $v)")
    }
    // time travel intact; malformed SET refuses loudly
    assert(s2.sql(s"GRAFT_READ('$root', 1)").count() == 10L)
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_UPDATE('$root', SET nope = 1, WHERE k = 1)")
    }
    // SET touching its own WHERE column: rows must UPDATE, not vanish
    // (the replaceWhere region re-filter must not see post-update values)
    s2.sql(s"GRAFT_UPDATE('$root', SET k = k + 100, WHERE k <= 2)")
    val ks = s2.sql(s"GRAFT_READ('$root')").select("k").orderBy("k")
      .as[Long].collect().toSeq
    assert(ks == Seq(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 101L, 102L),
      s"rows vanished or failed to move: $ks")
    // commas inside string literals neither split the SET list nor
    // truncate at a literal containing ', where '
    s2.sql(s"GRAFT_UPDATE('$root', SET v = 'a, where b = 2', WHERE k = 3)")
    assert(s2.sql(s"GRAFT_READ('$root')").where("k = 3").select("v")
      .as[String].head() == "a, where b = 2")
    // a column NAMED with a WHERE prefix is a SET entry, not the clause
    // boundary (word-boundary match, not startsWith)
    val root2 = java.nio.file.Files.createTempDirectory("graft_sqlupw").toString + "/t"
    Writer.write(s2, Seq((1L, 0L), (2L, 0L)).toDF("k", "whereabouts"),
      SinkSpec(root2, mode = Append, versioned = true))
    s2.sql(s"GRAFT_UPDATE('$root2', SET whereabouts = 7, WHERE k = 1)")
    assert(s2.sql(s"GRAFT_READ('$root2')").orderBy("k").select("whereabouts")
      .as[Long].collect().toSeq == Seq(7L, 0L))
  }

  test("GRAFT_APPEND / GRAFT_MERGE: pure-SQL versioned writes") {
    import graft.pipeline.VersionedTable
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlwr").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("hash_key", "v").createOrReplaceTempView("wr_src")
    // append #1: a catalog-resolved query (temp view)
    assert(s2.sql(s"GRAFT_APPEND('$root', SELECT * FROM wr_src)").head().getLong(0) == 1L)
    // append #2: inline projection with nested parens
    s2.sql(s"GRAFT_APPEND('$root', SELECT CAST(3 AS BIGINT) AS hash_key, upper('c') AS v)")
    assert(VersionedTable.currentSnapshot(s2, root).get.version == 2L)
    // merge: source row wins on the key, unmatched base survives
    val mv = s2.sql(
      s"GRAFT_MERGE('$root', KEY hash_key, SELECT CAST(2 AS BIGINT) AS hash_key, 'b2' AS v)")
      .head().getLong(0)
    assert(mv == 3L)
    assert(s2.sql(s"GRAFT_READ('$root')").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "C"))
    // time travel unaffected
    assert(s2.sql(s"GRAFT_READ('$root', 1)").count() == 2L)
    // a malformed inner query fails with Spark's own diagnostics
    intercept[Exception] { s2.sql(s"GRAFT_APPEND('$root', SELEKT 1)") }
  }

  test("GRAFT_BRANCH family: pure-SQL branch create / write / read / publish / drop") {
    import graft.pipeline.VersionedTable
    import s2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlbr").toString + "/t"
    s2.sql(s"GRAFT_APPEND('$root', SELECT CAST(1 AS BIGINT) AS id, 'a' AS v)")
    val created = s2.sql(s"GRAFT_BRANCH('$root', 'exp')").head()
    assert(created.getString(0) == "exp" && created.getLong(1) == 1L)
    assert(s2.sql(s"GRAFT_BRANCHES('$root')").collect().map(_.getString(0)).toSeq == Seq("exp"))
    // branch writes/reads ride the path#branch= form on the EXISTING statements
    s2.sql(s"GRAFT_APPEND('$root#branch=exp', SELECT CAST(2 AS BIGINT) AS id, 'b' AS v)")
    assert(s2.sql(s"GRAFT_READ('$root#branch=exp')").count() == 2L)
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 1L) // main untouched
    assert(s2.sql(s"GRAFT_VERSIONS('$root#branch=exp')").count() == 2L)
    // the audit step: what publish would change on main
    val diff = s2.sql(s"GRAFT_BRANCH_DIFF('$root', 'exp', KEY id)").collect()
    assert(diff.length == 1 && diff.head.getAs[String]("change_type") == "added" &&
      diff.head.getAs[Long]("id") == 2L, diff.mkString(","))
    // publish fast-forwards main; drop reclaims the name
    val pub = s2.sql(s"GRAFT_PUBLISH('$root', 'exp')").head()
    assert(pub.getLong(1) == 2L)
    assert(s2.sql(s"GRAFT_READ('$root')").count() == 2L)
    assert(s2.sql(s"GRAFT_BRANCH_DROP('$root', 'exp')").head().getBoolean(1))
    assert(s2.sql(s"GRAFT_BRANCHES('$root')").count() == 0L)
    // vacuum on a branch path refuses loudly
    VersionedTable.createBranch(s2, root, "exp2")
    intercept[IllegalArgumentException] {
      s2.sql(s"GRAFT_VACUUM('$root#branch=exp2', KEEP 1, GRACE 0)")
    }
  }

  test("graft native functions are SQL-callable in the extensions session") {
    val r = s2.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
    assert(math.abs(r.head().getDouble(0) - 9.0) < 1e-6)
  }
}
