package graft.pipeline

import graft.SparkSpec
import graft.quality._
import org.apache.spark.sql.functions._

class DdlSuite extends SparkSpec {
  import spark.implicits._

  private def spec(table: String, cols: Seq[ColumnSpec], pk: Seq[String],
                   scd: Boolean = false, logTable: Option[String] = None) =
    PipelineSpec("ddl_test", Nil,
      Seq(Transform(cols, pk, addControlColumns = true)),
      sink = Some(SinkSpec(path = "", mode = if (scd) Scd2() else Append, table = Some(table))),
      description = Some("ddl test table"),
      validationLogTable = logTable)

  private val baseCols = Seq(
    ColumnSpec("id", dataType = Some("bigint"), description = Some("surrogate id")),
    ColumnSpec("name", dataType = Some("string")))

  test("create: columns + control columns + pk table property, idempotent") {
    val t = "ddl_create_t1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Ddl.create(spark, spec(t, baseCols, Seq("id")))
    assert(spark.table(t).schema.fieldNames.toSeq ==
      Seq("id", "name", "created_at", "hash_key", "updated_at"))
    assert(Ddl.primaryKeys(spark, t) == Seq("id"))
    Ddl.create(spark, spec(t, baseCols, Seq("id"))) // second call is a no-op
    spark.sql(s"DROP TABLE $t")
  }

  test("create: scd2 sink emits lifecycle columns instead of created_at") {
    val t = "ddl_create_scd2"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Ddl.create(spark, spec(t, baseCols, Seq("id"), scd = true))
    val fields = spark.table(t).schema.fieldNames.toSeq
    assert(fields.containsSlice(Seq("data_hash", "is_current", "start_date", "end_date")))
    assert(!fields.contains("created_at"))
    spark.sql(s"DROP TABLE $t")
  }

  test("create → write → evolve → read round-trip; pk change reprocesses hash_key") {
    val t = "ddl_evolve_t1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Ddl.create(spark, spec(t, baseCols, Seq("id")))

    // Write through the pipeline transform (hash_key over pk=id).
    val tr = Transform(baseCols, Seq("id"), addControlColumns = true)
    Pipeline.transform(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), tr)
      .select(spark.table(t).columns.map(col): _*)
      .write.insertInto(t)
    assert(spark.table(t).count() == 2)
    val oldHash = spark.table(t).where("id = 1").select("hash_key").as[String].head()
    assert(oldHash == sha2Hex("1"))

    // Evolve: new column + pk change (id) → (id, name).
    val cols2 = baseCols :+ ColumnSpec("segment", dataType = Some("string"),
      description = Some("market segment"))
    Ddl.update(spark, spec(t, cols2, Seq("id", "name")))
    assert(spark.table(t).schema.fieldNames.contains("segment"))
    assert(Ddl.primaryKeys(spark, t) == Seq("id", "name"))
    // hash_key reprocessed for EXISTING rows from the new pk set.
    val newHash = spark.table(t).where("id = 1").select("hash_key").as[String].head()
    assert(newHash == sha2Hex("1||a"))
    // pre-evolution rows read null for the added column
    assert(spark.table(t).where("segment IS NULL").count() == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("update without prior create throws") {
    intercept[IllegalStateException] {
      Ddl.update(spark, spec("ddl_never_created", baseCols, Seq("id")))
    }
  }

  test("validation log table accepts the Validator failure log") {
    val t = "ddl_target_t2"; val logT = "ddl_vlog_t2"
    spark.sql(s"DROP TABLE IF EXISTS $t"); spark.sql(s"DROP TABLE IF EXISTS $logT")
    Ddl.create(spark, spec(t, baseCols, Seq("id"), logTable = Some(logT)))
    val df = Pipeline.addControlColumns(
      Seq((1L, "ok"), (2L, null.asInstanceOf[String])).toDF("id", "name"),
      Transform(Nil, Seq("id"), addControlColumns = true))
    val log = Validator.validate(df, "p", Seq(
      ColumnConstraints("name", Seq(Constraint(NotNull, WarnAction))))).failureLog
    log.write.insertInto(logT)
    val rows = spark.table(logT).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("hash_key") == sha2Hex("2"))
    assert(rows(0).getAs[java.sql.Timestamp]("log_timestamp") != null)
    spark.sql(s"DROP TABLE $t"); spark.sql(s"DROP TABLE $logT")
  }

  test("validate step appends warn failures to the declared catalog log table") {
    val logT = "ddl_vlog_step"
    spark.sql(s"DROP TABLE IF EXISTS $logT")
    Ddl.createValidationLog(spark, logT)
    val cols = Seq(
      ColumnSpec("id", dataType = Some("bigint")),
      ColumnSpec("name", dataType = Some("string"),
        constraints = Seq(Constraint(NotNull, WarnAction))))
    val p = PipelineSpec("vlog_pipe", Nil,
      Seq(Transform(cols, Seq("id"), addControlColumns = true), Validate(cols)),
      validationLogTable = Some(logT))
    val df = Seq((1L, "ok"), (2L, null.asInstanceOf[String])).toDF("id", "name")
    p.steps.foldLeft(df)(Pipeline(spark, p).applyStep)
    val rows = spark.table(logT).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("pipeline_name") == "vlog_pipe")
    assert(rows(0).getAs[String]("hash_key") == sha2Hex("2"))
    spark.sql(s"DROP TABLE $logT")
  }

  test("cli create/update/run/test actions execute against a spec") {
    val t = "ddl_cli_t3"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val s = spec(t, baseCols, Seq("id"))
    graft.Cli.execute(spark, "create", s)
    assert(Ddl.tableExists(spark, t))
    graft.Cli.execute(spark, "update",
      spec(t, baseCols :+ ColumnSpec("extra", dataType = Some("bigint")), Seq("id")))
    assert(spark.table(t).schema.fieldNames.contains("extra"))
    spark.sql(s"DROP TABLE $t")
  }

  test("catalog-table merge: cli create → run merge → re-run upserts in place") {
    val t = "ddl_merge_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val csvDir = java.nio.file.Files.createTempDirectory("graft_tblmerge")
    def specFor(csv: String) = PipelineSpec("tbl_merge_pipe",
      Seq(FileSource("src", csv, "csv", Map("header" -> "true"))),
      Seq(Transform(baseCols, Seq("id"), addControlColumns = true)),
      sink = Some(SinkSpec(path = "", mode = MergeUpsert, table = Some(t))))

    val snap1 = csvDir.resolve("s1.csv")
    java.nio.file.Files.writeString(snap1, "id,name\n1,ann\n2,bob\n")
    graft.Cli.execute(spark, "create", specFor(snap1.toString))
    assert(Ddl.tableExists(spark, t))
    graft.Cli.execute(spark, "run", specFor(snap1.toString))
    assert(spark.table(t).count() == 2)
    val created1 = spark.table(t).where("id = 1")
      .select("created_at").as[java.sql.Timestamp].head()

    // Second snapshot: id=2 changed, id=3 new, id=1 absent (survives).
    Thread.sleep(5) // created_at strictly earlier than the second run
    val snap2 = csvDir.resolve("s2.csv")
    java.nio.file.Files.writeString(snap2, "id,name\n2,bobby\n3,cyd\n")
    graft.Cli.execute(spark, "run", specFor(snap2.toString))
    val rows = spark.table(t).orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("ann", "bobby", "cyd"))
    // untouched base row keeps its created_at; so does the UPDATED row
    // (upsert preserves base created_at through the merge)
    assert(spark.table(t).where("id = 1")
      .select("created_at").as[java.sql.Timestamp].head() == created1)
    assert(spark.table(t).where("id = 2")
      .select("created_at").as[java.sql.Timestamp].head() == created1)
    spark.sql(s"DROP TABLE $t")
  }

  test("catalog-table scd2: changed rows expire and version in the named table") {
    val t = "ddl_scd2_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = java.nio.file.Files.createTempDirectory("graft_tblscd2")
    def specFor(csv: String) = PipelineSpec("tbl_scd2_pipe",
      Seq(FileSource("src", csv, "csv", Map("header" -> "true"))),
      Seq(Transform(baseCols, Seq("id"), addControlColumns = true)),
      sink = Some(SinkSpec(path = "", mode = Scd2(Seq("name")), table = Some(t))))

    val s1 = dir.resolve("s1.csv")
    java.nio.file.Files.writeString(s1, "id,name\n1,ann\n2,bob\n")
    graft.Cli.execute(spark, "create", specFor(s1.toString))
    graft.Cli.execute(spark, "run", specFor(s1.toString))
    assert(spark.table(t).where("is_current").count() == 2)

    val s2 = dir.resolve("s2.csv")
    java.nio.file.Files.writeString(s2, "id,name\n1,annie\n2,bob\n")
    graft.Cli.execute(spark, "run", specFor(s2.toString))
    val all = spark.table(t)
    assert(all.count() == 3) // 2 current + 1 expired version of id=1
    assert(all.where("is_current").count() == 2)
    val expired = all.where("NOT is_current").collect()
    assert(expired.length == 1 && expired(0).getAs[String]("name") == "ann")
    assert(expired(0).getAs[java.sql.Timestamp]("end_date") != null)
    assert(all.where("is_current AND id = 1").select("name").as[String].head() == "annie")
    spark.sql(s"DROP TABLE $t")
  }

  test("catalog-table dynamic partition overwrite replaces only touched partitions") {
    val t = "ddl_dynpart_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING, part STRING) USING parquet PARTITIONED BY (part)")
    def write(rows: Seq[(Long, String, String)]): Unit =
      Writer.write(spark, rows.toDF("id", "v", "part"),
        SinkSpec(path = "", mode = OverwritePartition, table = Some(t)))
    write(Seq((1L, "a", "p1"), (2L, "b", "p2")))
    write(Seq((3L, "c", "p2"))) // only p2 replaced; p1 survives
    val got = spark.table(t).collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("part"))).toSet
    assert(got == Set((1L, "p1"), (3L, "p2")), s"got $got")
    spark.sql(s"DROP TABLE $t")
  }

  test("bucketed tables join with no shuffle exchange") {
    val (ta, tb) = ("bk_orders", "bk_cust")
    spark.sql(s"DROP TABLE IF EXISTS $ta"); spark.sql(s"DROP TABLE IF EXISTS $tb")
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val cust = graft.Tables.load(spark, sfDir, "customer")
    Writer.writeBucketed(orders, ta, Seq("o_custkey"), 8)
    Writer.writeBucketed(cust, tb, Seq("c_custkey"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val j = spark.table(ta).join(spark.table(tb), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not re-shuffle:\n$plan")
      assert(j.count() == orders.count()) // every order has a customer
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE $ta"); spark.sql(s"DROP TABLE $tb")
    }
  }

  test("versioned sink: two concurrent merges both land, serialized, no lost update") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt").toString + "/t"
    def snk(mode: WriteMode) = SinkSpec(root, mode = mode, versioned = true)
    Writer.write(spark,
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("hash_key", "v", "gen"), snk(Overwrite))
    assert(VersionedTable.currentSnapshot(spark, root).get.version == 1L)
    // three writers race: an update of key 1 and two inserts. Each must
    // survive regardless of commit order — a loser of the manifest CAS
    // re-merges against the winner's snapshot instead of overwriting it.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val updates = Seq(
      Seq((1L, "a2", 2)), Seq((3L, "c", 2)), Seq((4L, "d", 2)))
    val done = updates.map(rows => Future {
      Writer.write(spark, rows.toDF("hash_key", "v", "gen"), snk(MergeUpsert))
    })
    Await.result(Future.sequence(done), scala.concurrent.duration.Duration(300, "s"))
    val fin = VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == Map(1L -> "a2", 2L -> "b", 3L -> "c", 4L -> "d"))
    // serialized history: seed + exactly one version per committer
    assert(VersionedTable.currentSnapshot(spark, root).get.version == 4L)
  }

  test("versioned sink: re-run is idempotent, old versions stay readable, vacuum retires them") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt2").toString + "/t"
    def snk(mode: WriteMode) = SinkSpec(root, mode = mode, versioned = true)
    Writer.write(spark, Seq((1L, "a"), (2L, "b")).toDF("hash_key", "v"), snk(Overwrite))
    val up = Seq((2L, "b2"), (3L, "c")).toDF("hash_key", "v")
    Writer.write(spark, up, snk(MergeUpsert))
    val afterOnce = VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterOnce == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // re-running the SAME merge commits a new version with identical
    // content (upsert is idempotent on hash_key)
    Writer.write(spark, up, snk(MergeUpsert))
    val afterTwice = VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterTwice == afterOnce)
    // committed versions are immutable snapshots: v1 still reads the
    // pre-merge table while HEAD is at v3
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 2L)
    assert(VersionedTable.currentSnapshot(spark, root).get.version == 3L)
    // vacuum(keep=1) retires v1/v2 pointers and their data dirs
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, 1L)
    }
    assert(VersionedTable.read(spark, root).count() == 3L)
  }

  test("versioned sink: appends are O(delta) pointer commits; compaction bounds dirs") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt4").toString + "/t"
    def snk(mode: WriteMode) = SinkSpec(root, mode = mode, versioned = true)
    Writer.write(spark, Seq((1L, "a")).toDF("hash_key", "v"), snk(Append))
    Writer.write(spark, Seq((2L, "b")).toDF("hash_key", "v"), snk(Append))
    val s2 = VersionedTable.currentSnapshot(spark, root).get
    // the second append did NOT rewrite: its version references the
    // first append's directory plus its own delta
    assert(s2.version == 2L && s2.dataDirs.length == 2)
    assert(VersionedTable.read(spark, root).count() == 2L)
    // a merge is FILE-PRUNED: only the directory whose hash_key stats
    // intersect the source (key 1) rewrites; the other carries over in
    // the pointer untouched — O(touched), not O(table)
    Writer.write(spark, Seq((1L, "a2")).toDF("hash_key", "v"), snk(MergeUpsert))
    val s3 = VersionedTable.currentSnapshot(spark, root).get
    assert(s3.version == 3L && s3.dataDirs.length == 2, s3.dataDirs)
    // the dir holding hash_key 2 (the second append) is untouched and
    // must carry over by reference; key 1's dir is the rewritten one
    assert(s3.dataDirs.contains(s2.dataDirs(1)),
      s"the untouched key-2 dir must carry over by reference: $s3 vs $s2")
    assert(VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "a2", 2L -> "b"))
    // past compactAfter the append compacts back to one directory
    import spark.implicits._
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((3L, "c")).toDF("hash_key", "v"), compactAfter = 2)
    assert(VersionedTable.currentSnapshot(spark, root).get.dataDirs.length == 1)
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((4L, "d")).toDF("hash_key", "v"), compactAfter = 2)
    val s5 = VersionedTable.currentSnapshot(spark, root).get
    assert(s5.version == 5L && s5.dataDirs.length == 2)
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L))
  }

  test("versioned sink: concurrent appends race on the pointer only, both land") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt5").toString + "/t"
    def snk = SinkSpec(root, mode = Append, versioned = true)
    Writer.write(spark, Seq((0L, "seed")).toDF("hash_key", "v"), snk)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val done = Seq(1L, 2L, 3L).map(k => Future {
      Writer.write(spark, Seq((k, s"v$k")).toDF("hash_key", "v"), snk)
    })
    Await.result(Future.sequence(done), scala.concurrent.duration.Duration(300, "s"))
    val s = VersionedTable.currentSnapshot(spark, root).get
    assert(s.version == 4L) // serialized: one version per committer
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 2L, 3L))
  }

  test("versioned sink: changesSince reads only appended deltas") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt6").toString + "/t"
    def snk = SinkSpec(root, mode = Append, versioned = true)
    Writer.write(spark, Seq((1L, "a")).toDF("hash_key", "v"), snk)
    Writer.write(spark, Seq((2L, "b"), (3L, "c")).toDF("hash_key", "v"), snk)
    // incremental consumption: only version 2's delta directory
    assert(VersionedTable.changesSince(spark, root, 1L).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    // caught up: empty (schema preserved)
    val upToDate = VersionedTable.changesSince(spark, root, 2L)
    assert(upToDate.count() == 0L && upToDate.columns.toSeq == Seq("hash_key", "v"))
    // a merge rewrites only the key-intersecting directories (file
    // pruning): their replacement rows read as new; the untouched
    // directory carried over by reference does NOT re-read
    Writer.write(spark, Seq((1L, "a2")).toDF("hash_key", "v"),
      SinkSpec(root, mode = MergeUpsert, versioned = true))
    assert(VersionedTable.changesSince(spark, root, 2L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq == Seq(1L -> "a2"))
    // vacuumed-away since-version fails loudly, not silently-full
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    intercept[IllegalArgumentException] {
      VersionedTable.changesSince(spark, root, 1L)
    }
  }

  test("versioned source: YAML type=versioned reads snapshot, pinned version, and delta") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vt7").toString
    val root = dir + "/t"
    def snk = SinkSpec(root, mode = Append, versioned = true)
    Writer.write(spark, Seq((1L, "a")).toDF("hash_key", "v"), snk)
    Writer.write(spark, Seq((2L, "b")).toDF("hash_key", "v"), snk)
    def run(extra: String): Long = {
      val spec = YamlLoader.load(
        s"""sources:
           |  - name: s
           |    type: versioned
           |    path: $root
           |$extra
           |steps:
           |  - type: filter
           |    params: { where: "1 = 1" }
           |""".stripMargin)
      Pipeline(spark, spec).run().count()
    }
    assert(run("") == 2L)                       // newest snapshot
    assert(run("    version: 1") == 1L)         // time travel
    assert(run("    since_version: 1") == 1L)   // incremental
  }

  test("versioned sink: YAML `versioned: true` routes the manifest commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vt3").toString
    val spec = YamlLoader.load(
      s"""sources:
         |  - name: s
         |    type: file
         |    path: $dir/in.parquet
         |target:
         |  name: t
         |  type: file
         |  path: $dir/out
         |  mode: merge
         |  versioned: true
         |""".stripMargin)
    assert(spec.sink.get.versioned)
    assert(spec.sink.get.mode == MergeUpsert)
    Seq((1L, "x")).toDF("hash_key", "v").write.parquet(dir + "/in.parquet")
    Writer.write(spark, spark.read.parquet(dir + "/in.parquet"), spec.sink.get)
    assert(VersionedTable.currentSnapshot(spark, dir + "/out").get.version == 1L)
    assert(VersionedTable.read(spark, dir + "/out").count() == 1L)
  }

  test("versioned catalog table: snapshot published as a view; merges serialize; DDL guards") {
    val root = java.nio.file.Files.createTempDirectory("graft_vtc").toString + "/t"
    val name = "vt_catalog_t1"
    spark.sql(s"DROP VIEW IF EXISTS $name")
    def snk(mode: WriteMode) =
      SinkSpec(root, mode = mode, table = Some(name), versioned = true)
    val pspec = PipelineSpec("vtc", Nil,
      Seq(Transform(baseCols, Seq("id"), addControlColumns = true)),
      sink = Some(snk(MergeUpsert)))
    try {
      // create is a no-op for the target: the catalog face is the view
      // the first commit publishes, not a pre-made physical table
      Ddl.create(spark, pspec)
      assert(!spark.catalog.tableExists(name))
      // seed commit → spark.table and pure SQL read v1 through the view
      Writer.write(spark, Seq((1L, "a"), (2L, "b")).toDF("hash_key", "v"), snk(Overwrite))
      assert(spark.table(name).collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a", 2L -> "b"))
      assert(spark.sql(s"SELECT v FROM $name WHERE hash_key = 2").as[String].head() == "b")
      // merge re-publishes; the view follows the new snapshot
      Writer.write(spark, Seq((2L, "b2"), (3L, "c")).toDF("hash_key", "v"), snk(MergeUpsert))
      assert(spark.table(name).collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a", 2L -> "b2", 3L -> "c"))
      // append = multi-directory snapshot → the view resolves the glob
      Writer.write(spark, Seq((4L, "d")).toDF("hash_key", "v"), snk(Append))
      assert(spark.table(name).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      // concurrent merges through the CATALOG sink: all land, serialized,
      // and the view ends at the final snapshot
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val done = Seq((1L, "a2"), (5L, "e")).map { case (k, v) => Future {
        Writer.write(spark, Seq((k, v)).toDF("hash_key", "v"), snk(MergeUpsert))
      }}
      Await.result(Future.sequence(done), scala.concurrent.duration.Duration(300, "s"))
      assert(spark.table(name).collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a2", 2L -> "b2", 3L -> "c", 4L -> "d", 5L -> "e"))
      // versions stay time-travelable underneath the view
      assert(VersionedTable.readVersion(spark, root, 1L).count() == 2L)
      // DDL guards: update refuses (no ALTER-able table); a versioned
      // catalog sink without a storage path fails loudly
      intercept[IllegalStateException] { Ddl.update(spark, pspec) }
      intercept[IllegalArgumentException] {
        Writer.write(spark, Seq((9L, "z")).toDF("hash_key", "v"),
          SinkSpec("", table = Some(name), versioned = true))
      }
    } finally spark.sql(s"DROP VIEW IF EXISTS $name")
  }

  test("versioned catalog table: maintenance keeps the view readable; migration + config guards") {
    val root = java.nio.file.Files.createTempDirectory("graft_vtg").toString + "/t"
    val name = "vt_catalog_t2"
    spark.sql(s"DROP VIEW IF EXISTS $name")
    def snk(mode: WriteMode) =
      SinkSpec(root, mode = mode, table = Some(name), versioned = true)
    try {
      // two appends → multi-dir snapshot behind the view (the third
      // column exists so the pruning assertion below can detect an
      // unpruned scan — a 2-column table makes it vacuous)
      Writer.write(spark, Seq((1L, "a", 1.5)).toDF("hash_key", "v", "extra"), snk(Append))
      Writer.write(spark, Seq((2L, "b", 2.5)).toDF("hash_key", "v", "extra"), snk(Append))
      assert(VersionedTable.catalogName(spark, root).contains(name))
      // compact given ONLY the root finds the view via the marker and
      // re-publishes it; vacuum then retires the old dirs — the view
      // must keep reading (a stale glob over deleted dirs would throw)
      VersionedTable.compact(spark, root)
      VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
      assert(spark.table(name).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      // deliberately dropped view: maintenance must neither resurrect
      // it nor wedge on it — the stale marker is removed instead
      spark.sql(s"DROP VIEW $name")
      Writer.write(spark, Seq((3L, "c", 3.5)).toDF("hash_key", "v", "extra"),
        SinkSpec(root, mode = Append, versioned = true)) // path-only write, no re-publish
      VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
      assert(!spark.catalog.tableExists(name))
      assert(VersionedTable.catalogName(spark, root).isEmpty)
      // a catalog write re-links the face
      Writer.write(spark, Seq((4L, "d", 4.5)).toDF("hash_key", "v", "extra"), snk(Append))
      assert(VersionedTable.catalogName(spark, root).contains(name))
      assert(spark.table(name).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      // the view + multi-dir glob must not cost the optimizer anything:
      // a filter on the view still pushes into the parquet scan and the
      // never-selected column is pruned out of the read — the
      // properties that make a 100 TB scan survivable must survive the
      // catalog indirection
      val p = spark.table(name).where(col("hash_key") === 2L).select("v")
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [IsNotNull(hash_key), EqualTo(hash_key,2)"), p)
      val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(read.contains("hash_key") && !read.contains("extra"), read)
      // migration guard: a physical table occupying the name fails
      // create BEFORE any data commits
      val tbl = "vt_catalog_phys"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (id BIGINT) USING parquet")
      val pspec = PipelineSpec("vtg", Nil,
        Seq(Transform(baseCols, Seq("id"), addControlColumns = true)),
        sink = Some(SinkSpec(root, mode = MergeUpsert, table = Some(tbl), versioned = true)))
      intercept[IllegalStateException] { Ddl.create(spark, pspec) }
      spark.sql(s"DROP TABLE $tbl")
      // config guards: version/since_version conflict and missing path
      // fail at construction, not mid-read
      intercept[IllegalArgumentException] {
        VersionedSource("s", root, version = Some(1L), sinceVersion = Some(1L))
      }
      intercept[IllegalArgumentException] { VersionedSource("s", "") }
      intercept[IllegalArgumentException] {
        YamlLoader.load(
          s"""sources:
             |  - name: s
             |    type: versioned
             |""".stripMargin)
      }
      intercept[IllegalArgumentException] {
        VersionedTable.vacuum(spark, root, keep = 1, graceMs = -1L)
      }
    } finally spark.sql(s"DROP VIEW IF EXISTS $name")
  }

  test("versioned maintenance: history lists commits, compact folds deltas, cli actions drive both") {
    val root = java.nio.file.Files.createTempDirectory("graft_vtm").toString + "/t"
    def snk = SinkSpec(root, mode = Append, versioned = true)
    Writer.write(spark, Seq((1L, "a")).toDF("hash_key", "v"), snk)
    Writer.write(spark, Seq((2L, "b")).toDF("hash_key", "v"), snk)
    val h = VersionedTable.history(spark, root)
    assert(h.map(_.version) == Seq(1L, 2L))
    assert(h.last.dataDirs.length == 2) // append referenced both dirs
    assert(h.forall(_.committedAt.getTime > 0))
    // compact folds the two delta dirs into one, as a NEW version
    val cv = VersionedTable.compact(spark, root)
    assert(cv == 3L)
    val afterCompact = VersionedTable.currentSnapshot(spark, root).get
    assert(afterCompact.dataDirs.length == 1)
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // single-dir snapshot: compact is a no-op, same version back
    assert(VersionedTable.compact(spark, root) == 3L)
    // vacuumed versions drop out of history
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(VersionedTable.history(spark, root).map(_.version) == Seq(3L))
    // the CLI actions drive the same paths (arg parsing + output)
    graft.Cli.executeTable(spark, "history", root, Nil)
    Writer.write(spark, Seq((3L, "c")).toDF("hash_key", "v"), snk)
    graft.Cli.executeTable(spark, "compact", root, List("--format", "parquet"))
    assert(VersionedTable.currentSnapshot(spark, root).get.dataDirs.length == 1)
    graft.Cli.executeTable(spark, "vacuum", root, List("--keep", "1", "--grace-hours", "0"))
    assert(VersionedTable.history(spark, root).length == 1)
    assert(VersionedTable.read(spark, root).count() == 3L)
    // row-level delete from the CLI (same commitDelete path as SQL)
    graft.Cli.executeTable(spark, "delete", root, List("--where", "hash_key = 2"))
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("versioned readStream: appends stream exactly once, compaction does not re-deliver") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vts").toString
    val root = dir + "/t"
    def snk = SinkSpec(root, mode = Append, versioned = true)
    Writer.write(spark, Seq((1L, "a")).toDF("hash_key", "v"), snk)
    val q = VersionedTable.readStream(spark, root)
      .writeStream.format("memory").queryName("vt_stream_t").outputMode("append")
      .option("checkpointLocation", dir + "/ck")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("vt_stream_t").count() == 1L)
      Writer.write(spark, Seq((2L, "b")).toDF("hash_key", "v"), snk)
      q.processAllAvailable()
      assert(spark.table("vt_stream_t").count() == 2L)
      // compaction rewrites rows into a data-<version> dir the delta
      // glob excludes — nothing re-delivers; the next append still does
      VersionedTable.compact(spark, root)
      Writer.write(spark, Seq((3L, "c")).toDF("hash_key", "v"), snk)
      q.processAllAvailable()
      assert(spark.table("vt_stream_t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
      // THRESHOLD compaction (commitDelta folding inline) must not yank
      // the triggering delta out from under the stream: the folded
      // delta dirs stay until vacuum's grace sweeps them
      VersionedTable.commitDelta(spark, root, "parquet",
        Seq((4L, "d")).toDF("hash_key", "v"), compactAfter = 1)
      q.processAllAvailable()
      assert(spark.table("vt_stream_t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("vt_stream_t")
    }
  }

  private def sha2Hex(s: String): String = {
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
