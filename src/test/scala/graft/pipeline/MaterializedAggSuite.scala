package graft.pipeline

import graft.SparkSpec
import graft.pipeline.MaterializedAgg.MAgg
import org.apache.spark.sql.functions._

/** MaterializedAgg — incrementally-maintained rollups: delta folding
  * equals full recompute, refreshes are idempotent and watermarked
  * atomically, and unsound (rewritten) source history is refused.
  */
class MaterializedAggSuite extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  private val groups = Seq("g")
  private val aggs = Seq(MAgg("n", "", "count"), MAgg("s", "v", "sum"),
    MAgg("lo", "v", "min"), MAgg("hi", "v", "max"))

  private def write(rows: Seq[(String, Long)], root: String, mode: WriteMode) =
    Writer.write(spark, rows.toDF("g", "v"),
      SinkSpec(root, mode = mode, versioned = true))

  private def rollupMap(aggRoot: String): Map[String, (Long, Long, Long, Long)] =
    MaterializedAgg.read(spark, aggRoot).collect().map(r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n"), r.getAs[Long]("s"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap

  test("incremental refreshes equal the flat aggregate; new groups appear, old merge") {
    val src = tmpRoot("graft_magg_src"); val agg = tmpRoot("graft_magg_agg")
    write(Seq(("a", 1L), ("a", 5L), ("b", 2L)), src, Append)
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 1L)
    write(Seq(("a", 10L), ("c", 7L)), src, Append)
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 2L)
    assert(rollupMap(agg) == Map(
      "a" -> ((3L, 16L, 1L, 10L)), "b" -> ((1L, 2L, 2L, 2L)), "c" -> ((1L, 7L, 7L, 7L))))
    // the rollup is itself a versioned table: refresh #1's state is
    // still time-travelable
    assert(VersionedTable.readVersion(spark, agg, 1L).count() == 2L)
  }

  test("caught-up and repeated refreshes are no-ops (watermark travels with the commit)") {
    val src = tmpRoot("graft_magg_src2"); val agg = tmpRoot("graft_magg_agg2")
    write(Seq(("a", 1L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    val before = rollupMap(agg)
    val vBefore = VersionedTable.history(spark, agg).last.version
    // two more refreshes with no new source commits: same watermark,
    // no new rollup version, identical contents
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 1L)
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 1L)
    assert(VersionedTable.history(spark, agg).last.version == vBefore)
    assert(rollupMap(agg) == before)
    assert(MaterializedAgg.watermark(spark, agg).contains(1L))
  }

  test("a rewrite in the unprocessed span is refused (double-count guard)") {
    val src = tmpRoot("graft_magg_src3"); val agg = tmpRoot("graft_magg_agg3")
    write(Seq(("a", 1L), ("b", 2L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    // an overwrite rewrites the table's directories: folding its
    // "delta" (= everything) onto the stored rollup would double count
    write(Seq(("a", 99L), ("b", 2L)), src, Overwrite)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    }
    assert(e.getMessage.contains("rewrite"))
  }

  test("refresh survives commitDelta's bounded auto-compaction (fold marker)") {
    val src = tmpRoot("graft_magg_src5"); val agg = tmpRoot("graft_magg_agg5")
    def append(rows: Seq[(String, Long)]) =
      VersionedTable.commitDelta(spark, src, "parquet", rows.toDF("g", "v"),
        compactAfter = 2)
    append(Seq(("a", 1L)))
    MaterializedAgg.refresh(spark, src, agg, groups, aggs) // watermark v1
    append(Seq(("a", 2L))) // v2: second dir, still under the bound
    append(Seq(("b", 3L))) // v3: exceeds compactAfter=2 → FOLD commit
    // span v1→v3 crosses the fold; the marker recovers v3's delta dir
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 3L)
    assert(rollupMap(agg) == Map(
      "a" -> ((2L, 3L, 1L, 2L)), "b" -> ((1L, 3L, 3L, 3L))))
  }

  test("maintenance compaction in the span contributes no rows and stays sound") {
    val src = tmpRoot("graft_magg_src6"); val agg = tmpRoot("graft_magg_agg6")
    write(Seq(("a", 1L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs) // watermark v1
    write(Seq(("a", 4L)), src, Append)            // v2 append
    VersionedTable.compact(spark, src)            // v3 compact (repackage)
    write(Seq(("b", 5L)), src, Append)            // v4 append
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 4L)
    assert(rollupMap(agg) == Map(
      "a" -> ((2L, 5L, 1L, 4L)), "b" -> ((1L, 5L, 5L, 5L))))
  }

  test("concurrent refreshes serialize: the delta never folds twice") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val src = tmpRoot("graft_magg_src7"); val agg = tmpRoot("graft_magg_agg7")
    write(Seq(("a", 1L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    write(Seq(("a", 10L)), src, Append)
    // both see watermark v1 and race to fold the same delta; the CAS
    // expectation makes exactly one fold land
    val fs = Seq.fill(2)(Future(MaterializedAgg.refresh(spark, src, agg, groups, aggs)))
    fs.foreach(f => Await.result(f, 120.seconds))
    assert(rollupMap(agg) == Map("a" -> ((2L, 11L, 1L, 10L))))
  }

  test("definition persists with first refresh; refresh-by-root folds; mismatched shape refused") {
    val src = tmpRoot("graft_magg_src8"); val agg = tmpRoot("graft_magg_agg8")
    write(Seq(("a", 1L), ("b", 2L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    // the sidecar round-trips the full shape
    val d = MaterializedAgg.viewDef(spark, agg).get
    assert(d.srcRoot == src && d.groupBy == groups && d.aggs == aggs)
    // maintenance by root alone: no shape restated anywhere
    write(Seq(("a", 10L)), src, Append)
    assert(MaterializedAgg.refresh(spark, agg) == 2L)
    assert(rollupMap(agg) == Map(
      "a" -> ((2L, 11L, 1L, 10L)), "b" -> ((1L, 2L, 2L, 2L))))
    // a refresh restating a DIFFERENT shape must refuse before folding
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, agg, groups,
        Seq(MAgg("n", "", "count")))
    }
    assert(e.getMessage.contains("defined as"))
    // refresh-by-root on an undefined rollup points at the full call
    val e2 = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, tmpRoot("graft_magg_nodef"))
    }
    assert(e2.getMessage.contains("no materialized-view definition"))
    // the CLI maintenance action drives the same path
    write(Seq(("b", 7L)), src, Append)
    graft.Cli.executeTable(spark, "refresh", agg, Nil)
    assert(rollupMap(agg)("b") == ((2L, 9L, 2L, 7L)))
  }

  test("avg folds as sum+count partials; nulls excluded; non-decomposable kinds refused") {
    val src = tmpRoot("graft_magg_avg"); val agg = tmpRoot("graft_magg_avg_agg")
    val avgAggs = Seq(MAgg("n", "", "count"), MAgg("m", "v", "avg"))
    def writeRows(rows: Seq[(String, java.lang.Long)]): Unit =
      Writer.write(spark, rows.toDF("g", "v"),
        SinkSpec(src, mode = Append, versioned = true))
    writeRows(Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", null)))
    MaterializedAgg.refresh(spark, src, agg, groups, avgAggs)
    writeRows(Seq(("a", 12L), ("c", 7L), ("a", null)))
    MaterializedAgg.refresh(spark, src, agg, groups, avgAggs)
    val got = MaterializedAgg.read(spark, agg).collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("m")))).toMap
    // avg over non-null v only (SQL AVG), count over all rows —
    // exactly the flat aggregate over both commits
    assert(got == Map(
      "a" -> ((4L, 6.0)),   // (1+5+12)/3
      "b" -> ((2L, 2.0)),   // null excluded
      "c" -> ((1L, 7.0))))
    // hidden partials never leak through read()
    assert(!MaterializedAgg.read(spark, agg).columns.exists(_.startsWith("__")))
    // a genuinely non-decomposable kind is refused at construction
    val e = intercept[IllegalArgumentException] { MAgg("p50", "v", "median") }
    assert(e.getMessage.contains("no mergeable partials"))
  }

  test("rebuild recovers from a rewrite span; incremental maintenance resumes after it") {
    val src = tmpRoot("graft_magg_rb"); val agg = tmpRoot("graft_magg_rb_agg")
    write(Seq(("a", 1L), ("b", 2L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    // a rewrite (overwrite) makes delta maintenance unsound: refresh refuses
    write(Seq(("a", 10L), ("c", 3L)), src, Overwrite)
    val e = intercept[IllegalArgumentException] { MaterializedAgg.refresh(spark, agg) }
    assert(e.getMessage.contains("rebuild"))
    // the prescribed remedy, one call — via the SQL FULL form
    val rebuilt = spark.sql(s"GRAFT_REFRESH('$agg', FULL)").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("s")).toMap
    assert(rebuilt == Map("a" -> 10L, "c" -> 3L))
    // rollup history preserved: the pre-rebuild state is still readable
    assert(VersionedTable.readVersion(spark, agg, 1L).count() == 2L)
    // incremental refresh resumes from the rebuilt watermark
    write(Seq(("c", 4L)), src, Append)
    MaterializedAgg.refresh(spark, agg)
    assert(rollupMap(agg) == Map(
      "a" -> ((1L, 10L, 10L, 10L)), "c" -> ((2L, 7L, 3L, 4L))))
  }

  test("ndv folds as HLL sketch unions; incremental estimate equals the batch sketch") {
    val src = tmpRoot("graft_magg_ndv"); val agg = tmpRoot("graft_magg_ndv_agg")
    val ndvAggs = Seq(MAgg("n", "", "count"), MAgg("ndv_v", "v", "ndv"))
    def writeRows(rows: Seq[(String, java.lang.Long)]): Unit =
      Writer.write(spark, rows.toDF("g", "v"),
        SinkSpec(src, mode = Append, versioned = true))
    // commit 1: a has {1,5,5}, b has {2, null}
    writeRows(Seq(("a", 1L), ("a", 5L), ("a", 5L), ("b", 2L), ("b", null)))
    MaterializedAgg.refresh(spark, src, agg, groups, ndvAggs)
    // commit 2: a repeats 5 and adds 12; c appears; d is all-null
    writeRows(Seq(("a", 5L), ("a", 12L), ("c", 7L), ("d", null)))
    MaterializedAgg.refresh(spark, src, agg, groups, ndvAggs)
    val got = MaterializedAgg.read(spark, agg).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("ndv_v")).toMap
    // at tiny cardinality the HLL estimate is exact — and the repeat
    // of 5 ACROSS commits must not double-count (the whole point of a
    // sketch fold vs a count fold)
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L, "d" -> 0L), s"got $got")
    // the incremental union must equal the batch sketch estimate over
    // the full source (fold associativity at the estimate level)
    val batch = VersionedTable.read(spark, src)
      .groupBy("g").agg(expr("hll_sketch_estimate(hll_sketch_agg(v))").as("e"))
      .collect().map(r => r.getAs[String]("g") -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    assert(got == batch.map { case (k, v) => k -> v })
    // hidden sketch partials never leak through read()
    assert(!MaterializedAgg.read(spark, agg).columns.exists(_.startsWith("__")))
  }

  test("the definition claim lands BEFORE the first fold: an aborted first refresh still owns the shape") {
    val src = tmpRoot("graft_magg_claim"); val agg = tmpRoot("graft_magg_claim_agg")
    // first refresh aborts mid-flight (source has no committed version)
    // — but the definition claim must already be durable, so a racing
    // first refresh with a DIFFERENT shape is refused before it can
    // commit a rollup version under the wrong shape
    intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    }
    assert(MaterializedAgg.viewDef(spark, agg).exists(_.groupBy == groups),
      "definition must persist before the first fold, not after it")
    val other = Seq(MAgg("n2", "", "count"))
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, agg, Seq("g"), other)
    }
    assert(e.getMessage.contains("defined as"))
    assert(VersionedTable.currentSnapshot(spark, agg).isEmpty,
      "the losing shape must never commit a rollup version")
    // the claimed shape proceeds normally once the source exists
    write(Seq(("a", 1L), ("b", 2L)), src, Append)
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 1L)
    assert(rollupMap(agg) ==
      Map("a" -> ((1L, 1L, 1L, 1L)), "b" -> ((1L, 2L, 2L, 2L))))
  }

  test("refresh #2 reads ONLY the delta dirs: v1's data can vanish and the fold still lands") {
    val src = tmpRoot("graft_magg_src9"); val agg = tmpRoot("graft_magg_agg9")
    write(Seq(("a", 1L), ("b", 2L)), src, Append)
    MaterializedAgg.refresh(spark, src, agg, groups, aggs)
    write(Seq(("a", 10L), ("c", 7L)), src, Append)
    // I/O proof of O(delta): physically remove the FIRST commit's data
    // dir — a refresh that rescanned history would fail here, the
    // manifest-driven fold must not even notice
    val v1Dir = VersionedTable.history(spark, src).head.dataDirs.head
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(src, v1Dir))
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 2L)
    assert(rollupMap(agg) == Map(
      "a" -> ((2L, 11L, 1L, 10L)), "b" -> ((1L, 2L, 2L, 2L)), "c" -> ((1L, 7L, 7L, 7L))))
  }

  test("first refresh with appends already stacked aggregates the full snapshot once") {
    val src = tmpRoot("graft_magg_src4"); val agg = tmpRoot("graft_magg_agg4")
    write(Seq(("a", 1L)), src, Append)
    write(Seq(("a", 2L)), src, Append)
    assert(MaterializedAgg.refresh(spark, src, agg, groups, aggs) == 2L)
    assert(rollupMap(agg) == Map("a" -> ((2L, 3L, 1L, 2L))))
  }

  test("matviews and branches: branch-source rollup folds; publish = rewrite -> rebuild; branch aggRoot refused") {
    val src = tmpRoot("graft_magg_brsrc")
    val aggMain = tmpRoot("graft_magg_brmain")
    val aggExp = tmpRoot("graft_magg_brexp")
    write(Seq(("a", 1L), ("b", 2L)), src, Append)
    MaterializedAgg.refresh(spark, src, aggMain, groups, aggs)
    // a matview maintained OVER A BRANCH: srcRoot is root#branch=exp,
    // the rollup lives at its own plain root
    VersionedTable.createBranch(spark, src, "exp")
    val bSrc = VersionedTable.branchRoot(src, "exp")
    Writer.write(spark, Seq(("a", 10L), ("c", 7L)).toDF("g", "v"),
      SinkSpec(bSrc, mode = Append, versioned = true))
    MaterializedAgg.refresh(spark, bSrc, aggExp, groups, aggs)
    assert(rollupMap(aggExp) == Map(
      "a" -> ((2L, 11L, 1L, 10L)), "b" -> ((1L, 2L, 2L, 2L)), "c" -> ((1L, 7L, 7L, 7L))))
    // main's rollup is untouched by the branch's commits
    MaterializedAgg.refresh(spark, aggMain)
    assert(rollupMap(aggMain) == Map("a" -> ((1L, 1L, 1L, 1L)), "b" -> ((1L, 2L, 2L, 2L))))
    // publish: main's head becomes a REWRITE span — incremental
    // maintenance on main's rollup must refuse (double-count guard)...
    VersionedTable.publishBranch(spark, src, "exp")
    val e = intercept[IllegalArgumentException] { MaterializedAgg.refresh(spark, aggMain) }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // ...and rebuild recovers to the published state, after which the
    // main rollup equals the branch rollup (same snapshot now)
    MaterializedAgg.rebuild(spark, aggMain)
    assert(rollupMap(aggMain) == rollupMap(aggExp))
    // a branch-addressed ROLLUP root is refused loudly
    val bad = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, aggMain + "#branch=x", groups, aggs)
    }
    assert(bad.getMessage.contains("cannot be a branch path"), bad.getMessage)
  }
}
