package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order clustering: the layout must make per-file min/max ranges
  * narrow on EVERY clustered dimension (that is the whole point — the
  * parquet footer stats then prune files for filters on any of them),
  * and the clustered write must lose no rows.
  */
class ZOrderSuite extends SparkSpec {

  /** Mean per-file (max-min) range of `c`, as a fraction of the global
    * range — ~1.0 for a random layout, small for a clustered one.
    */
  private def meanFileRangeFrac(dir: String, c: String, globalRange: Double): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    val fracs = files.map { f =>
      val r = spark.read.parquet(f).agg(
        (max(col(c)) - min(col(c))).cast("double")).head()
      (if (r.isNullAt(0)) 0.0 else r.getDouble(0)) / globalRange
    }
    fracs.sum / fracs.length
  }

  test("z-ordered layout narrows per-file ranges on BOTH dimensions; no rows lost") {
    import spark.implicits._
    // two independent uniform dims — the worst case for single-column
    // sorting (sorting by x leaves y's per-file range at ~100%)
    val n = 20000L
    val df = spark.range(n).select(
      (xxhash64(col("id")) % 10000).as("x"),
      (xxhash64(col("id"), lit(7)) % 10000).as("y"))
      .select(abs(col("x")).as("x"), abs(col("y")).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val zDir = dir + "/z"
    val plainDir = dir + "/plain"
    val files = 16
    graft.pipeline.Writer.writeZOrdered(df, zDir, Seq("x", "y"), files)
    df.repartition(files).write.parquet(plainDir) // round-robin baseline

    assert(spark.read.parquet(zDir).count() == n)
    val zx = meanFileRangeFrac(zDir, "x", 10000.0)
    val zy = meanFileRangeFrac(zDir, "y", 10000.0)
    val px = meanFileRangeFrac(plainDir, "x", 10000.0)
    val py = meanFileRangeFrac(plainDir, "y", 10000.0)
    // random layout: every file spans ~the full range on both dims
    assert(px > 0.9 && py > 0.9, s"baseline not random: $px / $py")
    // z-order: 16 files over a 2-D grid → each file spans ~1/4 of each
    // dimension (sqrt(16)); allow slack for quantile error + boundaries
    assert(zx < 0.55, s"x per-file range frac $zx not clustered")
    assert(zy < 0.55, s"y per-file range frac $zy not clustered")
    // a filter-shaped probe: files whose x-range misses the predicate
    // could be skipped — count how many files even CONTAIN the slice
    val touching = new java.io.File(zDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).count { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("x").cast("double"), max("x").cast("double")).head()
        r.getDouble(0) <= 1000.0 && r.getDouble(1) >= 0.0
      }
    assert(touching <= files / 2, s"$touching of $files files touch x<=1000 — no skipping possible")
  }

  test("z-ordered versioned compaction: clustered rewrite, rows intact, CDC still sound") {
    import spark.implicits._
    import graft.pipeline.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_zvt").toString + "/t"
    val n = 20000L
    val df = spark.range(n).select(
      abs(xxhash64(col("id")) % 10000).as("x"),
      abs(xxhash64(col("id"), lit(7)) % 10000).as("y"))
    VersionedTable.commitDelta(spark, root, "parquet", df.where(col("x") % 2 === 0))
    VersionedTable.commitDelta(spark, root, "parquet", df.where(col("x") % 2 =!= 0))
    val v = VersionedTable.compact(spark, root, zorderBy = Seq("x", "y"), zorderFiles = 16)
    assert(v == 3L)
    assert(VersionedTable.read(spark, root).count() == n)
    val snapDirs = VersionedTable.history(spark, root).last.dataDirs
    assert(snapDirs.length == 1)
    val dir = root + "/" + snapDirs.head
    // OPTIMIZE-with-ZORDER did cluster: per-file ranges narrow on both
    // dimensions (same bound as the direct writeZOrdered test)
    assert(meanFileRangeFrac(dir, "x", 10000.0) < 0.55)
    assert(meanFileRangeFrac(dir, "y", 10000.0) < 0.55)
    // the rewrite is kind=compact: delta maintenance across it sees NO
    // row changes (fast path, empty diff — not a spurious full rewrite)
    val diff = VersionedTable.diffVersions(spark, root, 2L, 3L, Seq("x"), Seq("y"))
    assert(!diff.queryExecution.executedPlan.toString.contains("Join"))
    assert(diff.count() == 0L)
  }

  test("non-numeric dimensions: dates rank by epoch, strings by hash, others fail loudly") {
    import spark.implicits._
    val df = spark.range(2000L).select(
      date_add(lit("2024-01-01").cast("date"), (col("id") % 365).cast("int")).as("d"),
      concat(lit("cat_"), (xxhash64(col("id")) % 50).cast("string")).as("s"),
      encode(col("id").cast("string"), "utf-8").as("b"))
    // date + string dimensions build a z-value with real spread
    val z = df.withColumn("z", ZOrder.zvalue(df, Seq("d", "s")))
    assert(z.select(countDistinct(col("z"))).head().getLong(0) > 50)
    // equal strings land in equal buckets: grouping by s, the z-value's
    // string-dimension bit (dim index 1 of 2 → bit position 1) must be
    // constant per group
    val sBits = z.select(col("s"), (col("z")/2).cast("long").mod(2).as("bit1"))
    // (cheap sanity: no exception and some clustering signal)
    assert(sBits.groupBy("s").agg(countDistinct("bit1").as("nb"))
      .where(col("nb") > 1).count() == 0)
    // unsupported type: loud failure, not a silent constant dimension
    val e = intercept[IllegalArgumentException] { ZOrder.zvalue(df, Seq("b")) }
    assert(e.getMessage.contains("cannot z-order"))
  }

  test("zvalue is a pure projection (no shuffle, no UDF) once cuts are computed") {
    import spark.implicits._
    val df = spark.range(1000L).select(col("id").as("x"), (col("id") * 3 % 997).as("y"))
    val z = df.withColumn("z", ZOrder.zvalue(df, Seq("x", "y")))
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(z.select(countDistinct(col("z"))).head().getLong(0) > 100)
  }
}
