package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VersionedTable

/** Round-9 scale probe: the DSv2 face at 10M rows.
  *
  * (1) READ — manifest-stat data skipping: a 10M-row table committed
  *     as 64 range-clustered files, scanned through
  *     `spark.read.format("graft")` with (a) no filter, (b) a point
  *     lookup, (c) a 1%-range filter. The claim: the selective reads
  *     plan O(matching files) via the `_graft_stats` sidecars (file
  *     counts printed from the planned scan) and their wall time
  *     tracks the file count, not the table size.
  *
  * (2) WRITE — file-pruned MERGE vs the round-8 O(table) rewrite: a
  *     narrow upsert (keys confined to one file's range) through
  *     commitMerge against the same 64-file table, timed against a
  *     full-rewrite merge of the same source (commit with the merge
  *     result). The claim: touched-file count ≈ 1 and wall time is a
  *     small fraction of the rewrite.
  *
  * Timings are min-of-2 on a shared VM; counts are exact.
  */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val files = 64
    val dir = java.nio.file.Files.createTempDirectory("graft_scratch7").toString
    val root = dir + "/t"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def minOf2(f: => Unit): Double = {
      val (_, a) = timed(f); val (_, b) = timed(f); math.min(a, b)
    }

    // ---- build: one commit, 64 range-clustered files on `k`
    val (_, buildS) = timed {
      VersionedTable.commit(spark, root, "parquet",
        _ => spark.range(n).select(col("id").as("k"),
            (col("id") % 1000).as("bucket"),
            concat(lit("payload-"), col("id")).as("v"))
          .repartitionByRange(files, col("k")).sortWithinPartitions("k"))
    }
    println(f"BUILD: $n rows as $files range-clustered files in $buildS%.2f s")

    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
            .fileIndex.inputFiles.length
      }.head

    // ---- read probes through the DSv2 face. The measured action SUMS
    // the payload column's length, so every surviving file pays a real
    // column read (a bare count() answers from footers and would make
    // the full scan look free).
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(length(col("v")))).head().getLong(0)

    val full = spark.read.format("graft").load(root)
    val fullS = minOf2 { assert(force(full) > 0) }
    println(f"READ full scan: files=${plannedFiles(full)} wall=$fullS%.3f s")

    val point = spark.read.format("graft").load(root).where(col("k") === (n / 2))
    val pointS = minOf2 { assert(force(point) > 0) }
    println(f"READ point lookup: files=${plannedFiles(point)} wall=$pointS%.3f s")

    val lo = n / 2; val hi = n / 2 + n / 100
    val range = spark.read.format("graft").load(root)
      .where(col("k") >= lo && col("k") < hi)
    val rangeS = minOf2 { assert(force(range) > 0) }
    println(f"READ 1%% range: files=${plannedFiles(range)} wall=$rangeS%.3f s")

    // ---- merge probes: narrow upsert (one file's key range) ----
    val src = spark.range(lo, lo + 1000).select(col("id").as("k"),
      lit(-1L).as("bucket"), lit("UPDATED").as("v"))
    val (v2, prunedS) = timed {
      VersionedTable.commitMerge(spark, root, "parquet", src, Seq("k"))
    }
    val entries = VersionedTable.currentSnapshot(spark, root).get.dataDirs
    val carried = entries.count(_.contains("/"))
    println(f"MERGE file-pruned: wall=$prunedS%.2f s, carried-by-reference=$carried of $files files")
    assert(spark.read.format("graft").load(root).where(col("v") === "UPDATED").count() == 1000L)
    assert(spark.read.format("graft").load(root).count() == n)

    // same logical upsert as a FULL rewrite commit (the round-8 shape)
    val (_, rewriteS) = timed {
      VersionedTable.commit(spark, root, "parquet", base => {
        val b = base.get
        src.unionByName(b.join(src.select(col("k")), Seq("k"), "left_anti"))
      })
    }
    println(f"MERGE full-rewrite (r8 shape): wall=$rewriteS%.2f s -> pruned is ${rewriteS / prunedS}%.1fx faster")

    // read-back correctness after both commit styles
    assert(spark.read.format("graft").load(root).count() == n)
    spark.stop()
  }
}
