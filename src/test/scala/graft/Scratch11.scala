package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scale probe: DV-emitting DELETE driver residency.
  *
  * Round 12's delete collected the matched (file_path, row_index) scan
  * ROW-BY-ROW to the driver — each Row carrying the full path string
  * (~100 B) plus object overhead, so a 10M-row delete shipped ~2 GB of
  * driver heap and the advertised 100M-row cap was unreachable in
  * practice. Round 13 aggregates per file ON THE EXECUTORS
  * (`groupBy(file).agg(sort_array(collect_list(idx)))`) so the driver
  * receives ONE row per touched file whose payload is the packed
  * index array (8 B/row). The claims under test:
  *
  * (1) DRIVER BYTES — SizeEstimator on the two collected shapes for
  *     the same 5M matched rows: the per-file shape must be ~8 B/row
  *     (plus O(files) path strings), the row-level shape 10–30×
  *     larger. This is the evidence the per-file aggregation moves
  *     the real envelope, not just the constant.
  * (2) END-TO-END — a 10M-row table, DELETE matching 5M rows across
  *     every file: commits one version, read-back count exact, wall
  *     time dominated by the scan (not the driver transfer).
  *
  * Timings min-of-1 on a shared VM (shape ratio is deterministic).
  */
object Scratch11 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = 10000000L
    val files = 16
    val root = java.nio.file.Files.createTempDirectory("graft_s11").toString + "/t"

    val df = spark.range(rows).select(col("id"),
      (col("id") % 2).as("par"), concat(lit("payload_"), col("id")).as("v"))
      .repartition(files)
    graft.sources.DeltaWrite.append(spark, df, root)

    // ---- (1) collected-shape comparison on the real scan ----
    val scan = graft.sources.DeltaRead.read(spark, root)
      .where("par = 0")
    // mirror of the delete's matched-row scan: (file, row) pairs
    val pairs = graft.sources.DeltaRead.read(spark, root)
      .select(col("par"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
      .where("par = 0").select("fp", "ri")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    val (rowShape, tRow) = timed(pairs.collect())
    val rowBytes = org.apache.spark.util.SizeEstimator.estimate(rowShape)
    val (fileShape, tFile) = timed(
      pairs.groupBy("fp").agg(sort_array(collect_list("ri")).as("ris")).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toArray))
    val fileBytes = org.apache.spark.util.SizeEstimator.estimate(fileShape)
    val matched = rowShape.length
    println(f"matched rows: $matched%,d across ${fileShape.length} files")
    println(f"row-level collect:  $rowBytes%,d driver bytes (${rowBytes.toDouble / matched}%.1f B/row), $tRow%.2f s")
    println(f"per-file aggregate: $fileBytes%,d driver bytes (${fileBytes.toDouble / matched}%.1f B/row), $tFile%.2f s")
    println(f"shape ratio: ${rowBytes.toDouble / fileBytes}%.1fx")

    // ---- (2) end-to-end delete at the same scale ----
    val (_, tDel) = timed(graft.sources.DeltaWrite.delete(spark, root, "par = 0"))
    val kept = graft.sources.DeltaRead.read(spark, root).count()
    println(f"DELETE of $matched%,d rows committed in $tDel%.2f s; kept $kept%,d rows")
    assert(kept == rows - matched, s"expected ${rows - matched}, got $kept")

    spark.stop()
  }
}
