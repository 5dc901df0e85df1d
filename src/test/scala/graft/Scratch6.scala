package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{MaterializedAgg, VersionedTable}
import graft.pipeline.MaterializedAgg.MAgg

/** Round-8 scale probe: the STREAMING matview steady state. Scratch5
  * pinned the batch cost model (refresh flat while history grows);
  * this drives the same machinery through rollupSink — every
  * micro-batch is a real tagged append commit + an incremental refresh
  * — at a sustained row rate, and asks whether per-batch wall time
  * stays flat as the source table accumulates batches (including
  * across commitDelta's bounded auto-compaction folds, which MUST keep
  * the maintenance sound mid-stream).
  *
  * Output: per-batch durations from the engine's own progress metrics
  * (first ≈ JVM/codegen warmup; the steady-state claim is about the
  * tail), then rollup == flat-aggregate equality.
  */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rowsPerBatch = args.headOption.map(_.toLong).getOrElse(100000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val base = java.nio.file.Files.createTempDirectory("graft_s6").toString
    val src = base + "/fact"; val agg = base + "/rollup"
    val aggs = Seq(MAgg("n", "", "count"), MAgg("s", "v", "sum"),
      MAgg("lo", "v", "min"), MAgg("hi", "v", "max"))

    val stream = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", "8")
      .load()
      .select(concat(lit("k"), (col("value") % 1000).cast("string")).as("g"),
        (col("value") % 9973).as("v"))
    val q = graft.streaming.EventStreams.rollupSink(
      stream, src, agg, base + "/ckpt", Seq("g"), aggs)
    try {
      while (q.recentProgress.length < batches ||
             q.recentProgress.last.batchId < batches) {
        Thread.sleep(500)
      }
    } finally q.stop()
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    println(s"[scratch6] rowsPerBatch=$rowsPerBatch batches=${prog.length}")
    prog.foreach(p => println(
      f"[scratch6] batch=${p.batchId}%3d rows=${p.numInputRows}%7d " +
        f"wall=${p.batchDuration / 1000.0}%6.2f s"))
    val walls = prog.map(_.batchDuration / 1000.0).toSeq
    val head5 = walls.take(5); val tail5 = walls.takeRight(5)
    println(f"[scratch6] first5 mean=${head5.sum / head5.size}%5.2f s " +
      f"last5 mean=${tail5.sum / tail5.size}%5.2f s (flat = steady state holds)")
    // stop() can land between a batch's append commit and its refresh —
    // the documented crash window. Recovery = one catch-up fold via the
    // persisted definition (what the resumed stream's next batch, or
    // any scheduler, would do); after it the rollup must equal flat.
    MaterializedAgg.refresh(spark, agg)
    val flat = VersionedTable.read(spark, src)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi"))
    val r = MaterializedAgg.read(spark, agg)
    val diff = r.except(flat).count() + flat.except(r).count()
    println(s"[scratch6] rollup==flat after catch-up fold: ${diff == 0} " +
      s"(diff rows: $diff); versions=${VersionedTable.history(spark, src).length}")
    spark.stop()
  }
}
