package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{MaterializedAgg, VersionedTable}
import graft.pipeline.MaterializedAgg.MAgg

/** Round-8 scale probe (dev scratchpad, like Scratch2-4): materialized-
  * view maintenance cost model. The claim worth money at 100 TB is that
  * a refresh costs O(delta + |rollup|) — independent of how much fact
  * history has accumulated — while the recompute a non-incremental gold
  * step pays (drune's spark_engine.py:232-255 shape) grows linearly
  * with the table. So as appends stack, refresh wall time should stay
  * FLAT while recompute time climbs; the gap at append #k is the probe
  * output.
  *
  * Probe: seed a versioned fact with N rows, then 16 append+refresh
  * cycles of N/16 rows each. Per cycle: refresh wall (delta fold) vs a
  * full groupBy().agg over the current snapshot (what every run would
  * pay without maintenance). Group cardinality fixed (1000 keys) so
  * |rollup| stays bounded — the realistic matview regime.
  */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val totalRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cycles = 16
    val perCycle = totalRows / cycles
    val base = java.nio.file.Files.createTempDirectory("graft_s5").toString
    val src = base + "/fact"; val agg = base + "/rollup"
    val groups = Seq("g")
    val aggs = Seq(MAgg("n", "", "count"), MAgg("s", "v", "sum"),
      MAgg("lo", "v", "min"), MAgg("hi", "v", "max"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def batch(from: Long, n: Long) = spark.range(from, from + n).select(
      concat(lit("k"), (col("id") % 1000).cast("string")).as("g"),
      (col("id") % 9973).as("v"))

    println(s"[scratch5] total=$totalRows cycles=$cycles perCycle=$perCycle")
    var next = 0L
    for (c <- 1 to cycles) {
      val (_, tAppend) = time {
        VersionedTable.commitDelta(spark, src, "parquet", batch(next, perCycle),
          compactAfter = 64)
      }
      next += perCycle
      val (_, tRefresh) = time { MaterializedAgg.refresh(spark, src, agg, groups, aggs) }
      val (_, tRecompute) = time {
        VersionedTable.read(spark, src)
          .groupBy("g").agg(count(lit(1)), sum("v"), min("v"), max("v"))
          .write.mode("overwrite").parquet(base + s"/flat")
      }
      println(f"[scratch5] cycle=$c%2d rows=${next}%9d append=$tAppend%5.2f s " +
        f"refresh=$tRefresh%5.2f s recompute=$tRecompute%5.2f s " +
        f"gap=${tRecompute / tRefresh}%4.1fx")
    }
    // sanity: the maintained rollup equals the flat aggregate
    val flat = VersionedTable.read(spark, src)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi"))
    val diff = MaterializedAgg.read(spark, agg).except(flat).count() +
      flat.except(MaterializedAgg.read(spark, agg)).count()
    println(s"[scratch5] rollup==flat: ${diff == 0} (diff rows: $diff)")
    spark.stop()
  }
}
