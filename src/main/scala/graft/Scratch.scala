package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev scratchpad for stage-level timing (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    println("[scratch] minhashLsh rows: " + time("minhashLsh")(Dedup.minhashLsh(docs).count()))
    println("[scratch] simhashPairs rows: " + time("simhashPairs")(
      Dedup.simhashPairs(docs, maxHamming = 8).count()))
    val cands = Dedup.minhashLsh(docs, threshold = 0.5)
    println("[scratch] jaccardVerify rows: " + time("jaccardVerify")(
      Dedup.jaccardVerify(docs, cands, threshold = 0.7).count()))
    spark.stop()
  }
}
