package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev scratchpad for stage-level timing (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // Warm-up as Bench does (janino + shuffle spin-up out of the timing).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Dedup.minhashLsh(docs.limit(64)).count()
    clear()

    // q32 as shipped: raw candidates -> one-pass ShingleSet -> merge-scan verify.
    for (i <- 1 to 2) {
      clear()
      time(s"q32 chain run$i") {
        val candidates = Dedup.minhashCandidatePairs(docs)
        Dedup.jaccardVerify(docs, candidates, threshold = 0.7)
          .orderBy("id_a", "id_b").count()
      }
    }
    println(s"[scratch] cacheManager empty: ${spark.sharedState.cacheManager.isEmpty}")
    println(s"[scratch] persistent RDDs: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
