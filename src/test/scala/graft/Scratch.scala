package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev scratchpad for stage-level timing and scale probes (not part of
  * the library). Current probe: replicate the sf0.1 corpus R× with
  * id-shifted copies (every doc becomes an R-way near-dup family, so
  * TRUE pair volume grows ~R²×) and time the LSH → verify chain — the
  * runtime must track verified-pair OUTPUT volume, not corpus² —
  * plus the exact-dedup and curate paths at the same replication.
  */
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
    def replicated(r: Int) = {
      val n = 1000000L
      (0 until r).map(i => docs.select((col("doc_id") + lit(i * n)).as("doc_id"),
        col("lang"), col("text"))).reduce(_ unionByName _)
    }

    // Warm-up as Bench does (janino + shuffle spin-up out of the timing).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Dedup.minhashLsh(docs.limit(64)).count()
    clear()

    for (r <- Seq(1, 4, 10)) {
      val corpus = replicated(r)
      clear()
      time(s"exact dedup  R=$r (${5000 * r} docs)") { Dedup.exact(corpus).count() }
      clear()
      time(s"lsh+verify   R=$r") {
        val candidates = Dedup.minhashCandidatePairs(corpus)
        Dedup.jaccardVerify(corpus, candidates, threshold = 0.7).count()
      }
      clear()
      time(s"curate       R=$r") {
        operators.Curation.curate(corpus, minTokens = 20).count()
      }
    }
    println(s"[scratch] cacheManager empty: ${spark.sharedState.cacheManager.isEmpty}")
    println(s"[scratch] persistent RDDs: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
