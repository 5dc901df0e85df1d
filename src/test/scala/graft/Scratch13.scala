package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe: where q123 (incremental span scoring, exact mode)
  * spends its 6.4 s at sf0.1 — store init vs delta scoring vs the
  * admit commit. Exact-string gram keys (the oracle surface) carry
  * ~58 B/row through every shuffle; the hashed production path is the
  * same plan with 8 B keys.
  */
object Scratch13 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[s13] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    for (hashed <- Seq(false, true)) {
      val root = java.nio.file.Files.createTempDirectory("s13").toString + "/g"
      val corpus = docs.where(col("doc_id") % 2 === 0)
      val delta = docs.where(col("doc_id") % 2 === 1)
      timed(s"initGramStore hashed=$hashed") {
        graft.operators.IncrementalDedup.initGramStore(spark, corpus, root,
          params = graft.operators.IncrementalDedup.GramParams(50, hashed))
      }
      val r = timed(s"spanDelta(score only) hashed=$hashed") {
        graft.operators.IncrementalDedup.spanDelta(spark, delta, root, append = false)
      }
      timed(s"spanDelta(with admit) hashed=$hashed") {
        graft.operators.IncrementalDedup.spanDelta(spark, delta, root)
      }
      println(s"[s13] scored rows: ${r.scores.count()}")
    }
    spark.stop()
  }
}
