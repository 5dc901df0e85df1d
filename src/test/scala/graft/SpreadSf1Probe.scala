package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19: does the MEDIUM spread tier under-fire on compressible
  * text? The floor is COMPRESSED file bytes; kernel cost tracks
  * uncompressed rows. A/B: medium-site kernels at sf1 as-is (floor
  * says identity) vs force-spread. Dev-only.
  */
object SpreadSf1Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    sp.sparkContext.setLogLevel("WARN")
    sp.range(1000000L).selectExpr("sum(id)").collect()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STEP $name%-24s $sec%.3f s"); sec
    }
    val docs = Tables.load(sp, dir, "documents")
    val docsSpread = docs.repartition(sp.sparkContext.defaultParallelism)
    // warm the column
    docs.select(max(length(col("text")))).collect()
    (1 to 2).foreach { r =>
      println(s"== round $r ==")
      t("tfidf as-is")(noop(operators.TextAnalysis.tfidfTopTerms(docs)))
      t("tfidf forced-spread")(noop(operators.TextAnalysis.tfidfTopTerms(docsSpread)))
      t("exactBest as-is")(noop(operators.Dedup.exactBest(docs,
        score = length(col("text")).cast("double"))))
      t("exactBest forced")(noop(operators.Dedup.exactBest(docsSpread,
        score = length(col("text")).cast("double"))))
      t("entropy as-is")(noop(operators.TextAnalysis.charEntropy(docs)))
      t("entropy forced")(noop(operators.TextAnalysis.charEntropy(docsSpread)))
    }
    sp.stop()
  }
}
