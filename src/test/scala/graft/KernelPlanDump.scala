package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump the OPERATOR-STAGE plans the checkpoint-fronted queries hide:
  * the final frame of q30/q50/… is a scan of the operator's
  * materialized result, so the spread/kernel evidence lives in the
  * operator's own plan. Dev-only:
  * `Test/runMain graft.KernelPlanDump <suffix>`.
  */
object KernelPlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    // r18 dumps stay in plans/r18; this round's land in plans/r19
    val round = sys.env.getOrElse("SPARK_GRAFT_PLAN_ROUND", "r19")
    val outDir = java.nio.file.Paths.get(sys.props("user.dir"), "plans", round)
    java.nio.file.Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        p.getBytes("UTF-8"))
      println(s"wrote ${name}_$suffix.txt")
    }
    dump("kernel_minhash_signatures", graft.operators.Dedup.minhashSignatures(docs))
    dump("kernel_simhash", graft.operators.Dedup.simhash(docs))
    dump("kernel_curate", graft.operators.Curation.curate(docs, minTokens = 20))
    dump("kernel_window_grams", graft.operators.Dedup.duplicatedSpans(docs, n = 50))
    // r19: the MEDIUM-tier sites (uncompressed-byte floor) — dormant at
    // sf0.1, round-robin exchange at sf1 (VERDICT item 7's pin)
    dump("kernel_tfidf", graft.operators.TextAnalysis.tfidfTopTerms(docs))
    dump("kernel_entropy", graft.operators.TextAnalysis.charEntropy(docs))
    val vecs = Tables.load(spark, sfDir, "embeddings")
    dump("kernel_pq_encode", graft.operators.ProductQuantizer.encodeCorpus(
      vecs, Seq(0 -> Array.fill(8)(0f), 1 -> Array.fill(8)(1f)),
      graft.operators.ProductQuantizer.PqCodebook(8, 2, 2,
        Vector.tabulate(2)(_ => Vector.tabulate(2)(c =>
          Array.fill(4)(c.toFloat))))))
    spark.stop()
  }
}
