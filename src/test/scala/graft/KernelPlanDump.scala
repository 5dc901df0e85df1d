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
    val outDir = java.nio.file.Paths.get(sys.props("user.dir"), "plans", "r18")
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
    spark.stop()
  }
}
