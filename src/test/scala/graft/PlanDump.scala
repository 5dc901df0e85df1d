package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries into plans/<tag>/ —
  * the optimization rounds' before/after plan artifacts. Dev-only:
  * `Test/runMain graft.PlanDump before q50_curate_neardup ...` writes
  * plans/r18/q50_curate_neardup_before.txt (fixture-building queries run
  * their DML while the function constructs the final frame; the dump is
  * the plan of the frame the bench times with count()).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query>...")
    val suffix = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get(sys.props("user.dir"), "plans",
      sys.env.getOrElse("SPARK_GRAFT_PLAN_ROUND", "r19"))
    java.nio.file.Files.createDirectories(outDir)
    args.tail.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote ${q}_$suffix.txt (${plan.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
