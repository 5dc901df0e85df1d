package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-18 measurement harness (guide §1): per-JOB wall breakdown of a
  * declared query — which Spark jobs a query runs, how long each takes,
  * and how much is driver-side gap. Dev-only: `Test/runMain
  * graft.ProfileMain q141_delta_cdf_ids [q...]`; never part of the bench.
  */
object ProfileMain {
  final case class JobRec(id: Int, var name: String = "", var start: Long = 0L,
                          var end: Long = 0L, var tasks: Int = 0, var stages: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(j.jobId); r.start = j.time
        // stage `details` is the submission stack — the first graft
        // frame names the operator that ran the job far better than the
        // RDD callsite (which is usually an AQE CompletableFuture)
        val graftFrame = j.stageInfos.lastOption.flatMap(_.details.split("\n")
          .find(l => l.contains("graft.") && !l.contains("ProfileMain")))
          .map(_.trim.stripPrefix("at "))
        r.name = graftFrame
          .orElse(Option(j.properties.getProperty("spark.job.description")))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        r.stages = j.stageIds.size
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
        jobs(j.jobId) = r
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(j.jobId).foreach(_.end = j.time) }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = jobs.synchronized {
        stageToJob.get(t.stageId).foreach(jid => jobs.get(jid).foreach(_.tasks += 1))
      }
    })
    // session warmup à la Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.range(2L).count(); System.gc()
    }
    args.foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, sfDir).count() // warm run (codegen, page cache)
      cleanup()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = jobs.synchronized { jobs.values.toSeq }
      println(f"== $q total $sec%.3f s, ${snap.size} jobs ==")
      var prevEnd = 0L
      snap.foreach { r =>
        val d = (r.end - r.start) / 1000.0
        val gap = if (prevEnd == 0) 0.0 else (r.start - prevEnd) / 1000.0
        prevEnd = r.end
        println(f"job ${r.id}%4d ${d}%7.3f s  gap ${gap}%7.3f s  stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.name.take(100)}")
      }
      println(f"sum of job times: ${snap.map(r => (r.end - r.start) / 1000.0).sum}%.3f s of $sec%.3f s wall")
      cleanup()
    }
    spark.stop()
  }
}
