package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19: wall attribution of q97's phases (initStore vs the exact
  * delta dedup) and q95's (curate vs verify vs groups). Dev-only.
  */
object DedupStepsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    sp.sparkContext.setLogLevel("WARN")
    val jobN = new java.util.concurrent.atomic.AtomicInteger(0)
    sp.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobN.incrementAndGet(); ()
      }
    })
    def t[A](name: String)(f: => A): A = {
      val n0 = jobN.get()
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"STEP $name%-12s $sec%.3f s  jobs=${jobN.get() - n0}%3d"); r
    }
    // warm
    SparkEntry.queries("q97_incremental_neardup_exact")(sp, dir).count()
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val docs = Tables.load(sp, dir, "documents").where(col("doc_id") < 512)
      val root = "/tmp/q97probe_" + System.nanoTime()
      t("initStore")(operators.IncrementalDedup.initStore(
        sp, docs.where(pmod(col("doc_id"), lit(10)) =!= 0), root))
      val dd = t("dedupeExact")(operators.IncrementalDedup.dedupeDeltaExact(
        sp, docs.where(pmod(col("doc_id"), lit(10)) === 0), root, docs))
      t("count")(dd.pairs.select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b").count())
    }
    sp.stop()
  }
}
