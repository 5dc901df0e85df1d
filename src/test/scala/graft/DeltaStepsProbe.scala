package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 measurement harness (guide §1): wall-clock attribution of
  * q141's fixture steps — which DeltaWrite/DeltaRead call the driver
  * gaps live in. Dev-only: `Test/runMain graft.DeltaStepsProbe`; never
  * part of the bench.
  */
object DeltaStepsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    sp.sparkContext.setLogLevel("WARN")
    val jobN = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    sp.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobN.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach(s => jobMs.addAndGet(j.time - s))
      }
    })
    def t[A](name: String)(f: => A): A = {
      val (n0, m0) = (jobN.get(), jobMs.get())
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"STEP $name%-12s $sec%.3f s  jobs=${jobN.get() - n0}%3d " +
        f"jobtime=${(jobMs.get() - m0) / 1000.0}%.3f s"); r
    }
    // warm run: codegen, page cache, parquet footers
    SparkEntry.queries("q141_delta_cdf_ids")(sp, dir).count()
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val root = "/tmp/q141probe_" + System.nanoTime()
      val orders = Tables.load(sp, dir, "orders")
      def slc(r: Int) = orders.where(col("o_orderkey") % 8 === r)
        .select(col("o_orderkey"), col("o_custkey"))
        .repartition(1).sortWithinPartitions("o_orderkey")
      t("append0")(sources.DeltaWrite.append(sp, slc(0), root))
      t("props")(sources.DeltaWrite.setProperties(sp, root, Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableRowTracking" -> "true",
        "delta.rowTracking.materializedRowIdColumnName" -> "_graft_mat_rid")))
      t("append1")(sources.DeltaWrite.append(sp, slc(1), root))
      t("delete")(sources.DeltaWrite.delete(sp, root, "o_orderkey % 7 = 3"))
      t("update")(sources.DeltaWrite.update(sp, root, "o_orderkey % 7 = 5",
        Map("o_custkey" -> "o_custkey + 1000000")))
      val src = sources.DeltaRead.read(sp, root)
        .where(col("o_orderkey") % 7 === 1)
        .select(col("o_orderkey"), (col("o_custkey") * 10).as("o_custkey"))
      t("merge")(sources.DeltaWrite.merge(sp, src, root, Seq("o_orderkey")))
      t("readCh")(sources.DeltaRead.readChangesWithRowIds(sp, root, 2L).count())
      t("readCh2")(sources.DeltaRead.readChangesWithRowIds(sp, root, 2L).count())
    }
    sp.stop()
  }
}
