package graft

import org.apache.spark.sql.SparkSession

/** Round-14 probe: multi-part checkpoint writes at a realistic file
  * count. A 100 TB table easily carries 10⁵–10⁶ add actions; a
  * single-part checkpoint funnels all of them through ONE write task
  * (`repartition(1)`) — the bottleneck the multi-part path removes.
  *
  * Fixture: a synthetic `_delta_log` whose v0 commit holds N add
  * actions (no data files needed — the fold touches only the log), in
  * the same hand-crafted-log style DeltaReadSuite pins the reader
  * with. Measured:
  *
  *   1. forced single-part fold (parts = 1),
  *   2. auto fold (parts = 0 → ceil(N / CkPartActions) parts),
  *   3. an INCREMENTAL fold on top of the multi-part checkpoint
  *      (the carried set now reads k part files in parallel).
  *
  * The claim under test: auto wall ≤ single wall at large N (the
  * write parallelizes; nothing else changes), and the incremental
  * fold stays O(tail + carried-set pass) regardless of part count.
  * Timings min-of-1 on a shared VM — read the SHAPE, not the values.
  */
object Scratch14 {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("S14_ADDS", "300000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[s14] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }

    val root = java.nio.file.Files.createTempDirectory("s14").toString + "/t"
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(logDir, "0" * 20 + ".json"))
    w.println("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
    w.println("""{"metaData":{"id":"s14","format":{"provider":"parquet","options":{}},""" +
      """"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",""" +
      """\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}",""" +
      """"partitionColumns":[],"configuration":{},"createdTime":1723000000000}}""")
    for (i <- 0 until n)
      w.println(s"""{"add":{"path":"part-$i%06d.parquet","partitionValues":{},""" +
        s""""size":1048576,"modificationTime":1723000000000,"dataChange":true}}""")
    w.close()
    println(s"[s14] fixture: $n add actions in one commit")

    def cleanCkpt(): Unit = logDir.listFiles()
      .filter(f => f.getName.contains("checkpoint") || f.getName == "_last_checkpoint")
      .foreach(_.delete())

    timed(s"single-part fold ($n adds)") {
      graft.sources.DeltaWrite.checkpoint(spark, root, parts = 1)
    }
    cleanCkpt()
    timed(s"auto fold (ceil($n/${graft.sources.DeltaWrite.CkPartActions}) parts)") {
      graft.sources.DeltaWrite.checkpoint(spark, root)
    }
    val parts = logDir.list().count(_.matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
    println(s"[s14] auto wrote $parts part files")

    // one-add tail on top of the multi-part checkpoint
    val w1 = new java.io.PrintWriter(new java.io.File(logDir, "0" * 19 + "1.json"))
    w1.println("""{"add":{"path":"tail.parquet","partitionValues":{},""" +
      """"size":1,"modificationTime":1723000000001,"dataChange":true}}""")
    w1.close()
    timed("incremental fold on the multi-part base (1-add tail)") {
      graft.sources.DeltaWrite.checkpoint(spark, root)
    }
    val snap = timed("snapshot from the folded log") {
      graft.sources.DeltaRead.snapshot(spark, root)
    }
    println(s"[s14] live files: ${snap.files.size} (expect ${n + 1})")
    spark.stop()
  }
}
