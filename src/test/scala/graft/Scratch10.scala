package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scale probe: DELETION-VECTOR reads on a wide Delta table.
  *
  * A 2M-row, 200-file Delta table where a small fraction of files
  * carry deletion vectors — the realistic post-DML shape (most files
  * untouched, a few soft-deleted). The claims under test:
  *
  * (1) CLEAN-BRANCH ISOLATION — the DV split must not tax the files
  *     without DVs: reading the 10%-dirty table should cost close to
  *     the all-clean baseline, NOT 2× (what a single all-rows UDF
  *     filter over the whole scan would do).
  * (2) CORRECTNESS AT WIDTH — 20 files × 500 deleted rows each through
  *     the (path, dv.uniqueId) replay and the broadcast probe: exact
  *     expected count, exact absent ids.
  * (3) DV DECODE COST — descriptor decode is per-FILE driver work
  *     (bounded by live DV count), not per-row: snapshot build time
  *     with 20 DVs stays in the same class as without.
  *
  * Timings are min-of-2 on a shared VM; counts are exact.
  */
object Scratch10 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rows = 2000000L
    val files = 200
    val dirtyFiles = 20
    val deletedPerFile = 500

    def mkTable(root: String, withDvs: Boolean): Unit = {
      val df = spark.range(rows).select(col("id"),
        (col("id") % 97).as("k"), concat(lit("payload_"), col("id")).as("v"))
      graft.sources.DeltaWrite.append(spark, df.repartition(files), root)
      if (withDvs) {
        val snap = graft.sources.DeltaRead.snapshot(spark, root)
        val targets = snap.files.keySet.toSeq.sorted.take(dirtyFiles)
        val lines = Seq.newBuilder[String]
        targets.foreach { f =>
          val sz = java.nio.file.Files.size(java.nio.file.Paths.get(root, f))
          lines += s"""{"remove":{"path":"$f","deletionTimestamp":1,"dataChange":true}}"""
          lines += s"""{"add":{"path":"$f","partitionValues":{},"size":$sz,""" +
            s""""modificationTime":1,"dataChange":true,${graft.sources.DvTestUtil
              .inlineDvJson(0L until deletedPerFile.toLong)}}}"""
        }
        val p = java.nio.file.Paths.get(root, "_delta_log", f"${1L}%020d.json")
        java.nio.file.Files.write(p,
          (("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
            """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""" +
            "\n") + lines.result().mkString("\n") + "\n").getBytes("UTF-8"))
      }
    }

    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def min2(f: => Long): (Long, Double) = {
      val (r1, t1) = timeIt(f); val (_, t2) = timeIt(f)
      (r1, math.min(t1, t2))
    }

    val cleanRoot = java.nio.file.Files.createTempDirectory("s10_clean").toString + "/t"
    val dirtyRoot = java.nio.file.Files.createTempDirectory("s10_dirty").toString + "/t"
    mkTable(cleanRoot, withDvs = false)
    mkTable(dirtyRoot, withDvs = true)

    val (snapC, snapTc) = timeIt(graft.sources.DeltaRead.snapshot(spark, cleanRoot))
    val (snapD, snapTd) = timeIt(graft.sources.DeltaRead.snapshot(spark, dirtyRoot))
    println(f"snapshot build: clean ${snapTc}%.2f s (${snapC.files.size} files), " +
      f"dv ${snapTd}%.2f s (${snapD.dvs.size} DVs)")

    val (cntClean, tClean) = min2(graft.sources.DeltaRead.read(spark, cleanRoot).count())
    val (cntDirty, tDirty) = min2(graft.sources.DeltaRead.read(spark, dirtyRoot).count())
    val expected = rows - dirtyFiles.toLong * deletedPerFile
    println(f"full count: clean $cntClean in ${tClean}%.2f s, " +
      f"dv $cntDirty (expect $expected) in ${tDirty}%.2f s, ratio ${tDirty / tClean}%.2f")
    assert(cntClean == rows, s"clean count $cntClean")
    assert(cntDirty == expected, s"dv count $cntDirty != $expected")

    // aggregation over the split scan: a REALISTIC read (projects k,
    // not the count()'s zero-column scan) — the fair clean-vs-dv
    // comparison, exercising unionByName of the branches under codegen
    val (aggC, tAggC) = min2(
      graft.sources.DeltaRead.read(spark, cleanRoot).groupBy("k").count().count())
    val (aggD, tAgg) = min2(
      graft.sources.DeltaRead.read(spark, dirtyRoot).groupBy("k").count().count())
    println(f"group-by: clean $aggC groups in ${tAggC}%.2f s, " +
      f"dv $aggD groups in ${tAgg}%.2f s, ratio ${tAgg / tAggC}%.2f")
    assert(aggC == 97L && aggD == 97L)

    spark.stop()
  }
}
