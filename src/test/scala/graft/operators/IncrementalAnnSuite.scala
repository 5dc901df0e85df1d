package graft.operators

import graft.SparkSpec
import graft.pipeline.VersionedTable
import org.apache.spark.sql.functions._

/** Incremental IVF index: exhaustive search equals brute force through
  * the full init → append → search loop, appends are O(delta) versioned
  * commits, pruned searches keep planted-cluster recall, and the
  * probed-list filter reaches the parquet scan as a partition filter.
  */
class IncrementalAnnSuite extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  /** 8 planted clusters × 12 members, seeded. */
  private lazy val allVecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    for (c <- 0 until 8; i <- 0 until 12) yield {
      val v = centers(c).map(x => x + 0.1f * rnd.nextGaussian().toFloat)
      ((c * 12 + i).toLong, v)
    }
  }
  private lazy val all = allVecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  private lazy val base = all.where(col("vec_id") % 4 =!= 0)
  private lazy val delta = all.where(col("vec_id") % 4 === 0)

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/index"

  test("exhaustive search over init+append == brute force on the union") {
    val root = tmpRoot("incann_exact")
    val v1 = IncrementalAnn.initIndex(spark, base, root, nlist = 6, iters = 2)
    assert(v1 === 1L)
    val v2 = IncrementalAnn.appendDelta(spark, delta, root)
    assert(v2 === 2L)

    val probes = all.where(col("vec_id") < 5)
    val got = IncrementalAnn.search(spark, root, probes, k = 5, nprobe = 6)
      .orderBy("probe_id", "rank").collect().toSeq
    val brute = Similarity.knnBrute(all, probes, k = 5)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(got === brute)

    // the append really was O(delta): v2's new rows are exactly the batch
    val appended = VersionedTable.changesSince(spark, root, v1)
    assert(appended.select("vec_id").as[Long].collect().toSet ===
      delta.select("vec_id").as[Long].collect().toSet)
  }

  test("pruned search (nprobe < nlist) keeps planted-cluster recall") {
    val root = tmpRoot("incann_recall")
    IncrementalAnn.initIndex(spark, base, root, nlist = 6, iters = 2)
    IncrementalAnn.appendDelta(spark, delta, root)
    val probes = all.where(col("vec_id") % 12 === 0)
    val brute = Similarity.knnBrute(all, probes, k = 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val got = IncrementalAnn.search(spark, root, probes, k = 5, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.8, s"incremental IVF recall $recall too low")
  }

  test("probed lists reach the scan as a partition filter") {
    val root = tmpRoot("incann_prune")
    IncrementalAnn.initIndex(spark, base, root, nlist = 6, iters = 2)
    // the committed layout is hive-partitioned by inverted list
    val dataDir = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data-")).head
    assert(dataDir.listFiles().exists(_.getName.startsWith("list_id=")))

    val probes = all.where(col("vec_id") < 2)
    val plan = IncrementalAnn.search(spark, root, probes, k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"expected a list_id partition filter in the scan:\n$plan")
  }

  test("search without an index fails loudly; centroids stay fixed across appends") {
    val bare = tmpRoot("incann_bare")
    val e = intercept[IllegalStateException] {
      IncrementalAnn.search(spark, bare, all.limit(1))
    }
    assert(e.getMessage.contains("initIndex"))

    val root = tmpRoot("incann_fixed")
    IncrementalAnn.initIndex(spark, base, root, nlist = 6, iters = 2)
    val before = IncrementalAnn.centroids(spark, root).map(_._2.toSeq)
    IncrementalAnn.appendDelta(spark, delta, root)
    val after = IncrementalAnn.centroids(spark, root).map(_._2.toSeq)
    assert(before === after)
  }
}
