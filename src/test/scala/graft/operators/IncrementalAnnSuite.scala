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

  test("rebalanceLists splits a hot list after a skewed append stream; exhaustive search still exact") {
    val root = tmpRoot("incann_rebal")
    IncrementalAnn.initIndex(spark, base, root, nlist = 6, iters = 2)
    // skewed stream: many batches clustered around ONE planted center
    // pile onto a single inverted list
    val rnd = new scala.util.Random(23)
    val hotCenter = allVecs.head._2
    val skewVecs = (0 until 4).map { b =>
      (0 until 30).map { i =>
        ((1000 + b * 30 + i).toLong,
          hotCenter.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
      }.toDF("vec_id", "embedding")
    }
    skewVecs.foreach(IncrementalAnn.appendDelta(spark, _, root))
    def listCounts(): Map[Int, Long] =
      VersionedTable.read(spark, root).groupBy("list_id").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val beforeCounts = listCounts()
    assert(beforeCounts.values.max > 2 * beforeCounts.values.sum / 6,
      s"setup must create a hot list: $beforeCounts")
    val preVersion = VersionedTable.currentSnapshot(spark, root).get.version

    val split = IncrementalAnn.rebalanceLists(spark, root, maxListFactor = 2.0, splitWays = 3)
    assert(split.nonEmpty, "the hot list must be detected and split")
    val afterCounts = listCounts()
    // split lists are gone, replaced by fresh sub-lists; no rows lost
    assert(split.forall(!afterCounts.contains(_)))
    assert(afterCounts.values.sum == beforeCounts.values.sum)
    assert(afterCounts.values.max < beforeCounts.values.max)
    // quantizer names exactly the live lists
    val cents = IncrementalAnn.centroids(spark, root).map(_._1).toSet
    assert(afterCounts.keySet.subsetOf(cents))
    // the rewrite touched ONLY the hot partitions (cold dirs carried by
    // reference: their file sets are unchanged across the commit)
    val beforeFiles = VersionedTable.snapshotFilesPartitioned(spark, root, preVersion)
      ._1.map(_.path).toSet
    val afterFiles = VersionedTable.snapshotFilesPartitioned(spark, root, preVersion + 1)
      ._1.map(_.path).toSet
    assert((beforeFiles intersect afterFiles).nonEmpty, "cold partitions must carry over")

    // exhaustive search over the rebalanced index still EQUALS brute
    // force (q34's oracle trick) — rebalance moved rows, lost none
    // (the index holds base + the skew stream; probes need not be in it)
    val union = base.unionByName(skewVecs.reduce(_ unionByName _))
    val probes = union.where(col("vec_id") < 3 || col("vec_id") === 1001L)
    val nlistNow = cents.size
    val got = IncrementalAnn.search(spark, root, probes, k = 5, nprobe = nlistNow)
      .orderBy("probe_id", "rank").collect().toSeq
    val brute = Similarity.knnBrute(union, probes, k = 5)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(got === brute)
    // pruned search into the split region keeps recall: a probe at the
    // hot center finds its planted neighbors through the sub-centroids
    val hotProbe = Seq((9999L, hotCenter.toSeq)).toDF("vec_id", "embedding")
    val pruned = IncrementalAnn.search(spark, root, hotProbe, k = 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(pruned.count(_ >= 1000L) >= 8,
      s"sub-centroid probing must reach the split vectors: $pruned")
    // a list within the factor is left alone (no-op at a threshold the
    // index now satisfies); a tighter factor may keep splitting — the
    // blob is near-degenerate, so convergence to factor 2 isn't owed
    val relaxed = afterCounts.values.max.toDouble /
      (afterCounts.values.sum.toDouble / cents.size) + 0.5
    assert(IncrementalAnn.rebalanceLists(spark, root, maxListFactor = relaxed).isEmpty)
  }

  test("maintain: compact + rebalance-to-fixpoint makes the index self-tending") {
    val root = tmpRoot("incann_maint")
    IncrementalAnn.initIndex(spark, base, root, nlist = 6, iters = 2)
    // moderately-skewed stream (wider noise than the rebalance test, so
    // splitting converges instead of re-splitting a degenerate blob)
    val rnd = new scala.util.Random(41)
    val hotCenter = allVecs.head._2
    val skewVecs = (0 until 4).map { b =>
      (0 until 25).map { i =>
        ((2000 + b * 25 + i).toLong,
          hotCenter.map(x => x + 0.4f * rnd.nextGaussian().toFloat).toSeq)
      }.toDF("vec_id", "embedding")
    }
    skewVecs.foreach(IncrementalAnn.appendDelta(spark, _, root))
    val snapBefore = VersionedTable.currentSnapshot(spark, root).get
    assert(snapBefore.dataDirs.length > 2, "appends must have left per-batch dirs")

    val split = IncrementalAnn.maintain(spark, root, maxListFactor = 2.5, splitWays = 3)
    assert(split.nonEmpty, "the hot list must be split by maintenance")
    // maintain = compact commit + >=1 rebalance commit (the multi-dir
    // append layout guarantees the compact is a real fold, not a no-op)
    val vAfter = VersionedTable.currentSnapshot(spark, root).get.version
    assert(vAfter >= snapBefore.version + 2,
      s"expected compact+rebalance commits: v${snapBefore.version} -> v$vAfter")
    // the compacted fold is visible at the rebalance's PARENT version:
    // fewer entries than the pre-maintenance append pile
    val parentDirs = VersionedTable.history(spark, root)
      .find(_.version == snapBefore.version + 1).get.dataDirs.length
    assert(parentDirs < snapBefore.dataDirs.length,
      s"compact must fold the append dirs: ${snapBefore.dataDirs.length} -> $parentDirs")
    // fixpoint: an immediate second maintenance has nothing to do
    assert(IncrementalAnn.maintain(spark, root, maxListFactor = 2.5, splitWays = 3).isEmpty)
    // correctness invariant: exhaustive search still equals brute force
    val union = base.unionByName(skewVecs.reduce(_ unionByName _))
    val probes = union.where(col("vec_id") < 3 || col("vec_id") === 2001L)
    val nlistNow = IncrementalAnn.centroids(spark, root).size
    val got = IncrementalAnn.search(spark, root, probes, k = 5, nprobe = nlistNow)
      .orderBy("probe_id", "rank").collect().toSeq
    val brute = Similarity.knnBrute(union, probes, k = 5)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(got === brute)
  }
}
