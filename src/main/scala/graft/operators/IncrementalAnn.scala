package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.VersionedTable

/** Incremental ANN index maintenance — the third leg of the
  * incremental-ingest story next to [[IncrementalDedup]]'s exact and
  * near-dup stores: an IVF-Flat index persisted as a VERSIONED,
  * list-partitioned table, so ingest batches append at O(delta) cost
  * and searches read only the probed inverted lists.
  *
  *  - `initIndex`: train the coarse quantizer once (persisted via
  *    [[Similarity.ivfCentroidsPath]] — atomic publish, loser adopts
  *    winner), assign every corpus vector to its nearest-centroid
  *    list, and commit `(vec_id, vec, list_id)` PARTITIONED BY list_id
  *    as versioned-table v1. Training is the only multi-pass cost and
  *    it never recurs.
  *  - `appendDelta`: assign the BATCH ONLY against the stored
  *    centroids (one projection — no Lloyd pass, no corpus touch) and
  *    `commitDelta` it: O(delta) I/O however large the index, same
  *    manifest protocol as every other graft table (history / compact /
  *    vacuum / changesSince apply). Centroids stay fixed across
  *    appends — standard IVF practice; retrain offline (re-init) when
  *    drift degrades recall.
  *  - `search`: probes explode to their `nprobe` nearest lists and the
  *    index is filtered to exactly those list partitions BEFORE the
  *    scan — the probed list set is at most `nlist` small integers
  *    whatever the probe count, so the filter is collected driver-side
  *    and pushed as a STATIC partition-pruning predicate (no reliance
  *    on runtime DPP). At scale this is the difference between
  *    scanning nprobe/nlist of 100 TB and scanning all of it.
  *
  * With `nprobe = nlist` the search is exhaustive and EXACTLY equals
  * brute force ([[Similarity.knnBrute]] semantics: self excluded,
  * cosine rounded to 4, ties by vec_id) — which is what lets the
  * driver hash-check the whole init → append → search loop against a
  * SQL oracle (q70).
  *
  * Reference analog: none — drune has no vector indexing; this is the
  * Spark-engine scale path (IVF after Jégou et al., "Product
  * quantization for nearest neighbor search", the non-PQ coarse stage).
  */
object IncrementalAnn {

  private val CentroidsDir = "_centroids"

  private def centroidsPath(root: String): String = new Path(root, CentroidsDir).toString

  /** The index's pinned coarse quantizer (loud if absent). */
  def centroids(spark: SparkSession, root: String): Seq[(Int, Array[Float])] =
    try Similarity.centroidsFromDF(spark.read.parquet(centroidsPath(root)))
    catch { case e: Exception => throw new IllegalStateException(
      s"no quantizer at ${centroidsPath(root)} — initIndex must create the index first", e)
    }

  private def assigned(vecs: DataFrame, cents: Seq[(Int, Array[Float])],
                       idCol: String, vecCol: String): DataFrame =
    // Spread the corpus/batch scan feeding the nearest-centroid kernel
    // (r19, guide §2.5 — the same single-split serial-kernel shape as
    // the text operators' sites; rows are partitioning-invariant, the
    // result commits keyed by list_id)
    Spread.medium(vecs).select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      Similarity.ivfAssign(col(vecCol), cents).as("list_id"))

  /** Create (or overwrite) the index: one quantizer training + one
    * assignment pass over the corpus, committed as v1 (or a full-copy
    * version on an existing index), partitioned by inverted list.
    */
  def initIndex(
      spark: SparkSession,
      corpus: DataFrame,
      root: String,
      nlist: Int = 16,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val cents = Similarity.ivfCentroidsPath(
      spark, centroidsPath(root), corpus, nlist, iters, idCol, vecCol)
    VersionedTable.commit(spark, root, "parquet",
      _ => assigned(corpus, cents, idCol, vecCol), partitionBy = Seq("list_id"))
  }

  /** Admit an ingest batch: nearest-centroid assignment is a single
    * projection over the BATCH (the index is not read at all) and the
    * rows land as one O(delta) append commit. Returns the committed
    * version, so `changesSince` answers "which vectors did batch N
    * add". Id discipline: vec_ids must be unique across batches —
    * appending an existing id does not replace it.
    */
  def appendDelta(
      spark: SparkSession,
      delta: DataFrame,
      root: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val cents = centroids(spark, root)
    VersionedTable.commitDelta(spark, root, "parquet",
      assigned(delta, cents, idCol, vecCol), partitionBy = Seq("list_id"))
  }

  /** LIST-SKEW MAINTENANCE: split oversized inverted lists in place.
    * Many O(delta) appends against fixed centroids drift mass onto hot
    * lists (every probe that touches one pays its whole scan); a full
    * retrain (re-init) fixes that at one corpus pass, but rebalance is
    * the cheaper standing tool — O(hot lists), not O(index):
    *
    *  - lists holding more than `maxListFactor` × the mean are split:
    *    `splitWays` sub-centroids train on THAT LIST'S vectors only
    *    (a bounded per-list Lloyd run), taking fresh list ids;
    *  - only the hot partitions rewrite — the data commit is ONE
    *    [[VersionedTable.commitOverwriteWhere]] on `list_id IN (hot)`,
    *    so cold lists carry over by reference (zero data I/O);
    *  - the quantizer then re-publishes with the hot centroids
    *    replaced by their sub-centroids. Future appends and probes
    *    use the finer cells.
    *
    * Search correctness never depends on balance: with nprobe = nlist
    * the result still EXACTLY equals brute force (the suite pins a
    * skewed-append → rebalance → exhaustive-search loop against
    * [[Similarity.knnBrute]]).
    *
    * Crash posture (maintenance op, single-writer like re-init): the
    * data commit lands BEFORE the quantizer re-publish; a crash
    * between them leaves sub-lists the quantizer doesn't name. This
    * call HEALS that on entry — any list id present in the index but
    * absent from the quantizer gets its mean vector added back — so
    * re-running the rebalance converges instead of stranding vectors.
    *
    * Returns the list ids that were split (empty = balanced already).
    */
  def rebalanceLists(
      spark: SparkSession,
      root: String,
      maxListFactor: Double = 2.0,
      splitWays: Int = 2,
      iters: Int = 2): Seq[Int] = {
    require(maxListFactor > 1.0, s"maxListFactor must exceed 1: $maxListFactor")
    require(splitWays >= 2, s"splitWays must be at least 2: $splitWays")
    var cents = centroids(spark, root)
    val idx = VersionedTable.read(spark, root)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = idx.groupBy("list_id").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      if (counts.isEmpty) return Nil
      // heal orphan lists from a crashed prior rebalance (see doc)
      val orphans = counts.keySet -- cents.map(_._1).toSet
      if (orphans.nonEmpty) {
        val means = listMeans(idx.where(col("list_id").isin(orphans.toSeq: _*)))
        cents = (cents ++ means).sortBy(_._1)
        publishCentroids(spark, root, cents)
      }
      val mean = counts.values.sum.toDouble / cents.length
      val hot = counts.filter(_._2 > maxListFactor * math.max(1.0, mean))
        .keys.toSeq.sorted
      if (hot.isEmpty) return Nil
      var nextId = cents.map(_._1).max + 1
      val subCents = hot.flatMap { lid =>
        val sub = Similarity.ivfCentroids(
          idx.where(col("list_id") === lid), splitWays, iters, "vec_id", "vec")
        sub.map { case (_, c) => val id = nextId; nextId += 1; (lid, id, c) }
      }
      // each hot list's vectors re-assign against ITS OWN sub-centroids
      // (assigning against the full set could land rows in cold lists,
      // whose partitions this commit deliberately does not touch)
      val reassigned = hot.map { lid =>
        val mine = subCents.collect { case (`lid`, id, c) => id -> c }
        idx.where(col("list_id") === lid)
          .select(col("vec_id"), col("vec"),
            Similarity.ivfAssign(col("vec"), mine).as("list_id"))
      }.reduce(_ unionByName _)
      // the condition names the dropped hot lists AND the fresh
      // sub-list ids: replaceWhere keeps only source rows matching the
      // predicate (delta-spark's replaceWhere contract) — the fresh
      // ids hold no pre-existing rows, so the removal set is still
      // exactly the hot partitions
      val touched = hot ++ subCents.map(_._2)
      VersionedTable.commitOverwriteWhere(spark, root, "parquet", reassigned,
        s"list_id IN (${touched.mkString(", ")})", partitionBy = Seq("list_id"))
      publishCentroids(spark, root,
        (cents.filterNot(c => hot.contains(c._1)) ++
          subCents.map { case (_, id, c) => id -> c }).sortBy(_._1))
      hot
    } finally idx.unpersist(blocking = false)
  }

  /** Standing SELF-TENDING maintenance — the hook that keeps a
    * long-lived incremental index healthy without operator judgment:
    * COMPACT the index table first (every O(delta) append leaves one
    * small directory; the rebalance scan and every probe pay that
    * file-count tax), then [[rebalanceLists]] repeatedly until no
    * list exceeds the factor — a tight hot blob legitimately needs a
    * second split round when its sub-lists are still oversized (the
    * suite pins this), so one pass is not a fixpoint. Bounded by
    * `maxRounds`; each piece is already idempotent/crash-convergent
    * (compact no-ops on a single-dir snapshot, rebalance heals
    * quantizer orphans on entry), so re-running after any crash
    * converges. Returns every list id split across rounds (empty =
    * the index was already tended).
    *
    * Cadence guidance: run after every K ingest batches or from the
    * same scheduler slot as table vacuum — cost is O(hot lists +
    * live-file rewrite of one compaction), never O(corpus) kmeans.
    */
  def maintain(
      spark: SparkSession,
      root: String,
      maxListFactor: Double = 2.0,
      splitWays: Int = 2,
      iters: Int = 2,
      maxRounds: Int = 4): Seq[Int] = {
    VersionedTable.compact(spark, root, "parquet", partitionBy = Seq("list_id"))
    val all = Seq.newBuilder[Int]
    var round = 0
    var splitting = true
    while (splitting && round < maxRounds) {
      val split = rebalanceLists(spark, root, maxListFactor, splitWays, iters)
      all ++= split
      splitting = split.nonEmpty
      round += 1
    }
    all.result()
  }

  /** Mean vector per list (the heal path's centroid reconstruction). */
  private def listMeans(lists: DataFrame): Seq[(Int, Array[Float])] =
    lists.select(col("list_id"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("list_id", "pos").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("list_id"),
        transform(col("pm"), p => p.getField("m").cast("float")).as("cvec"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toSeq

  /** Replace the persisted quantizer (tmp write + swap; rebalance is a
    * single-writer maintenance op — see [[rebalanceLists]] doc).
    */
  private def publishCentroids(spark: SparkSession, root: String,
                               cents: Seq[(Int, Array[Float])]): Unit = {
    val target = new Path(centroidsPath(root))
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(target.getParent,
      target.getName + "__rebal_" + java.util.UUID.randomUUID.toString.take(8))
    Similarity.centroidsToDF(spark, cents).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(target, true)
    require(fs.rename(tmp, target),
      s"quantizer swap $tmp -> $target failed; index data is committed — re-run " +
        "rebalanceLists to heal the quantizer")
  }

  /** IVF search over the persisted index: rank the `nprobe`
    * nearest-list candidates of each probe by exact cosine, keep the
    * top `k` (`probe_id, vec_id, sim, rank`; self excluded, sim
    * rounded to 4, ties by vec_id). Only the probed list partitions
    * are scanned (static pruning — see class doc).
    */
  def search(
      spark: SparkSession,
      root: String,
      probes: DataFrame,
      k: Int = 10,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(spark, root)
    val probed = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      explode(Similarity.ivfProbeLists(col(vecCol), cents, nprobe)).as("list_id"))
    // the probed-list set is ⊆ {0..nlist-1} — a bounded driver-side
    // collect whatever the probe count; skip the filter when it cannot
    // prune (exhaustive search)
    val probedLists = probed.select("list_id").distinct().collect().map(_.getInt(0))
    val lists0 = VersionedTable.read(spark, root)
    val lists = if (probedLists.length >= cents.length) lists0
      else lists0.where(col("list_id").isin(probedLists.toSeq: _*))
    broadcast(probed).join(lists, Seq("list_id"))
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("sim", round(Similarity.cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rank"))
  }
}
