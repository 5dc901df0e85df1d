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
    vecs.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
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
