package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over embedding columns — the data-mixing /
  * domain-balancing primitive a training-data pipeline runs after
  * dedup: cluster the corpus, profile per-cluster mass, and draw a
  * cluster-balanced sample so no single mode dominates the mixture.
  * (The reference has no clustering surface — this extends the
  * LLM-pipeline family like Dedup/Similarity/Curation do.)
  *
  * Training is Lloyd's, shared with the IVF coarse quantizer
  * ([[Similarity.ivfCentroids]]): deterministic lowest-id init, one
  * distributed pass per round, only k × dim floats ever on the
  * driver. Assignment rides the native NearestCentroid kernel — a
  * codegen'd pure projection whose plan size is independent of
  * k × dim — so a 100 TB corpus assigns in a single scan with zero
  * shuffles. The balanced sample is a pure FILTER (multiplicative
  * hash of the id vs a per-cluster integer rate), not a per-cluster
  * window sort: no k-partition skew, preserves input partitioning,
  * reproducible across engines (same hash family as
  * [[Curation.stratifiedSample]]).
  */
object Clustering {

  /** Lloyd-trained centroids (see [[Similarity.ivfCentroids]] for the
    * per-round cost shape). Returned as (clusterId, centroid) with ids
    * 0 until k.
    */
  def train(corpus: DataFrame, k: Int, iters: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Array[Float])] =
    Similarity.ivfCentroids(corpus, k, iters, idCol, vecCol)

  /** Zero-iteration quantizer: the corpus rows with the k smallest ids
    * become the fixed centroids (cluster id = ordinal in id order).
    * Deterministic AND SQL-portable — Lloyd means are not (their float
    * accumulation order is engine-specific), which is why the
    * oracle-hashed q99/q100 assign against THIS quantizer while q44's
    * ANN path uses the trained one.
    */
  def fixedCentroids(corpus: DataFrame, k: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Seq[(Int, Array[Float])] =
    corpus.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).toArray }.toSeq

  /** Nearest-centroid cluster id as a pure projection (native kernel;
    * cosine metric, ties to the larger cluster id, null/zero vectors
    * rank below all reals — [[graft.functions.VectorFunctions.nearestCentroid]]).
    */
  def assign(vec: Column, cents: Seq[(Int, Array[Float])]): Column =
    graft.functions.VectorFunctions.nearestCentroid(vec,
      cents.map(_._1).toArray, cents.map(_._2).toArray)

  /** Per-cluster mass profile: (cluster, n_vectors, min/max id). One
    * corpus scan — the assignment fuses with the scan under
    * whole-stage codegen — then a k-row shuffle with map-side partial
    * aggregation. The k-row result is the input a mixture designer
    * (or [[balancedSample]]) consumes.
    */
  def clusterStats(corpus: DataFrame, cents: Seq[(Int, Array[Float])],
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(idCol), assign(col(vecCol), cents).as("cluster"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vectors"),
        min(col(idCol)).as("min_vec_id"),
        max(col(idCol)).as("max_vec_id"))

  /** Cluster-balanced downsample: each cluster keeps ~`perCluster`
    * rows, selected by the deterministic 0–99 hash bucket of the id
    * ([[Curation.stratifiedSample]]'s multiplicative hash — integer
    * math only, no rand(), no per-cluster sort). A cluster of
    * n ≤ perCluster keeps everything (rate 100); a larger cluster
    * keeps the ceil(100·perCluster/n) percent of ids whose bucket
    * clears the threshold — approximate by design (hash thinning),
    * which is the 100 TB-shaped trade: the alternative exact top-N
    * per cluster is a k-partition window sort with unbounded skew.
    *
    * Two scans total: the k-row size profile (collected — k is the
    * cluster count, a bounded probe set), then the pure filter scan.
    * Output: (id, cluster, bucket) — bucket kept as the audit column,
    * same contract as stratifiedSample.
    */
  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then remove
    * near-duplicates WITHIN each cluster — the cluster bounds the
    * quadratic, so the corpus-wide near-dup pass costs
    * O(sum cluster² ) instead of O(n²), and the per-cluster cap
    * (`maxCluster`, enforced inside the native bounded_collect_list
    * aggregate) hard-bounds the worst bucket exactly like the LSH
    * family ([[Dedup.bucketPairs]]).
    *
    * Keep rule: a vector is DROPPED iff some LOWER-id vector in the
    * same cluster has cosine ≥ `threshold` to it (cosine rounded to 4
    * digits in double accumulation — the q85-proven portable
    * formulation). Deterministic, order-free, and engine-portable:
    * no float ordering beyond the threshold test itself. (The paper
    * orders by distance-to-centroid; min-id is the same greedy with a
    * portable total order.)
    *
    * Shape at 100 TB: one fused kernel scan for assignment (plan size
    * independent of k × dim), one shuffle on cluster id for pair
    * generation carrying 8-byte ids only, vectors joined back by id
    * for the verify, and a left-anti join for the survivors. The
    * assignment is persisted across its two consumers
    * (pair generation + survivor anti-join) and released after the
    * result materializes — the repo-wide operator cache contract.
    *
    * Output: (idCol, cluster) — the surviving rows.
    */
  def semDedup(corpus: DataFrame, cents: Seq[(Int, Array[Float])],
               threshold: Double, maxCluster: Int = 4000,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (survivors, assigned) =
      semDedupPlan(corpus, cents, threshold, maxCluster, idCol, vecCol, persist = true)
    Dedup.materializeAndRelease(survivors, assigned)
  }

  /** The un-materialized survivors plan — the seam PlanAuditSuite
    * audits (the public operator localCheckpoints, which hides the
    * plan behind a LogicalRDD). Returns (survivors, assigned); the
    * caller owns releasing `assigned` when `persist` is set.
    */
  private[graft] def semDedupPlan(corpus: DataFrame, cents: Seq[(Int, Array[Float])],
      threshold: Double, maxCluster: Int, idCol: String, vecCol: String,
      persist: Boolean): (DataFrame, DataFrame) = {
    val assigned0 = corpus
      .select(col(idCol).as("id"), assign(col(vecCol), cents).as("cluster"))
    val assigned = if (persist)
      assigned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else assigned0
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val dropped = Dedup.bucketPairs(assigned, Seq("cluster"), "id", maxCluster)
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .where(round(Similarity.cosine(col("vec_a"), col("vec_b")), 4) >= threshold)
      .select(col("id_b").as("id")).distinct()
    val survivors = assigned.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cluster"))
    (survivors, assigned)
  }

  def balancedSample(corpus: DataFrame, cents: Seq[(Int, Array[Float])],
                     perCluster: Long, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val sizes = clusterStats(corpus, cents, idCol, vecCol)
      .select(col("cluster"), col("n_vectors")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // integer ceil(100*cap/n), capped at 100 — portable to any engine
    val rateOf: Map[Int, Long] =
      sizes.map { case (c, n) => c -> math.min(100L, (100L * perCluster + n - 1) / n) }
    val rate = rateOf.foldLeft(lit(0L)) { case (acc, (c, r)) =>
      when(col("cluster") === c, lit(r)).otherwise(acc)
    }
    // same folded multiplicative hash as stratifiedSample: id below
    // 2^20 before the multiply keeps a*id < 2^52 (no overflow, ANSI-safe)
    val bucket = ((pmod(col(idCol), lit(1000003L)) * lit(2654435761L))
      .mod(lit(4294967296L)) / lit(42949673L)).cast("long")
    corpus
      .select(col(idCol), assign(col(vecCol), cents).as("cluster"))
      .withColumn("bucket", bucket)
      .where(col("bucket") < rate)
  }
}
