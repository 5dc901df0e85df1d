package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.pipeline.VersionedTable

/** Incremental corpus deduplication against a PERSISTED signature
  * store — the workflow a 100 TB training-data pipeline actually runs:
  * the corpus is deduped once, its per-document signatures are kept as
  * a versioned table, and each new ingest batch ("delta") is deduped
  * against the corpus WITHOUT recomputing anything over the corpus
  * text. Signature computation (normalize → shingle → MinHash over
  * every byte of text) is the dominant cost of near-dup dedup; here it
  * runs over the delta only, while the corpus contributes two cheap
  * columnar scans of its stored signatures (~1 KB/doc — two orders of
  * magnitude less I/O than the text). Surviving delta signatures are
  * appended to the store as an O(delta) versioned commit
  * ([[graft.pipeline.VersionedTable.commitDelta]]), so the store rides
  * the same manifest protocol as every other graft table: concurrent
  * ingest batches serialize via the pointer CAS, history/compact/vacuum
  * apply, and `changesSince` exposes "which docs were admitted by batch
  * N" to downstream consumers.
  *
  * Reference analog: drune dedups only within one materialization
  * (steps/writer.py merge modes); a persistent cross-batch signature
  * store has no drune counterpart — this is the scale path the Spark
  * engine adds.
  *
  * Two stores, two semantics:
  *  - MinHash store (`initStore`/`dedupeDelta`): near-duplicate dedup.
  *    Store rows are `(id long, sig array<long>)`; the MinHash family
  *    parameters are pinned in a `_sig_params` file at the store root
  *    and re-used for every delta (signatures from different
  *    parameters are incomparable — mixing them is a silent-wrong-
  *    answer bug, hence the loud fail on mismatch).
  *  - Exact store (`initExactStore`/`exactDelta`): exact dedup. Store
  *    rows are `(fingerprint string, keeper_id long)` over the
  *    md5-of-normalized-text fingerprint (TextAnalysis.fingerprintMd5,
  *    the q29 semantics).
  *
  * Id discipline: document ids must be unique ACROSS corpus and delta
  * (they are join keys and keeper labels). Delta-internal keeper
  * semantics match the batch operators: lowest id wins; any corpus
  * match drops the delta doc regardless of id order (the corpus doc is
  * already committed).
  */
object IncrementalDedup {

  /** MinHash family parameters pinned at store creation. `bands` /
    * `threshold` are query-time knobs and intentionally NOT part of
    * the store contract (band keys are derived from the signature at
    * read time).
    */
  final case class SigParams(numHashes: Int = 128, shingleK: Int = 5, seed: Long = 42L)

  private val ParamsFile = "_sig_params"

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeParams(spark: SparkSession, root: String, p: SigParams): Unit = {
    val (fs, rootP) = fsFor(spark, root)
    val f = new Path(rootP, ParamsFile)
    val tmp = new Path(rootP, ParamsFile + ".tmp" + java.util.UUID.randomUUID.toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(s"numHashes=${p.numHashes}\nshingleK=${p.shingleK}\nseed=${p.seed}\n"
      .getBytes("UTF-8"))
    finally out.close()
    fs.delete(f, false)
    if (!fs.rename(tmp, f)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"could not publish $f")
    }
  }

  /** The store's pinned MinHash parameters, or None if `root` has no
    * `_sig_params` (not an IncrementalDedup store, or pre-init).
    */
  def storeParams(spark: SparkSession, root: String): Option[SigParams] = {
    val (fs, rootP) = fsFor(spark, root)
    val f = new Path(rootP, ParamsFile)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val content = try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8")
      } finally in.close()
      val kv = content.linesIterator.flatMap { l =>
        l.split("=", 2) match { case Array(k, v) => Some(k.trim -> v.trim); case _ => None }
      }.toMap
      try Some(SigParams(kv("numHashes").toInt, kv("shingleK").toInt, kv("seed").toLong))
      catch { case e: Exception =>
        throw new IllegalStateException(s"corrupt $ParamsFile at $root: '$content'", e)
      }
    }
  }

  /** Create (or overwrite) the MinHash signature store for `docs`:
    * one full signature pass over the corpus text, committed as
    * versioned-table v1 (or a new full-copy version on an existing
    * store), parameters pinned alongside. This is the once-per-corpus
    * cost every later delta avoids.
    */
  def initStore(
      spark: SparkSession,
      docs: DataFrame,
      root: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      params: SigParams = SigParams()): Long = {
    val sigs = Dedup.minhashSignatures(
      docs, idCol, textCol, params.numHashes, params.shingleK, params.seed)
    val v = VersionedTable.commit(spark, root, "parquet", _ => sigs)
    writeParams(spark, root, params)
    v
  }

  /** Result of a delta dedup: `pairs` are the verified near-dup pairs
    * touching the delta (`src` = "corpus" for delta-vs-corpus,
    * "delta" for delta-internal; `id_a < id_b`); `survivors` are the
    * delta rows admitted to the corpus; `version` is the store version
    * the survivor signatures were committed as (-1 when `append` was
    * false). Both frames are materialized (safe after temp release).
    */
  final case class DeltaDedup(pairs: DataFrame, survivors: DataFrame, version: Long)

  /** Dedup a delta batch against the stored corpus WITHOUT touching
    * corpus text. Plan shape (scale-critical):
    *
    *  1. Delta signatures: the only text pass — O(delta).
    *  2. Delta band keys aggregate to per-(band,key) member lists
    *     (bounded, like [[Dedup.bucketPairs]]) — a tiny table,
    *     broadcast.
    *  3. Corpus signatures stream ONCE through a projection that
    *     derives band keys and broadcast-joins the delta's keys: no
    *     corpus shuffle, no corpus text, only colliding corpus rows
    *     survive (LSH-bounded).
    *  4. Joint skew guard: a (band,key) bucket whose combined
    *     delta+corpus membership exceeds `maxBucket` is dropped
    *     wholesale — byte-identical semantics to the batch operator's
    *     guard over the union corpus (each side's bounded collect
    *     keeps maxBucket+1, so the overflow test is exact).
    *  5. Candidate pairs = delta×corpus collisions + delta-internal
    *     combinations; only 8-byte ids shuffle.
    *  6. Verify by signature agreement (codegen'd matchCountL ≥
    *     threshold), corpus sigs fetched by a second broadcast-probed
    *     scan (size-probed: beyond `maxBroadcastPairs` candidate
    *     pairs the fetch switches to a shuffled join).
    *  7. Survivors = delta minus dropped (any corpus match, or a
    *     lower-id delta match); their signatures append to the store
    *     as ONE O(delta) versioned commit.
    *
    * Equivalence (ScalaTested): with a common `maxBucket`, the pair
    * set equals `Dedup.minhashLsh(corpus ∪ delta)` restricted to
    * pairs with at least one delta side.
    */
  def dedupeDelta(
      spark: SparkSession,
      delta: DataFrame,
      root: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 1000,
      maxBroadcastPairs: Long = 1000000L,
      append: Boolean = true): DeltaDedup = {
    val p = storeParams(spark, root).getOrElse(throw new IllegalStateException(
      s"no $ParamsFile at $root — initStore must create the signature store first"))
    require(bands > 0 && p.numHashes >= bands && p.numHashes % bands == 0,
      s"numHashes (${p.numHashes}) must be a positive multiple of bands ($bands)")
    val rows = p.numHashes / bands

    val corpusSigs = VersionedTable.read(spark, root) // (id, sig) — no text
    val deltaSigs = Dedup.minhashSignatures(
        delta, idCol, textCol, p.numHashes, p.shingleK, p.seed)
      .persist(StorageLevel.MEMORY_AND_DISK)

    def banded(sigs: DataFrame): DataFrame = sigs
      .select(col("id"), explode(Dedup.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))

    // Per-key delta members; bounded like the batch generator.
    val deltaBuckets = banded(deltaSigs)
      .groupBy(col("band"), col("key"))
      .agg(graft.functions.VectorFunctions.boundedCollectList(col("id"), maxBucket).as("d_ids"))

    // ONE corpus-sig scan: band keys are a projection, the join
    // broadcasts the delta's keys, so only collisions come back.
    val collisions = banded(corpusSigs)
      .join(broadcast(deltaBuckets.select(col("band"), col("key"))), Seq("band", "key"))
      .groupBy(col("band"), col("key"))
      .agg(graft.functions.VectorFunctions.boundedCollectList(col("id"), maxBucket).as("c_ids"))

    val buckets = deltaBuckets
      .join(collisions, Seq("band", "key"), "left")
      .withColumn("c_ids", coalesce(col("c_ids"), typedLit(Array.empty[Long])))
      // Joint guard — both collects kept maxBucket+1, so the sum test
      // detects every bucket whose TRUE joint size exceeds the cap.
      .where(size(col("d_ids")) + size(col("c_ids")) <= maxBucket)

    val cross = buckets
      .select(explode(col("d_ids")).as("did"), col("c_ids"))
      .select(col("did"), explode(col("c_ids")).as("cid"))
      .select(least(col("did"), col("cid")).as("id_a"),
        greatest(col("did"), col("cid")).as("id_b"),
        col("did").as("delta_id"), lit("corpus").as("src"))
    val internal = buckets
      .where(size(col("d_ids")) >= 2)
      .select(explode(col("d_ids")).as("id_a"), col("d_ids"))
      .select(col("id_a"), explode(col("d_ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("id_b").as("delta_id"), lit("delta").as("src"))

    val pairsRaw = cross.unionByName(internal)
      .dropDuplicates("id_a", "id_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairsRaw.count()

    // Verify: delta-internal pairs resolve both sigs from the (small,
    // persisted) delta table; cross pairs fetch the corpus sig via a
    // broadcast of the pair list against ONE more corpus-sig scan —
    // or a shuffled join past the broadcast budget.
    val crossPairs = pairsRaw.where(col("src") === "corpus")
      .withColumn("corpus_id",
        when(col("id_a") === col("delta_id"), col("id_b")).otherwise(col("id_a")))
    val crossKeyed = if (nPairs <= maxBroadcastPairs) broadcast(crossPairs) else crossPairs
    val crossWithCorpusSig = corpusSigs
      .join(crossKeyed, col("id") === col("corpus_id"))
      .select(col("id_a"), col("id_b"), col("delta_id"), col("src"), col("sig").as("sig_c"))
    val dsA = deltaSigs.select(col("id").as("__did"), col("sig").as("sig_d"))
    val crossV = crossWithCorpusSig
      .join(dsA, col("delta_id") === col("__did"))
      .select(col("id_a"), col("id_b"), col("delta_id"), col("src"),
        agreement(col("sig_c"), col("sig_d"), p.numHashes).as("est_jaccard"))
    val internalV = pairsRaw.where(col("src") === "delta")
      .join(deltaSigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(deltaSigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("delta_id"), col("src"),
        agreement(col("sig_a"), col("sig_b"), p.numHashes).as("est_jaccard"))
    val verified = crossV.unionByName(internalV).where(col("est_jaccard") >= threshold)

    val verifiedMat = Dedup.materializeAndRelease(verified, pairsRaw)

    val dropped = verifiedMat.select(col("delta_id").as("__drop")).distinct()
    val survivors = Dedup.materializeAndRelease(
      delta.join(broadcast(dropped), delta(idCol) === dropped("__drop"), "left_anti"))

    val version =
      if (append) {
        val survivorSigs = deltaSigs.join(
          survivors.select(col(idCol).as("__keep")), deltaSigs("id") === col("__keep"), "left_semi")
        VersionedTable.commitDelta(spark, root, "parquet", survivorSigs)
      } else -1L
    deltaSigs.unpersist(false)
    // verifiedMat's checkpoint blocks back the RETURNED pairs frame —
    // they are NOT released here (same contract as minhashLsh's result).

    DeltaDedup(
      verifiedMat.select(col("id_a"), col("id_b"), col("est_jaccard"), col("src")),
      survivors, version)
  }

  private def agreement(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                        numHashes: Int): org.apache.spark.sql.Column =
    round(graft.functions.VectorFunctions.matchCountL(a, b).cast("double") / numHashes, 4)

  // ------------------------------------------------------------------
  // Exact store
  // ------------------------------------------------------------------

  /** Create (or overwrite) the exact-dedup store: one
    * `(fingerprint, keeper_id)` row per distinct normalized-text
    * fingerprint in `docs`, keeper = lowest id.
    */
  def initExactStore(
      spark: SparkSession,
      docs: DataFrame,
      root: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Long = {
    val fp = docs
      .groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"))
    VersionedTable.commit(spark, root, "parquet", _ => fp)
  }

  /** `survivors` = delta rows admitted (fingerprint unseen in the
    * store AND lowest delta id for that fingerprint); `version` is the
    * store version their fingerprints were appended as (-1 when
    * `append` was false).
    */
  final case class ExactDelta(survivors: DataFrame, version: Long)

  /** Exact-dedup a delta batch against the store. The delta side is
    * one fingerprint projection + one small aggregate; the corpus
    * contributes a single scan of the store's thin
    * (fingerprint, keeper_id) table for the anti join — never the
    * corpus text. New fingerprints append as ONE O(delta) commit, so
    * `changesSince` answers "which documents did batch N admit".
    */
  def exactDelta(
      spark: SparkSession,
      delta: DataFrame,
      root: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      append: Boolean = true): ExactDelta = {
    val keep = delta
      .groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"))
    val store = VersionedTable.read(spark, root).select(col("fingerprint"))
    val fresh = Dedup.materializeAndRelease(
      keep.join(store, Seq("fingerprint"), "left_anti"))
    val version =
      if (append) VersionedTable.commitDelta(spark, root, "parquet", fresh)
      else -1L
    ExactDelta(fresh, version)
  }
}
