package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Scale contract: nothing here is O(n²). Exact dedup is a hash
  * aggregation; every near-dup variant generates candidates through
  * LSH-style bucketing (minhash bands / simhash / shared rare n-grams)
  * and only verifies within buckets, so candidate volume is
  * O(n · bands · bucket_size), with an explicit bucket-size cap as the
  * skew guard (a degenerate bucket — e.g. the empty document — would
  * otherwise quadratically explode on a 100 TB corpus).
  */
object Dedup {

  /** Exact dedup on normalized text: keep the smallest id per
    * fingerprint. One hash aggregation (map-side partial agg applies);
    * the 8-byte xxhash64 key keeps shuffle volume minimal.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** MinHash signature as `numHashes` permutation minima over the
    * shingle hash set — computed with higher-order functions in one
    * projection (no explode ⇒ no shuffle until the band step).
    * perm_j(h) = (a_j·h + b_j) mod 2^61-1, coefficients from `seed`.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column = {
    val p = 2305843009213693951L // 2^61 - 1 (Mersenne prime)
    val rnd = new scala.util.Random(seed)
    // a ≤ 2^29, masked h < 2^32 ⇒ a·h + b < 2^63: no ANSI long overflow.
    val coeffs = Seq.fill(numHashes)(
      (rnd.nextInt(1 << 29).toLong + 1, math.abs(rnd.nextLong()) % p))
    array(coeffs.map { case (a, b) =>
      array_min(transform(shingles,
        h => pmod(h.bitwiseAND(lit(0xFFFFFFFFL)) * a + b, lit(p))))
    }: _*)
  }

  /** LSH band keys: signature split into `bands` bands of
    * numHashes/bands rows each; a band key is the hash of its slice.
    * Docs sharing any band key are candidates.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array(((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", slice(signature, b * rowsPerBand + 1, rowsPerBand))).as("key"))
    }): _*)

  /** Candidate near-dup pairs via MinHash + LSH banding, verified with
    * signature-estimated Jaccard ≥ `threshold`.
    *
    * Plan shape: projection (shingles→signature→bands) → explode bands
    * → shuffle on (band,key) → self-join within buckets (skew-capped)
    * → distinct pairs → verify on signatures. The only joins are
    * bucket-local; bucket cap `maxBucket` bounds the worst key.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      shingleK: Int = 5,
      maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    // Two projections: shingle hashes are MATERIALIZED once per row,
    // then the 128 permutation minima reference that bound column —
    // inlining the shingle expression into every permutation lambda
    // makes the plan (and per-row work) numHashes× larger.
    val sigs = docs
      .select(col(idCol).as("id"), TextAnalysis.shingleHashes(col(textCol), shingleK).as("sh"))
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))

    // Skew guard: drop degenerate buckets before the self-join.
    val bucketed = banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "key")))
      .where(col("bucket_n") <= maxBucket)

    val l = bucketed.select(col("band"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = bucketed.select(col("band"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = l.join(r, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
          .cast("double") / numHashes, 4))
      .where(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Exact n-gram Jaccard verification for a candidate pair set —
    * used after LSH candidate generation (never on the cross product).
    */
  def jaccardVerify(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      threshold: Double = 0.7): DataFrame = {
    val sh = docs.select(col(idCol).as("jid"), TextAnalysis.shingleHashes(col(textCol), shingleK).as("sh"))
    pairs
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash per document: explode shingle hashes, sum ±1 per bit
    * position, reassemble the sign vector. One explode + one groupBy(id)
    * — a single shuffle keyed by doc id; bit counters are plain longs so
    * the aggregation is codegen'd.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text", shingleK: Int = 5): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(TextAnalysis.shingleHashes(col(textCol), shingleK)).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = exploded.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** Near-dup groups by SimHash: candidates share one of 4 16-bit bands
    * (hamming distance ≤ 3 guarantees a shared band by pigeonhole);
    * verified by popcount of XOR ≤ `maxHamming`.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "key")))
      .where(col("bucket_n") <= maxBucket)
    val l = banded.select(col("band"), col("key"), col("id").as("id_a"), col("simhash").as("h_a"))
    val r = banded.select(col("band"), col("key"), col("id").as("id_b"), col("simhash").as("h_b"))
    l.join(r, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
