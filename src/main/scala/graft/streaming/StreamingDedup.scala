package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the unbounded analogue of the
  * batch `Dedup.minhashLsh` chain (reference drune has no streaming
  * story; the batch semantics are q30's).
  *
  * Shape: the MinHash signature is the same one-pass codegen'd
  * projection the batch path uses (graftbridge.MinHashSig), band keys
  * explode to `bands` rows per document, and candidate generation is a
  * `flatMapGroupsWithState` keyed on `(band, band_key)` — each state
  * bucket holds the recent members of one LSH bucket, so an arriving
  * document compares ONLY against its bucket (O(bucket), never O(n))
  * and emits a pair when the signature-agreement estimate clears the
  * threshold.
  *
  * State is bounded three ways, which is what lets this run forever:
  *  - watermark eviction: members older than the event-time watermark
  *    are dropped from every bucket the next time it is touched;
  *  - event-time timeout: an idle bucket's whole state is removed once
  *    the watermark passes its newest member (+ the watermark delay) —
  *    touched-or-not, nothing lingers;
  *  - `maxBucket` cap: a degenerate hot bucket (the empty document, a
  *    boilerplate template) keeps only the newest `maxBucket` members —
  *    the same skew guard as the batch path's bucket cap.
  *
  * A pair that collides in several bands is emitted once per colliding
  * band (cross-band state is deliberately not shared — it would need a
  * global key). Collapse downstream per micro-batch (foreachBatch
  * `dropDuplicates("id_a","id_b")` before the sink) — the duplication
  * factor is bounded by `bands`, the output stream is ids+estimate
  * only.
  *
  * State sizing: each live document stores its full signature
  * (numHashes × 8 B) in each of its `bands` buckets — ≈ bands ×
  * numHashes × 8 B per doc within the watermark horizon (16 KiB at
  * the 16×128 defaults). The full signature is what lets the bucket
  * verify the estimate WITHOUT a second stateful stage or an external
  * store; shrink `numHashes` (wider error band) or the watermark
  * horizon to trade memory, and keep RocksDB state store backing for
  * horizons beyond executor memory.
  */
object StreamingDedup {

  // `ts` stays the watermarked TIMESTAMP column end-to-end — renaming or
  // casting it before the stateful operator drops the watermark tag and
  // Spark rejects the event-time timeout.
  final case class BandedDoc(band: Int, key: Long, doc_id: Long, sig: Array[Long], ts: java.sql.Timestamp)
  final case class NearDupPair(id_a: Long, id_b: Long, est: Double, band: Int)
  final case class BucketMember(id: Long, sig: Array[Long], tsMs: Long)
  final case class BucketState(members: List[BucketMember])

  /** Fraction of agreeing MinHash positions — the streaming-state twin
    * of the codegen'd LongArrayMatchCount kernel (plain Scala here: the
    * comparison runs inside the state function, not in a plan).
    */
  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var m = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
    if (n == 0) 0.0 else m.toDouble / n
  }

  /** Near-dup pairs over a document stream `(doc_id, ts, text)`.
    * Output: `(id_a, id_b, est, band)` in append mode, id_a < id_b.
    */
  def nearDupPairs(docs: DataFrame,
                   numHashes: Int = 128,
                   bands: Int = 16,
                   threshold: Double = 0.8,
                   shingleK: Int = 5,
                   seed: Long = 42L,
                   watermark: String = "1 hour",
                   maxBucket: Int = 1000): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = numHashes / bands
    require(numHashes % bands == 0, s"numHashes ($numHashes) must divide into bands ($bands)")
    val wmMs = watermarkMs(watermark)
    // A zero-delay watermark ("0 seconds") would make the timeout below
    // equal the current watermark, which Spark rejects inside the state
    // function (timeout must be strictly beyond the watermark).
    require(wmMs > 0, s"watermark delay must be positive, got '$watermark'")

    val banded = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        graft.functions.VectorFunctions.minhashSig(
          graft.operators.TextAnalysis.normalize(col("text")), numHashes, shingleK, seed).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(graft.operators.Dedup.bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandedDoc]

    banded
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), ds, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val horizon = state.getCurrentWatermarkMs()
            var members = state.getOption.map(_.members).getOrElse(Nil)
              .filter(_.tsMs >= horizon)
            val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
            ds.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              members.foreach { m =>
                if (m.id != d.doc_id) {
                  val est = estJaccard(d.sig, m.sig)
                  if (est >= threshold)
                    out += NearDupPair(math.min(m.id, d.doc_id), math.max(m.id, d.doc_id), est, band)
                }
              }
              if (!members.exists(_.id == d.doc_id))
                members = (BucketMember(d.doc_id, d.sig, d.ts.getTime) :: members).take(maxBucket)
            }
            if (members.isEmpty) state.remove()
            else {
              state.update(BucketState(members))
              // Whole-bucket eviction once the watermark passes the
              // newest member plus the watermark delay — idle buckets
              // cost nothing after one horizon.
              state.setTimeoutTimestamp(members.map(_.tsMs).max + wmMs)
            }
            out.iterator
          }
      }
  }

  /** Parse a "N unit(s)" watermark string to millis — the same grammar
    * `withWatermark` accepts (IntervalUtils is what Spark uses for it).
    */
  private def watermarkMs(watermark: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    iv.months * 30L * 86400000L + iv.days * 86400000L + iv.microseconds / 1000L
  }
}
