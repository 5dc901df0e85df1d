package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming equivalents of the batch operators — the same
  * `events(event_id, ts, user_id, event_type, value)` schema consumed
  * as an unbounded stream (`readStream` file source, MemoryStream in
  * tests).
  *
  * All operators are watermark-bounded so state is evictable — the
  * difference between a stream job that runs forever at 100 TB/day and
  * one whose state store grows without bound.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Watermark bounds both
    * late data and state retention.
    */
  def tumblingStats(events: DataFrame, windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Exactly-once-style dedup on event_id within the watermark horizon
    * (drune has no streaming story; this is the streaming face of
    * Dedup.exact).
    */
  def dedupByKey(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Trending values per tumbling window — the space-saving sketch
    * (graftbridge.SpaceSavingTopK, q60's aggregate) as a STREAMING
    * aggregate: per-window state stays O(capacity) counters no matter
    * how many distinct values stream through, where an exact
    * `groupBy(window, value).count()` would hold one state row per
    * distinct value per window. Watermark bounds window state as
    * usual; the sketch bounds the per-window width.
    */
  def windowedTopK(events: DataFrame,
                   valueCol: String = "event_type",
                   windowLen: String = "1 hour",
                   watermark: String = "2 hours",
                   capacity: Int = 64): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(graft.functions.VectorFunctions.spaceSavingTopK(col(valueCol), capacity).as("sketch"))
      .select(col("w.start").as("window_start"), explode(col("sketch")).as("e"))
      .select(col("window_start"), col("e.item").as("item"),
        col("e.cnt").as("cnt"), col("e.err").as("err"))

  /** Distinct users per tumbling window as an HLL SKETCH streaming
    * aggregate — the streaming face of the matview `ndv` fold: state
    * per window is ONE mergeable sketch (~KBs at lgK 12, ±1.6% se)
    * however many distinct users stream through, where the exact
    * `approx_count_distinct` alternative is also sketch-backed but
    * `countDistinct` itself is unsupported in streaming and an exact
    * dropDuplicates+count holds one state row per user per window.
    * Watermark bounds window state as usual.
    */
  def windowedDistinct(events: DataFrame,
                       valueCol: String = "user_id",
                       windowLen: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg($valueCol))").as("ndv"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("ndv"), col("n_events"))

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  /** `session_seq` counts sessions WITHIN one state lifetime — after an
    * event-time timeout evicts an idle user's state the counter
    * restarts, so it is not unique across long gaps. `session_start_sec`
    * (epoch seconds of the session's first event) is the STABLE session
    * key: `(user_id, session_start_sec)` identifies a session across
    * evictions, and is what downstream aggregation should group on.
    * (The batch equivalent `Relational.sessionize` sees all history at
    * once and its seq never restarts — keying on the start time makes
    * both outputs join-compatible.)
    */
  final case class SessionAssignment(user_id: Long, event_id: Long, session_seq: Int, session_start_sec: Long)
  final case class SessionState(seq: Int, lastSec: Long, startSec: Long)

  /** Streaming corpus intake — the curation gate as a stream: quality
    * (token bounds) + language allow-list are one codegen'd projection
    * on the unbounded document stream; exact-duplicate drop keys on
    * the normalized-text fingerprint with watermark-bounded state
    * (dropDuplicatesWithinWatermark), so a re-crawled page arriving
    * within the horizon is dropped and state stays evictable.
    */
  def curateDocs(docs: DataFrame, minTokens: Long = 20,
                 langs: Seq[String] = graft.operators.Curation.defaultLangs,
                 watermark: String = "1 hour"): DataFrame = {
    val ta = graft.operators.TextAnalysis
    docs
      .withColumn("n_tokens", ta.tokenCount(col("text")).cast("long"))
      .withColumn("lang_pred", ta.langId(col("text")))
      .where(col("n_tokens") >= minTokens && col("lang_pred").isin(langs: _*))
      .withColumn("fp", ta.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Stream-static enrichment: join the unbounded stream to a bounded
    * dimension, dimension broadcast — each micro-batch is enriched
    * map-side, no stream-side shuffle and no streaming state. The
    * static side is re-resolved per micro-batch, so a dim refresh (new
    * parquet files) is picked up without restarting the query.
    */
  def enrich(stream: DataFrame, dim: DataFrame, on: Seq[String], how: String = "left"): DataFrame =
    stream.join(broadcast(dim), on, how)

  /** Streaming merge sink: every micro-batch UPSERTS into the target
    * path through the batch Writer (hash_key semantics identical to the
    * batch MergeUpsert mode) — the streaming face of drune's merge
    * write. foreachBatch is the documented pattern for sinks Spark has
    * no native streaming writer for; exactly-once comes from the
    * checkpoint + idempotent merge (re-running a batch re-upserts the
    * same keys).
    */
  /** EXACTLY-ONCE streaming append into a native-protocol Delta table
    * ([[graft.sources.DeltaWrite]]): each micro-batch commits with a
    * `txn` (SetTransaction) action carrying `(appId, batchId)`, so a
    * batch replayed from the streaming checkpoint after a crash finds
    * its own mark in the log and is dropped instead of duplicated —
    * the same handshake delta-spark's streaming sink uses
    * (`txnAppId`/`txnVersion`). The appId defaults to a fingerprint of
    * the CHECKPOINT DIRECTORY: it must be stable across restarts (the
    * checkpoint directory is the stream's identity) and distinct
    * between two different streams appending to the same table.
    *
    * Scale: each batch is one distributed parquet job + one O(batch
    * files) log commit; auto-checkpointing folds the log every
    * [[graft.sources.DeltaWrite.CheckpointInterval]] commits so a
    * long-running stream never makes readers replay an unbounded log.
    */
  def deltaAppendSink(stream: DataFrame, path: String, checkpointDir: String,
                      partitionBy: Seq[String] = Nil,
                      appId: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val app = appId.getOrElse(
      "graft-stream-" + java.security.MessageDigest.getInstance("MD5")
        .digest(checkpointDir.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(16))
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.DeltaWrite.appendStream(batch.sparkSession, batch, path,
          app, batchId, partitionBy)
        ()
      }
      .start()
  }

  def upsertSink(stream: DataFrame, path: String, checkpointDir: String,
                 format: String = "parquet",
                 versioned: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // versioned=true commits each micro-batch through the manifest
        // CAS: concurrent batch writers to the same table serialize,
        // and downstream readers always see a complete snapshot
        // instead of a mid-rewrite swap window
        graft.pipeline.Writer.write(batch.sparkSession, batch,
          graft.pipeline.SinkSpec(path, format, graft.pipeline.MergeUpsert,
            versioned = versioned))
      }
      .start()

  /** Streaming ingestion with an EXACTLY-ONCE incrementally-maintained
    * rollup: each micro-batch (1) appends to the versioned source table
    * as one O(delta) manifest commit TAGGED with the batch id, and (2)
    * advances the MaterializedAgg rollup by folding exactly that delta.
    *
    * Exactly-once on BOTH sides, including crash replay:
    *  - a replayed batch finds its tag already in the source manifest
    *    (VersionedTable.taggedVersion) and skips the append — the tag
    *    travels INSIDE the atomically-CAS'd pointer, so there is no
    *    window where the rows landed but the tag didn't;
    *  - the refresh is idempotent by construction (the watermark rides
    *    in the rollup commit), so re-running it after a crash between
    *    append and refresh simply folds the not-yet-folded delta.
    *
    * The streaming face of the lakehouse ingest loop: raw rows land
    * append-only, the rollup stays fresh at O(delta + |rollup|) per
    * batch, and history is never rescanned.
    */
  def rollupSink(stream: DataFrame, srcRoot: String, aggRoot: String,
                 checkpointDir: String, groupBy: Seq[String],
                 aggs: Seq[graft.pipeline.MaterializedAgg.MAgg],
                 format: String = "parquet"): org.apache.spark.sql.streaming.StreamingQuery = {
    // Bound the legacy-tag window to the FIRST batch of this run: the
    // only batch a resumed pre-SHA-256 stream can replay is its last
    // committed one, which is the first this closure sees. Consulting
    // the 32-bit legacy namespace for every future batch would
    // reinstate exactly the collision skip-append (data loss) the
    // SHA-256 switch removed.
    val firstBatchOfRun = new java.util.concurrent.atomic.AtomicBoolean(true)
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the tag namespaces by checkpoint: two independent streams
        // appending to the same table must not mistake each other's
        // batch 0 for their own replay. Collision-resistant digest, not
        // String.hashCode — a 32-bit collision between two checkpoint
        // paths would silently skip an append (data loss).
        val ns = java.security.MessageDigest.getInstance("SHA-256")
          .digest(checkpointDir.getBytes("UTF-8"))
          .take(12).map("%02x".format(_)).mkString
        // streams checkpointed before the SHA-256 switch tagged with
        // String.hashCode — a resumed stream must still recognize its
        // last batch's old-prefix tag or it appends that batch twice
        val legacy =
          if (firstBatchOfRun.getAndSet(false))
            Some(s"stream-${Integer.toHexString(checkpointDir.hashCode)}")
          else None
        rollupBatch(batch, batchId, srcRoot, aggRoot, groupBy, aggs, format,
          tagPrefix = s"stream-$ns", legacyTagPrefix = legacy)
      }
      .start()
  }

  /** One micro-batch of [[rollupSink]] — separated so the replay
    * contract is directly testable.
    */
  private[streaming] def rollupBatch(batch: DataFrame, batchId: Long,
                                     srcRoot: String, aggRoot: String,
                                     groupBy: Seq[String],
                                     aggs: Seq[graft.pipeline.MaterializedAgg.MAgg],
                                     format: String = "parquet",
                                     tagPrefix: String = "stream",
                                     legacyTagPrefix: Option[String] = None): Unit = {
    import graft.pipeline.{MaterializedAgg, VersionedTable}
    val spark = batch.sparkSession
    val tag = s"$tagPrefix-batch-$batchId"
    val replayed = VersionedTable.taggedVersion(spark, srcRoot, tag).nonEmpty ||
      legacyTagPrefix.exists(p =>
        VersionedTable.taggedVersion(spark, srcRoot, s"$p-batch-$batchId").nonEmpty)
    if (!replayed)
      VersionedTable.commitDelta(spark, srcRoot, format, batch, tag = Some(tag))
    MaterializedAgg.refresh(spark, srcRoot, aggRoot, groupBy, aggs,
      srcFormat = format, aggFormat = format)
  }

  /** Cross-run exact dedup against a durable fingerprint store — the
    * piece `curateDocs`' watermark-bounded dedup cannot cover: a page
    * re-crawled MONTHS later is outside any affordable watermark
    * horizon, so its fingerprint must live in storage, not in stream
    * state. Each micro-batch (1) drops rows whose fingerprint already
    * exists in the store via a LEFT ANTI join (fingerprints are 8-byte
    * ids — at scale the store is a bucketed table and the anti-join is
    * exchange-free), (2) dedups within the batch keeping the smallest
    * id, and (3) appends the survivors' fingerprints. A replayed batch
    * whose previous run COMPLETED is a no-op (its fingerprints are in
    * the store). The out-append runs before the store-append, so a
    * crash between the two can duplicate that batch's docs on replay —
    * the no-data-loss side of a trade plain parquet cannot avoid with
    * two sinks; on a lakehouse both appends share one transaction.
    */
  def dedupAgainstStore(docs: DataFrame, storePath: String, outPath: String,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val ta = graft.operators.TextAnalysis
    docs.withColumn("fp", ta.fingerprint(col("text")))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val known: DataFrame =
          if (fs.exists(store)) spark.read.parquet(storePath)
          else spark.range(0).select(col("id").as("fp"))
        val fresh = batch
          .join(known.select(col("fp")), Seq("fp"), "left_anti")
          .groupBy(col("fp"))
          .agg(min_by(struct(batch.columns.map(col): _*), col("doc_id")).as("__r"))
          .select(col("__r.*"))
          .localCheckpoint(true) // the store append must not re-read what the out append wrote
        fresh.drop("fp").write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outPath)
        fresh.select(col("fp")).write.mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
        graft.operators.Dedup.releaseCheckpoint(fresh)
      }
      .start()
  }

  /** Stream-stream interval join — funnel detection: for each
    * `firstType` event, the same user's `thenType` events within
    * `within` afterwards. Both sides carry watermarks and the join
    * condition bounds BOTH event-time columns, so Spark derives a state
    * eviction horizon for each side — the stream-stream join state is
    * watermark-bounded, not unbounded (the difference between a funnel
    * query that runs forever and one that OOMs its state store).
    * Append-mode inner join: a row emits as soon as both sides arrive.
    */
  def followedWithin(events: DataFrame, firstType: String, thenType: String,
                     within: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val first = events.where(col("event_type") === firstType)
      .select(col("user_id"), col("event_id").as("first_id"), col("ts").as("first_ts"))
      .withWatermark("first_ts", watermark)
    val follow = events.where(col("event_type") === thenType)
      .select(col("user_id").as("__u"), col("event_id").as("then_id"), col("ts").as("then_ts"))
      .withWatermark("then_ts", watermark)
    first.join(follow,
        col("user_id") === col("__u") &&
          // identity guard: with firstType == thenType every event
          // would otherwise pair with itself (then_ts == first_ts)
          col("first_id") =!= col("then_id") &&
          col("then_ts") >= col("first_ts") &&
          col("then_ts") <= col("first_ts") + expr(s"INTERVAL $within"))
      .drop("__u")
  }

  /** Stateful sessionization via flatMapGroupsWithState: per-user
    * session counter that increments when the gap exceeds `gapSeconds`.
    * EventTimeTimeout bound to the watermark evicts idle users' state —
    * a ProcessingTimeTimeout here would schedule micro-batches
    * continuously (and unbounded state would OOM a long-running job).
    * Batch equivalent: operators.Relational.sessionize.
    */
  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800,
                 watermark: String = "2 hours"): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAssignment](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(SessionState(0, Long.MinValue, Long.MinValue))
            val out = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
              val sec = e.ts.getTime / 1000
              st = if (st.lastSec == Long.MinValue || sec - st.lastSec > gapSeconds)
                SessionState(st.seq + 1, sec, sec)
              else SessionState(st.seq, sec, st.startSec)
              SessionAssignment(user, e.event_id, st.seq, st.startSec)
            }
            state.update(st)
            // Evict once the watermark passes the session-close horizon.
            state.setTimeoutTimestamp(st.lastSec * 1000 + gapSeconds * 2 * 1000)
            out.iterator
          }
      }
  }
}
