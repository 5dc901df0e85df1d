package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as single calls, composed from
  * shuffle-efficient primitives (union + window instead of range joins
  * or per-row subqueries).
  */
object Relational {

  /** Skew-safe equi-join: salt the left (skewed, large) side's key with
    * a deterministic per-row salt in [0, saltFactor) and replicate each
    * right row saltFactor times, then join on (key, salt). A hot key
    * that would land its entire shuffle partition on one reducer is
    * spread over saltFactor reducers; results are identical to the
    * plain join (inner/left semantics). Use when the right side is too
    * big to broadcast and AQE's skew-join split isn't available (e.g.
    * the key feeds a later aggregation that must stay co-partitioned).
    * Cost: right side shuffles saltFactor× its size — keep saltFactor
    * at the skew ratio, not higher.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      saltFactor: Int,
      how: String = "inner"): DataFrame = {
    // The replicated right side is only transparent for joins keyed on
    // the LEFT rows: right/full outer would emit saltFactor copies of
    // every unmatched right row — reject loudly rather than corrupt.
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti")(how.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got '$how'")
    // xxhash64 over the whole left row: deterministic, no rand() (a
    // retried task must re-salt identically or rows are lost/doubled).
    val saltedL = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedL.join(saltedR, on :+ "__salt", how).drop("__salt")
  }

  /** As-of join: for each left row, attach the most recent right row
    * with rightTime ≤ leftTime for the same key.
    *
    * Implementation: tag and union both sides, then one window sorted by
    * (key, time, tag) carries the last-seen right payload forward
    * (`last(ignoreNulls)`), and left rows are filtered back out. ONE
    * shuffle+sort on the key — contrast the naive range join
    * (`l.key = r.key AND r.t <= l.t` + argmax), which Spark executes as
    * a broadcast-nested-loop or an exploding theta-join at scale.
    *
    * Right side must be unique per (key, time) — pre-dedupe if not.
    * `payload` columns are carried from the right side.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1)) // events sort after same-instant right rows (inclusive ≤)
      .withColumn("__payload", lit(null).cast(
        right.select(struct(payload.map(col): _*)).schema.head.dataType))
    val rTagged = right
      .select(col(key), col(rightTime).as("__t"), lit(0).as("__tag"),
        struct(payload.map(col): _*).as("__payload"))
    val unioned = lTagged.select((col(key) +: left.columns.filterNot(_ == key).map(col).toSeq
        :+ col("__t") :+ col("__tag") :+ col("__payload")): _*)
      .unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(w))
    val leftCols = left.columns.map(col).toSeq
    payload.foldLeft(carried.where(col("__tag") === 1)) { (d, p) =>
      d.withColumn(p, col(s"__carry.$p"))
    }.select((leftCols ++ payload.map(col)): _*)
  }

  /** As-of join on the NATIVE physical operator
    * (graftbridge.AsOfJoinPlan/Exec/Strategy): same semantics and
    * contract as [[asOf]], but each side shuffles once on its own key
    * (elidable for pre-clustered inputs, where the union formulation
    * always re-shuffles both sides together), no tag/null-padded union
    * rows, and O(1) state per partition instead of a window frame.
    */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame =
    org.apache.spark.sql.graftbridge.AsOfJoinPlan.of(
      left, right, key, leftTime, rightTime, payload)

  /** Sessionization: a new session starts when the gap to the previous
    * event for the same user exceeds `gapSeconds`. Window lag + running
    * sum — one shuffle+sort per user key.
    */
  def sessionize(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieBreak: String = "event_id",
      gapSeconds: Long = 1800): DataFrame = {
    val order = Seq(col(tsCol), col(tieBreak))
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id", concat_ws("_", col(userCol), col("session_seq")))
      .drop("__prev_ts", "__new_session")
  }

  /** Upsert semantics without IO (drune writer.py _merge_standard read
    * side): source rows win on key; unmatched base rows survive. One
    * anti-join shuffle co-partitioned with the union.
    */
  def upsert(base: DataFrame, source: DataFrame, key: Seq[String]): DataFrame =
    base.join(source.select(key.map(col): _*), key, "left_anti")
      .unionByName(source, allowMissingColumns = true)

  /** Keyed snapshot reconciliation — the CDC companion to the versioned
    * tables: given two snapshots of a keyed table, emit one row per
    * difference, classified `added` (key only in `next`), `removed`
    * (key only in `base`) or `changed` (key in both, at least one
    * compared column differs null-safely), with `changed_cols` naming
    * the differing columns in `compare` order and `old_`/`new_` value
    * pairs for every compared column. Unchanged keys are dropped.
    * Generalizes the reference's whole-row compare_dataframes /
    * show_differences (spark_engine.py:206-230) from a boolean + row
    * dump to a keyed, column-attributed delta.
    *
    * Keys must be unique within each snapshot (primary-key contract, as
    * for [[upsert]]); duplicate keys would cross-product in the join.
    *
    * Scale: ONE sort-merge full-outer shuffle on the key columns; every
    * comparison is a codegen'd null-safe equality in the join's
    * post-projection (no UDFs, no second pass). Bucketed or
    * co-partitioned snapshots (Writer.writeBucketed) make it
    * exchange-free. For versioned tables prefer diffing
    * `changesSince(v)` against the base when only appends happened —
    * this full diff is the general overwrite/merge case.
    */
  def snapshotDiff(
      base: DataFrame,
      next: DataFrame,
      keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val cols = keys ++ compare
    // Rename the next side wholesale: both snapshots typically share
    // lineage (two reads of the same table), and an attribute-identical
    // join condition would be ambiguous-by-id (see q62's note).
    val b = base.select(cols.map(col): _*).withColumn("__b_present", lit(true))
    val n = next.select(cols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__n_present", lit(true))
    val cond = keys.map(k => col(k) <=> col(s"__n_$k")).reduce(_ && _)
    val bP = col("__b_present").isNotNull
    val nP = col("__n_present").isNotNull
    val colChanged = compare.map(c => !(col(c) <=> col(s"__n_$c")))
    val anyChanged = colChanged.reduceOption(_ || _).getOrElse(lit(false))
    val changeType = when(!bP, lit("added"))
      .when(!nP, lit("removed"))
      .when(anyChanged, lit("changed"))
    // concat_ws skips NULL args (both engines), so the unchanged
    // columns' WHEN-without-ELSE nulls vanish from the list.
    val changedCols = when(bP && nP,
      concat_ws(",", compare.zip(colChanged).map { case (c, ch) => when(ch, lit(c)) }: _*))
    b.join(n, cond, "full_outer")
      .where(changeType.isNotNull)
      .select(
        keys.map(k => coalesce(col(k), col(s"__n_$k")).as(k)) ++
          Seq(changeType.as("change_type"), changedCols.as("changed_cols")) ++
          compare.flatMap(c => Seq(col(c).as(s"old_$c"), col(s"__n_$c").as(s"new_$c"))): _*)
  }

  /** Numeric histogram via width_bucket-style bucketing: one
    * aggregation, bucket count fixed ⇒ output bounded regardless of
    * input size.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double, buckets: Int): DataFrame = {
    val v = col(valueCol)
    val bucket = when(v < lo, 0)
      .when(v >= hi, buckets + 1)
      .otherwise(floor((v - lo) / ((hi - lo) / buckets)).cast("int") + 1)
    df.where(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(v), 4).as("min_v"),
        round(max(v), 4).as("max_v"))
  }

  /** Point-in-interval join WITHOUT an equi key — the shape Spark
    * executes as a BroadcastNestedLoopJoin (every point against every
    * interval) if written naively, which is O(n·m) and a non-starter at
    * scale.
    *
    * Bucketize instead: an interval [lo, hi] is exploded to the
    * fixed-width buckets it covers, a point lands in exactly ONE bucket,
    * and the join becomes an equi-join on bucket id followed by the
    * exact range filter. Each (point, interval) match surfaces exactly
    * once (the point's bucket), so no dedup pass is needed. Candidate
    * volume is O(m·(len/width + 1) + n) shuffled rows instead of n·m
    * compared pairs; pick `bucketWidth` near the typical interval length
    * so intervals explode to ~2 buckets.
    *
    * Inner-join semantics; both inputs keep their columns (names must
    * not collide).
    */
  def intervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBuckets: Long = 10000L,
      probeWide: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Span guard, mirroring RangeJoinBucketing: an inverted interval
    // (lo > hi) can match nothing — two-arg sequence() would otherwise
    // generate a DESCENDING bucket range for it — and one wide outlier
    // interval would explode to span+1 rows (or fail on Spark's array
    // limit). Wide intervals take a nested-loop fallback branch instead;
    // each interval lands in exactly one branch (NULL bounds in neither),
    // so the union stays duplicate-free.
    val span = floor(col(hiCol) / bucketWidth).cast("long") -
      floor(col(loCol) / bucketWidth).cast("long")
    val rangeOk = col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    // Probe the (small) interval side before planning the fallback:
    // without the probe the union's nested-loop branch re-scans the
    // ENTIRE points side even when no wide interval exists — AQE's
    // empty-relation propagation hides that locally, but the operator
    // must not depend on it. The probe is an eager action, so probe
    // and execution MUST see the same rows: a non-deterministic or
    // file-churning intervals lineage re-evaluated at execution could
    // grow wide intervals that the probe declared absent, silently
    // dropping their matches. localCheckpoint pins one snapshot for
    // both (intervals is the small side by contract; blocks are
    // released by the ContextCleaner once the plan is unreachable, and
    // unlike Dataset.persist it does not occupy the session
    // CacheManager — the library's no-cache-left-behind invariant).
    // Tradeoff: checkpoint blocks are not fault-tolerant — losing an
    // executor's blocks later (dynamic allocation, spot nodes) fails
    // the downstream action instead of recomputing. Under those
    // conditions, or when even one materialization of the intervals
    // side is too expensive, pass probeWide=false: fully lazy, AQE
    // prunes the empty fallback branch.
    val ivStable = if (probeWide) intervals.localCheckpoint() else intervals
    val iv = ivStable.where(span >= 0 && span <= maxBuckets).withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val bucketed = p.join(iv, Seq("__bucket"))
      .where(rangeOk)
      .drop("__bucket")
    val wide = ivStable.where(span > maxBuckets)
    if (probeWide && wide.isEmpty) bucketed
    else bucketed.unionByName(points.join(wide, rangeOk))
  }

  /** Latest record per key — the read-side of merge/upsert semantics
    * (drune writer.py merge: last write wins). Window row_number, one
    * shuffle. Use max_by-style aggregation when the payload is small.
    */
  def latestByKey(df: DataFrame, key: Seq[String], orderCol: String, tieBreak: Seq[String]): DataFrame = {
    val ord = (col(orderCol).desc +: tieBreak.map(col(_).desc))
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key.map(col): _*).orderBy(ord: _*)))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
