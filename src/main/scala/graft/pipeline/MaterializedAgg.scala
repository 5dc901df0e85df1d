package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollups over versioned tables — the
  * materialized-view half of the lakehouse story: a `groupBy` aggregate
  * of a 100 TB append-only fact table stays fresh by folding in ONLY
  * the rows committed since the last refresh, never rescanning history.
  *
  * Design:
  *  - The rollup itself is a versioned table (same CAS commit protocol,
  *    time travel, vacuum). Every refresh commits the FULL merged
  *    rollup — it is bounded by group cardinality, orders of magnitude
  *    smaller than the fact — stamped with a `__src_version` column
  *    recording exactly which source version it reflects.
  *  - The watermark therefore travels ATOMICALLY with the data: a crash
  *    between "read delta" and "commit" leaves the previous rollup +
  *    previous watermark intact, and the retry reprocesses the same
  *    delta. No side-channel state file, no double counting.
  *  - Only decomposable aggregates are supported (count / sum / min /
  *    max — avg derives as sum/count at read time): their partials over
  *    the delta merge with the stored rollup by a small outer join, so
  *    refresh cost is O(delta + |rollup|), independent of fact history.
  *
  * Reference scope: drune materializes gold tables by full recompute
  * per run (spark_engine.py:232-255 executes the SQL chain over the
  * whole dependency); this replaces the recompute with delta
  * maintenance once the dependency is a versioned append table.
  */
object MaterializedAgg {

  /** A decomposable aggregate: `name` is the output column, `expr` a
    * SQL expression over the source rows, `kind` ∈ count | sum | min |
    * max. For `count`, `expr` is ignored (row count).
    */
  final case class MAgg(name: String, expr: String, kind: String) {
    require(Set("count", "sum", "min", "max")(kind),
      s"unsupported aggregate kind '$kind' — decomposable kinds: count, sum, min, max")
  }

  private val SrcVersionCol = "__src_version"

  /** The current rollup (without the watermark column). */
  def read(spark: SparkSession, aggRoot: String, format: String = "parquet"): DataFrame =
    VersionedTable.read(spark, aggRoot, format).drop(SrcVersionCol)

  /** The source version the stored rollup reflects, if any. */
  def watermark(spark: SparkSession, aggRoot: String, format: String = "parquet"): Option[Long] =
    VersionedTable.currentSnapshot(spark, aggRoot)
      .flatMap(s => watermarkOf(spark, aggRoot, s.version, format))

  private def watermarkOf(spark: SparkSession, aggRoot: String, aggVersion: Long,
                          format: String): Option[Long] = {
    val r = VersionedTable.readVersion(spark, aggRoot, aggVersion, format)
      .select(max(col(SrcVersionCol))).head()
    // an empty-but-committed rollup (empty source at first refresh)
    // has no rows to carry the watermark — treat as never refreshed;
    // the recompute over the still-empty source is the correct fold
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  private def partial(df: DataFrame, groupBy: Seq[String], aggs: Seq[MAgg]): DataFrame =
    df.groupBy(groupBy.map(col): _*).agg(
      aggs.head.toColumn, aggs.tail.map(_.toColumn): _*)

  private implicit class MAggOps(private val a: MAgg) extends AnyVal {
    def toColumn: Column = (a.kind match {
      case "count" => count(lit(1))
      case "sum"   => sum(expr(a.expr))
      case "min"   => min(expr(a.expr))
      case "max"   => max(expr(a.expr))
    }).as(a.name)
    /** Merge a stored value with a delta partial (null-safe: a group
      * absent from one side contributes only the other side).
      */
    def merge(stored: Column, delta: Column): Column = a.kind match {
      case "count" | "sum" =>
        when(stored.isNull, delta).when(delta.isNull, stored).otherwise(stored + delta)
      case "min" => least(stored, delta)    // least/greatest skip nulls
      case "max" => greatest(stored, delta)
    }
  }

  /** Fold everything the source committed since the stored watermark
    * into the rollup and commit the result as the rollup's next
    * version. Returns the source version the rollup now reflects.
    * No-op (no new commit) when already caught up.
    *
    * First refresh (no rollup yet) aggregates the full source snapshot
    * — the one unavoidable full pass, the same one that builds any
    * index. Later refreshes read ONLY the dirs the manifest proves
    * were appended in the span (fold markers let the read set survive
    * commitDelta's bounded auto-compaction; maintenance compactions
    * contribute nothing). A genuine rewrite (merge/overwrite) in the
    * span makes delta maintenance unsound and is refused with a
    * rebuild instruction; a fold dir already swept by vacuum means the
    * rollup outlived the retention window — same remedy.
    *
    * Concurrency: the watermark and the stored rollup are read from
    * ONE pinned rollup version, and the commit carries that version as
    * its CAS expectation — two racing refreshes serialize, the loser
    * re-reads and retries, and the delta can never fold twice.
    */
  def refresh(spark: SparkSession, srcRoot: String, aggRoot: String,
              groupBy: Seq[String], aggs: Seq[MAgg],
              srcFormat: String = "parquet", aggFormat: String = "parquet",
              maxAttempts: Int = 5): Long = {
    require(groupBy.nonEmpty, "refresh needs at least one group column")
    require(aggs.nonEmpty, "refresh needs at least one aggregate")
    var attempt = 0
    while (true) {
      attempt += 1
      try return refreshOnce(spark, srcRoot, aggRoot, groupBy, aggs, srcFormat, aggFormat)
      catch {
        case e: VersionedTable.VersionConflictException =>
          if (attempt >= maxAttempts) throw e // pathological contention
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def refreshOnce(spark: SparkSession, srcRoot: String, aggRoot: String,
                          groupBy: Seq[String], aggs: Seq[MAgg],
                          srcFormat: String, aggFormat: String): Long = {
    val srcHead = VersionedTable.currentSnapshot(spark, srcRoot)
      .getOrElse(throw new IllegalArgumentException(
        s"source at $srcRoot has no committed version")).version
    // Pin ONE rollup version: watermark and stored contents must come
    // from the same snapshot, and the commit below expects exactly it.
    val aggSnap = VersionedTable.currentSnapshot(spark, aggRoot)
    aggSnap.flatMap(s => watermarkOf(spark, aggRoot, s.version, aggFormat)) match {
      case Some(w) if w == srcHead => w // caught up — nothing to commit
      case Some(w) =>
        val deltaDirs = VersionedTable.appendedDirsBetween(spark, srcRoot, w, srcHead)
          .getOrElse(throw new IllegalArgumentException(
            s"source history at $srcRoot between v$w and v$srcHead contains a " +
              "rewrite (merge/overwrite) — delta maintenance is unsound; " +
              "rebuild the rollup from scratch (drop the agg table and refresh)"))
        // same pre-check diffVersions performs: a fold delta dir already
        // swept by vacuum must surface as the rebuild instruction, not a
        // raw path-not-found out of the Spark load below. The check is
        // check-then-act (a vacuum racing this refresh can sweep a dir
        // between exists() and the load), so the load below ALSO maps
        // its path-not-found to the same instruction — the friendly
        // error is guaranteed, not best-effort.
        def sweptError(dirs: Seq[String], cause: Throwable = null) =
          new IllegalArgumentException(
            s"source history at $srcRoot between v$w and v$srcHead references " +
              s"vacuumed delta dir(s) ${dirs.mkString(", ")} — the delta span is " +
              "no longer readable; rebuild the rollup from scratch (drop the agg " +
              "table and refresh)", cause)
        val swept = VersionedTable.missingDirs(spark, srcRoot, deltaDirs)
        if (swept.nonEmpty) throw sweptError(swept)
        val stored = VersionedTable.readVersion(spark, aggRoot, aggSnap.get.version, aggFormat)
          .drop(SrcVersionCol)
        val merged =
          if (deltaDirs.isEmpty) stored // compact-only span: rows unchanged
          else {
            val delta =
              try VersionedTable.loadDirs(spark, srcRoot, srcFormat, deltaDirs)
              catch {
                case e: org.apache.spark.sql.AnalysisException
                    if Option(e.getErrorClass).exists(_.contains("PATH_NOT_FOUND")) ||
                      e.getMessage.contains("Path does not exist") =>
                  throw sweptError(
                    VersionedTable.missingDirs(spark, srcRoot, deltaDirs), e)
              }
            val partials = partial(delta, groupBy, aggs)
            // rename the delta side wholesale (shared-lineage ambiguity
            // — same pattern as Relational.snapshotDiff)
            val d = partials.select(partials.columns.map(c => col(c).as(s"__d_$c")): _*)
            val cond = groupBy.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
            stored.join(d, cond, "full_outer")
              .select(groupBy.map(k => coalesce(col(k), col(s"__d_$k")).as(k)) ++
                aggs.map(a => a.merge(col(a.name), col(s"__d_${a.name}")).as(a.name)): _*)
          }
        commit(spark, aggRoot, merged, srcHead, aggFormat, aggSnap.map(_.version))
      case None =>
        val full = partial(VersionedTable.readVersion(spark, srcRoot, srcHead, srcFormat),
          groupBy, aggs)
        commit(spark, aggRoot, full, srcHead, aggFormat, aggSnap.map(_.version))
    }
  }

  private def commit(spark: SparkSession, aggRoot: String, rollup: DataFrame,
                     srcVersion: Long, format: String,
                     expectedAggVersion: Option[Long]): Long = {
    VersionedTable.commit(spark, aggRoot, format,
      _ => rollup.withColumn(SrcVersionCol, lit(srcVersion)),
      expectedVersion = Some(expectedAggVersion.getOrElse(0L)))
    srcVersion
  }
}
