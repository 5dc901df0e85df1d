package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, PartitionDirectory, PartitionSpec}

/** [[ManifestFileIndex]] + log-resident DATA SKIPPING for the V1 scan
  * path: `listFiles` receives the query's data filters, reduces them
  * to per-column intervals ([[graft.sources.GraftStatSkipping]] — the
  * same machinery the DSv2 sidecar route uses) and drops every file
  * whose caller-supplied min/max stats cannot match. Built for
  * [[graft.sources.DeltaRead]], whose per-file stats live in the
  * transaction log (`add.stats`) rather than in sidecars: a selective
  * filter over a clustered Delta table then opens only the
  * intersecting files — delta-spark's data-skipping semantics, zero
  * extra I/O (the stats arrived with the log read that planned the
  * scan).
  *
  * `statsFor` maps an ABSOLUTE file path to its stats; None (or a
  * column absent from the stats) keeps the file — skipping is an
  * optimization, never a correctness dependency. Filters that don't
  * reduce to intervals (IsNull, StartsWith, OR trees, ...) keep
  * everything they touch; partition pruning is the inherited native
  * behavior and runs first.
  */
class StatsManifestFileIndex(
    spark: SparkSession,
    spec: PartitionSpec,
    files: Seq[(String, Long)],
    statsFor: String => Option[graft.pipeline.FileStats.FileStat])
  extends ManifestFileIndex(spark, spec, files) {

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) return base
    val translated = dataFilters.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
    val ivs = graft.sources.GraftStatSkipping.intervals(translated)
      .filter { case (_, (lo, hi)) => lo.isDefined || hi.isDefined }
    if (ivs.isEmpty) return base
    base.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        statsFor(f.getPath.toString)
          .forall(st => graft.sources.GraftStatSkipping.fileSurvives(ivs, st))
      })
    }
  }
}
