package graft.streaming

import graft.pipeline.VersionedTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.StreamingShims
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Manifest-gated Structured-Streaming source over versioned tables:
  * offsets ARE committed manifest versions, and each micro-batch is
  * exactly the rows APPENDED in the offset span `(start, end]`.
  *
  * This replaces the earlier `data-delta-*` file-glob source, whose
  * reads were "read uncommitted" by one publish latency (delta files
  * become visible slightly before the manifest CAS) and which could
  * stream orphan rows from a committer that crashed between write and
  * publish. Here every read is driven by the manifest:
  *
  *  - `getOffset` is the manifest HEAD version — a delta directory
  *    with no committed pointer DOES NOT EXIST as far as the stream is
  *    concerned, so crashed-committer orphans never stream and a batch
  *    never observes a half-published commit.
  *  - `getBatch(start, end)` walks the commit kinds in the span:
  *    `append` contributes its delta dir, `fold` (commitDelta's
  *    bounded auto-compaction) contributes the delta dir its marker
  *    recorded, maintenance `compact` contributes NOTHING (pure
  *    repackaging — its rows already streamed from their original
  *    delta dirs), and a merge/overwrite `rewrite` fails the stream
  *    with instructions (plain parquet has no row-level diff; stream
  *    append-only tables).
  *  - restart recovery is the engine's own offset log: the checkpoint
  *    stores the last committed version, and the resumed stream asks
  *    for `(thatVersion, HEAD]` — exactly [[VersionedTable.changesBetween]]
  *    semantics, so restarts neither skip nor replay rows.
  *
  * The first batch (no start offset) delivers the FULL snapshot as of
  * the first trigger's HEAD version — so a fresh stream over an
  * already-compacted table bootstraps correctly (the old glob source
  * could not, once vacuum swept the folded delta dirs). Opt out with
  * `startingVersion`: `"latest"` streams only commits after source
  * creation; a number N streams commits strictly after version N.
  *
  * Retention contract (same as any incremental reader of these
  * tables): the span's manifests — and fold-recovered delta dirs —
  * must outlive the reader's lag. A stream that falls behind vacuum's
  * retention fails loudly with the vacuumed-version message rather
  * than silently skipping data.
  *
  * Design note: this is a DSv1 `Source` on purpose — `getBatch`
  * returns a DataFrame, so the manifest-driven per-directory
  * `unionByName` load (schema evolution, per-branch partition pruning,
  * format markers) is reused verbatim, instead of re-implementing a
  * parquet reader against DSv2 `PartitionReader` internals. OSS Delta
  * Lake's streaming source makes the same choice for the same reason.
  * Reference behavior matched: drune's reader/streaming surface
  * (reference: src/drune/engines/spark/steps/reader.py — streaming
  * reads of versioned tables).
  */
class VersionedStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned source requires a table root: .load(root) or .option(\"path\", root)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val s = schema.getOrElse {
      val fmt = VersionedTable.resolveFormat(spark, root, parameters.getOrElse("format", ""))
      VersionedTable.currentSnapshot(spark, root).map(_ =>
        VersionedTable.read(spark, root, fmt).schema).getOrElse(
        throw new IllegalArgumentException(
          s"versioned table at $root has no committed version yet — commit first, " +
            "or pass an explicit .schema(...) to start the stream before data exists"))
    }
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val fmt = VersionedTable.resolveFormat(spark, root, parameters.getOrElse("format", ""))
    val declared = sourceSchema(sqlContext, schema, providerName, parameters)._2
    // 0 is the "before any commit" sentinel (versions start at 1): the
    // first batch then reads the full snapshot at its end version
    val initialFrom = parameters.get("startingVersion") match {
      case None => 0L
      case Some("latest") => resolveLatestOnce(spark, metadataPath, root)
      case Some(n) => try n.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"startingVersion must be a version number or 'latest', got '$n'")
      }
    }
    new VersionedTableSource(spark, root, fmt, declared, initialFrom)
  }

  private def resolveLatestOnce(spark: SparkSession, metadataPath: String,
                                root: String): Long =
    VersionedStreamProvider.resolveLatestOnce(spark, metadataPath, root)
}

object VersionedStreamProvider {
  /** 'latest' must resolve ONCE per stream, not once per (re)start: the
    * engine can log an offset for batch 0 and crash before the batch
    * commits, and a restart that re-resolved 'latest' against a table
    * that moved meanwhile would silently skip the span in between. The
    * resolved version is persisted in the source's checkpoint-scoped
    * metadataPath on first creation (the same durability contract
    * delta-spark's DeltaSourceOffset uses) and read back on restart.
    * Shared by the DSv1 source and the DSv2 micro-batch stream — the
    * same file name, so a checkpoint migrated between faces keeps its
    * pinned start.
    */
  private[graft] def resolveLatestOnce(spark: SparkSession, metadataPath: String,
                                       root: String): Long =
    resolveLatestOnceBy(spark, metadataPath,
      () => VersionedTable.currentSnapshot(spark, root).map(_.version).getOrElse(0L))

  /** [[resolveLatestOnce]] with a caller-supplied head resolver — the
    * delta stream source shares the pin-once durability contract (and
    * the file name) with a different notion of "head".
    */
  private[graft] def resolveLatestOnceBy(spark: SparkSession, metadataPath: String,
                                         resolve: () => Long): Long = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-starting-version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.readSmall(fs, p).map(_.trim.toLong).getOrElse {
      val v = resolve()
      fs.mkdirs(p.getParent)
      try {
        val out = fs.create(p, false)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        v
      } catch {
        case e: java.io.IOException =>
          // lost a creation race -> read the winner; a genuine write
          // failure must NOT fall back to per-start re-resolution
          // (that re-opens the skip window this file exists to close)
          VersionedTable.readSmall(fs, p).map(_.trim.toLong).getOrElse(
            throw new IllegalStateException(
              s"cannot persist resolved startingVersion=latest at $p", e))
      }
    }
  }
}

class VersionedTableSource(spark: SparkSession, root: String, format: String,
                           override val schema: StructType,
                           initialFrom: Long) extends Source {

  /** The resolved pre-history bound (testing seam: 'latest' pinning). */
  private[streaming] def startFrom: Long = initialFrom

  private def versionOf(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    // the engine replays checkpointed offsets as SerializedOffset; a
    // LongOffset's json IS the plain number
    case other => other.json.trim.toLong
  }

  /** Conform a batch to the declared stream schema: order columns,
    * null-fill ones a (pre-evolution) delta dir lacks, drop ones added
    * after the stream started — a restarted stream's checkpoint schema
    * must keep working across additive source evolution.
    *
    * The pinned contract is ADDITIVE evolution only (column add/drop).
    * A column present in BOTH schemas with a different type is a
    * non-additive source change: silently casting would coerce values
    * per Spark cast semantics (string↔long, long→int truncation…)
    * instead of surfacing the break — fail the stream like Delta's
    * source does on schema change. (The cast below is therefore only a
    * nullability/metadata normalizer, never a value conversion.)
    */
  private def conform(df: DataFrame): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
    schema.fields.foreach { f =>
      present.get(f.name).foreach { dt =>
        if (!org.apache.spark.sql.graftbridge.ColumnBridge.sameType(dt, f.dataType))
          throw new IllegalStateException(
          s"versioned stream at $root: column '${f.name}' changed type from " +
            s"${f.dataType.simpleString} (checkpointed stream schema) to " +
            s"${dt.simpleString} in the source — non-additive schema evolution " +
            "is not streamable; restart the stream with a fresh checkpoint " +
            "(only column add/drop is supported across restarts)")
      }
    }
    df.select(schema.fields.toSeq.map(f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)
  }

  override def getOffset: Option[OffsetV1] =
    VersionedTable.currentSnapshot(spark, root).map(s => LongOffset(s.version))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val to = versionOf(end)
    val from = start.map(versionOf).getOrElse(initialFrom)
    val batch =
      if (from == 0L) VersionedTable.readVersion(spark, root, to, format)
      else if (from >= to) emptyBatch(to)
      else VersionedTable.appendedDirsBetween(spark, root, from, to) match {
        case Some(dirs) if dirs.nonEmpty =>
          VersionedTable.loadDirs(spark, root, format, dirs)
        case Some(_) => emptyBatch(to) // compact-only span: no new rows
        case None => throw new UnsupportedOperationException(
          s"versioned table at $root has a merge/overwrite commit in the offset " +
            s"span ($from, $to] — rewrites are not streamable row-wise on plain " +
            "parquet. Stream append-only tables, or consume rewrites as batch " +
            "snapshots via diffVersions.")
      }
    StreamingShims.asMicroBatch(conform(batch))
  }

  private def emptyBatch(to: Long): DataFrame =
    VersionedTable.readVersion(spark, root, to, format).limit(0)

  override def stop(): Unit = ()

  override def toString: String = s"VersionedTableSource[$root]"
}
