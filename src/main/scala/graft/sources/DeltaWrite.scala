package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.col

/** Native Delta Lake WRITER — the last reference capability graft
  * lacked (drune's merge sinks write through `DeltaTable`, reference:
  * src/drune/engines/spark/steps/writer.py:40-100). The delta-spark
  * connector is not on this build's classpath, so this implements the
  * PUBLIC transaction-log protocol (github.com/delta-io/delta
  * PROTOCOL.md) directly, the write-side mirror of [[DeltaRead]]:
  *
  *  - data lands as ordinary parquet files written by Spark's own
  *    distributed writer into a hidden staging dir, then renamed into
  *    the table (file moves are metadata ops; renames never copy);
  *  - the commit is ONE atomic `_delta_log/NNNNNNNNNNNNNNNNNNNN.json`
  *    holding the complete action list (`protocol`+`metaData` at v0,
  *    `add` per new file, `remove` per replaced file, `commitInfo`),
  *    published through the same hard-link/rename CAS primitive as
  *    graft's own manifest protocol ([[graft.pipeline.VersionedTable
  *    .casPublish]]) — concurrent writers serialize exactly like
  *    delta-spark's optimistic commit loop: the loser re-reads the
  *    winner's snapshot, recomputes its remove set, and retries the
  *    SAME already-written data files at the next version (losing a
  *    race never re-runs the data job);
  *  - `add.path` entries are RFC-2396 percent-encoded relative URIs
  *    and partition values travel in `partitionValues` (decoded from
  *    the hive-escaped directory names Spark's writer produced) —
  *    byte-compatible with what [[DeltaRead.decodePath]] and
  *    delta-spark expect.
  *
  * Supported: append, overwrite (schema-changing overwrite re-emits
  * `metaData` CARRYING the original table id), dynamic partition
  * overwrite (removes only the partitions the new data touches).
  * Merge modes compose in [[graft.pipeline.Writer]]: the merged
  * snapshot is computed by graft's distributed merge plans, then
  * committed here as an overwrite. Checkpoints are not written —
  * optional per the protocol; readers (ours and delta-spark) replay
  * the JSON log.
  *
  * Scale: the data write is Spark's normal distributed parquet job
  * (partitioned layout, codegen, AQE all apply); driver work is
  * O(files touched this commit) for the log line plus O(live files)
  * once per commit to know the remove set / validate schema — the
  * same residency delta-spark's OptimisticTransaction holds. Failed
  * writers leave only unreferenced staging files (invisible to every
  * reader; a vacuum sweep can reclaim them).
  */
object DeltaWrite {

  private val mapper = new ObjectMapper()

  /** Append `df` to the Delta table at `path`, creating it (v0) if
    * absent. Returns the committed version.
    */
  def append(spark: SparkSession, df: DataFrame, path: String,
             partitionBy: Seq[String] = Nil): Long =
    write(spark, df, path, Mode.Append, partitionBy)

  /** Replace the table's content (and, if changed, its schema /
    * partitioning — carrying the table id) with `df`.
    */
  def overwrite(spark: SparkSession, df: DataFrame, path: String,
                partitionBy: Seq[String] = Nil): Long =
    write(spark, df, path, Mode.Overwrite, partitionBy)

  /** Dynamic partition overwrite: only partitions PRESENT in `df` are
    * replaced (remove actions cover exactly the live files whose
    * partition tuple matches a written one) — O(source) data I/O,
    * like `partitionOverwriteMode=dynamic` on delta-spark.
    */
  def overwritePartitions(spark: SparkSession, df: DataFrame, path: String,
                          partitionBy: Seq[String]): Long = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    write(spark, df, path, Mode.DynamicOverwrite, partitionBy)
  }

  private object Mode extends Enumeration {
    val Append, Overwrite, DynamicOverwrite = Value
  }

  private def write(spark: SparkSession, df: DataFrame, path: String,
                    mode: Mode.Value, partitionByReq: Seq[String]): Long = {
    val rootP = qualifiedRoot(spark, path)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logP = new Path(rootP, "_delta_log")

    val existing: Option[DeltaRead.Snapshot] =
      if (DeltaRead.isDeltaTable(spark, rootP.toString))
        Some(DeltaRead.snapshot(spark, rootP.toString))
      else None

    // partition layout: inherit the table's unless this is a
    // full overwrite (which may legally re-partition the table)
    val parts: Seq[String] = existing match {
      case Some(snap) if mode != Mode.Overwrite =>
        if (partitionByReq.isEmpty) snap.partitionColumns
        else {
          require(snap.partitionColumns.map(_.toLowerCase) ==
                    partitionByReq.map(_.toLowerCase),
            s"Delta table at $path is partitioned by " +
              s"(${snap.partitionColumns.mkString(", ")}) but the write asked for " +
              s"(${partitionByReq.mkString(", ")}) — append/dynamic-overwrite keep " +
              "the table's layout; use a full overwrite to re-partition")
          snap.partitionColumns
        }
      case _ => partitionByReq
    }
    parts.foreach(p => require(df.columns.exists(_.equalsIgnoreCase(p)),
      s"partition column '$p' is not in the dataframe (${df.columns.mkString(", ")})"))

    // schema alignment: append must match the table's columns (order
    // may differ — realign by name; the analyzer resolves
    // case-insensitively); a gap or type change is a LOUD error, the
    // schema-evolution route is an explicit overwrite
    val aligned: DataFrame = existing match {
      case Some(snap) if mode != Mode.Overwrite =>
        val tbl = snap.schema
        val dfNames = df.columns.map(_.toLowerCase).toSet
        val missing = tbl.fieldNames.filterNot(n => dfNames.contains(n.toLowerCase))
        val extra = df.columns.filterNot(n =>
          tbl.fieldNames.exists(_.equalsIgnoreCase(n)))
        require(missing.isEmpty && extra.isEmpty,
          s"schema mismatch appending to Delta table $path — missing: " +
            s"[${missing.mkString(", ")}], extra: [${extra.mkString(", ")}]; " +
            "overwrite the table to change its schema")
        val re = df.select(tbl.fieldNames.map(col): _*)
        tbl.fields.zip(re.schema.fields).foreach { case (t, d) =>
          require(t.dataType.catalogString == d.dataType.catalogString,
            s"type mismatch appending to Delta table $path — column '${t.name}' " +
              s"is ${t.dataType.catalogString} in the table, " +
              s"${d.dataType.catalogString} in the dataframe")
        }
        re
      case _ => df
    }

    // the distributed data job runs ONCE; CAS losers re-commit the
    // same files at a later version
    val newFiles = writeDataFiles(spark, aligned, rootP, fs, parts)

    fs.mkdirs(logP) // casPublish stages its tmp inside the log dir
    var snap = existing
    var attempt = 0
    while (true) {
      attempt += 1
      val next = snap.map(_.version + 1).getOrElse(0L)
      val removes: Seq[String] = (mode, snap) match {
        case (Mode.Overwrite, Some(s)) => s.files.keys.toSeq.sorted
        case (Mode.DynamicOverwrite, Some(s)) =>
          val touched = newFiles.map(_.partitionValues).distinct.toSet
          s.files.collect { case (p, pv) if touched.contains(pv) => p }.toSeq.sorted
        case _ => Nil
      }
      val content = commitContent(aligned, mode, parts, snap, newFiles, removes, next)
      if (graft.pipeline.VersionedTable.casPublish(
            fs, new Path(logP, f"$next%020d.json"), content)) {
        return next
      }
      require(attempt < 50,
        s"Delta commit at $path lost the version race $attempt times — giving up " +
          "(another writer is committing continuously); the staged data files are " +
          "unreferenced and safe to vacuum")
      // lost the race: adopt the winner's snapshot, re-check layout
      // compatibility (the winner may have re-partitioned or evolved
      // the schema under us), recompute removes, retry
      snap = Some(DeltaRead.snapshot(spark, rootP.toString))
      snap.foreach { s =>
        if (mode != Mode.Overwrite) {
          require(s.partitionColumns.map(_.toLowerCase) == parts.map(_.toLowerCase),
            s"concurrent writer re-partitioned Delta table $path to " +
              s"(${s.partitionColumns.mkString(", ")}) mid-commit — this " +
              s"${mode.toString.toLowerCase} wrote (${parts.mkString(", ")}) layout; " +
              "re-run the write (its staged files are unreferenced)")
          require(s.schema.fieldNames.map(_.toLowerCase).sorted.sameElements(
                    aligned.schema.fieldNames.map(_.toLowerCase).sorted),
            s"concurrent writer changed the schema of Delta table $path mid-commit — " +
              "re-run the write against the new schema (staged files are unreferenced)")
        }
      }
    }
    -1L // unreachable
  }

  private final case class NewFile(
      relPath: String,
      partitionValues: Map[String, String],
      size: Long,
      modificationTime: Long)

  /** Distributed parquet write into a hidden staging dir under the
    * table root, then per-file rename into place (same-FS move =
    * metadata op). File names come from Spark's writer
    * (part-NNNNN-&lt;job-uuid&gt;…) so they never collide with live files.
    */
  private def writeDataFiles(spark: SparkSession, df: DataFrame, rootP: Path,
                             fs: FileSystem, parts: Seq[String]): Seq[NewFile] = {
    val staging = new Path(rootP,
      ".graft-delta-staging-" + java.util.UUID.randomUUID.toString.take(12))
    try {
      val w = df.write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(staging.toString)
      val found = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
      def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) { if (!n.startsWith(".") && !n.startsWith("_")) walk(st.getPath) }
        else if (n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
          found += st
      }
      walk(staging)
      found.toSeq.sortBy(_.getPath.toString).map { st =>
        val rel = relativize(staging, st.getPath)
        val dest = new Path(rootP, rel)
        if (rel.contains("/")) fs.mkdirs(dest.getParent)
        require(fs.rename(st.getPath, dest),
          s"staging move ${st.getPath} -> $dest failed; no commit was written")
        NewFile(rel, partitionValuesOf(rel, parts), st.getLen, st.getModificationTime)
      }
    } finally fs.delete(staging, true)
  }

  private def relativize(base: Path, p: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/") + "/"
    val s = p.toUri.getPath
    require(s.startsWith(b), s"$p is not under $base")
    s.substring(b.length)
  }

  /** Partition values from the hive-style dir segments Spark's writer
    * produced (`col=escaped/`): unescape to the RAW value for the
    * `partitionValues` map; `__HIVE_DEFAULT_PARTITION__` = null.
    */
  private def partitionValuesOf(rel: String, parts: Seq[String]): Map[String, String] = {
    if (parts.isEmpty) return Map.empty
    val dirs = rel.split('/').dropRight(1)
    require(dirs.length == parts.length,
      s"staged file '$rel' has ${dirs.length} partition dirs, expected " +
        s"${parts.length} (${parts.mkString(", ")})")
    dirs.map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"staged dir '$seg' is not a col=value partition segment")
      val k = ExternalCatalogUtils.unescapePathName(seg.substring(0, i))
      val v = seg.substring(i + 1)
      k -> (if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
            else ExternalCatalogUtils.unescapePathName(v))
    }.toMap
  }

  /** RFC-2396 percent-encode a RELATIVE path for `add.path` /
    * `remove.path` — the exact inverse of [[DeltaRead.decodePath]]'s
    * `new URI(p).getPath`. '%' itself is encoded (the on-disk name may
    * contain hive escapes), '/' and URI pchars pass through.
    */
  private[sources] def encodePath(rel: String): String = {
    val keep = "-_.~!$&'()*+,;=:@/"
    rel.flatMap { c =>
      if ((c.isLetterOrDigit && c < 128) || keep.indexOf(c.toInt) >= 0) c.toString
      else c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X").mkString
    }
  }

  private def commitContent(df: DataFrame, mode: Mode.Value, parts: Seq[String],
                            snap: Option[DeltaRead.Snapshot], adds: Seq[NewFile],
                            removes: Seq[String], version: Long): String = {
    val now = System.currentTimeMillis
    val lines = Seq.newBuilder[String]

    val ci = mapper.createObjectNode
    val cib = ci.putObject("commitInfo")
    cib.put("timestamp", now)
    cib.put("operation", if (mode == Mode.Append) "WRITE" else "OVERWRITE")
    val op = cib.putObject("operationParameters")
    op.put("mode", if (mode == Mode.Append) "Append" else "Overwrite")
    cib.put("engineInfo", "graft-delta-writer/1.0")
    lines += mapper.writeValueAsString(ci)

    if (version == 0L) {
      val pr = mapper.createObjectNode
      val prb = pr.putObject("protocol")
      prb.put("minReaderVersion", 1)
      prb.put("minWriterVersion", 2)
      lines += mapper.writeValueAsString(pr)
    }

    // metaData at v0, and on overwrites that change schema or layout —
    // CARRYING the table id (a fresh id would read as a different
    // table to other Delta clients)
    val schemaJson = df.schema.json
    val needMeta = snap match {
      case None => true
      case Some(s) =>
        mode == Mode.Overwrite &&
          (s.schema.json != schemaJson ||
            s.partitionColumns.map(_.toLowerCase) != parts.map(_.toLowerCase))
      }
    if (needMeta) {
      val md = mapper.createObjectNode
      val mdb = md.putObject("metaData")
      mdb.put("id", snap.flatMap(s => Option(s.metaId))
        .getOrElse(java.util.UUID.randomUUID.toString))
      val fmt = mdb.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      mdb.put("schemaString", schemaJson)
      val pc = mdb.putArray("partitionColumns")
      parts.foreach(pc.add)
      mdb.putObject("configuration")
      mdb.put("createdTime", now)
      lines += mapper.writeValueAsString(md)
    }

    removes.foreach { p =>
      val rm = mapper.createObjectNode
      val rmb = rm.putObject("remove")
      rmb.put("path", encodePath(p))
      rmb.put("deletionTimestamp", now)
      rmb.put("dataChange", true)
      lines += mapper.writeValueAsString(rm)
    }

    adds.foreach { f =>
      val ad = mapper.createObjectNode
      val adb = ad.putObject("add")
      adb.put("path", encodePath(f.relPath))
      val pv = adb.putObject("partitionValues")
      f.partitionValues.foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v)
      }
      adb.put("size", f.size)
      adb.put("modificationTime", f.modificationTime)
      adb.put("dataChange", true)
      lines += mapper.writeValueAsString(ad)
    }

    lines.result().mkString("\n") + "\n"
  }

  private def qualifiedRoot(spark: SparkSession, path: String): Path = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
  }
}
