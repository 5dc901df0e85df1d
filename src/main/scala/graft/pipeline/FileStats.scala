package graft.pipeline

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Per-file column statistics for versioned-table data directories —
  * the manifest-level analog of Delta's `add.stats` (reference:
  * drune's merge sinks inherit file skipping from Delta; graft's
  * manifest protocol records its own). Each committed data directory
  * carries a `_graft_stats` sidecar (underscore-prefixed, so Spark's
  * file listing ignores it): one JSON line per data file with its row
  * count and min/max per primitive column, extracted from the parquet
  * FOOTERS the writer already produced — no data re-read, no extra
  * scan.
  *
  * What the stats buy at 100 TB:
  *  - file-pruned MERGE ([[VersionedTable.commitMerge]]): rewrite ONLY
  *    the files whose key range intersects the source keys; everything
  *    else carries over in the manifest by reference — the O(table)
  *    rewrite commit becomes O(touched files + source).
  *  - read-side data skipping ([[VersionedTable.readPruned]]): a
  *    selective filter opens only the files whose range can match —
  *    without first opening every footer on the read path (the sidecar
  *    is one tiny read per directory, not one per file).
  *
  * Stats are an OPTIMIZATION, never a correctness dependency: a file
  * or column without stats is treated as always-matching (merge
  * rewrites it, reads scan it). Unsupported types (nested, binary,
  * timestamps) simply record no entry. Sidecar write failures warn and
  * continue — the data commit must not fail because an optimization
  * could not be recorded.
  */
object FileStats {

  /** Typed min/max of one column in one file. Values are Long, Double
    * or String (ints widen to long, floats to double).
    */
  final case class ColStat(min: Any, max: Any)

  /** One data file's stats: path relative to the DATA DIRECTORY, row
    * count, per-column min/max (columns with no usable footer stats —
    * all-null chunks, unsupported types — are absent), and the file
    * SIZE in bytes (-1 in legacy sidecars written before sizes were
    * recorded). With sizes present, a snapshot's scan plans from
    * manifest metadata alone — no per-file stat calls (the
    * Delta/Iceberg "file sizes live in the log" posture).
    * `nulls` records per-column null counts (absent when any row
    * group left numNulls unset) — min/max and null counts are
    * independent: an unsupported-type column can still count nulls,
    * and Delta's `add.stats` wants both.
    */
  final case class FileStat(file: String, rows: Long, cols: Map[String, ColStat],
                            bytes: Long = -1L,
                            nulls: Map[String, Long] = Map.empty)

  val SidecarName = "_graft_stats"

  @transient private lazy val mapper = new ObjectMapper()

  /** Data files (relative names) under `dir`, excluding Spark metadata
    * (`_*`, `.*`). Returns None when the directory has subdirectories —
    * a hive-partitioned layout, whose partition columns live in the
    * directory names: file-level references would lose them, so callers
    * must treat such a directory as an opaque unit.
    */
  def listDataFiles(fs: FileSystem, dir: Path): Option[Seq[String]] = {
    val entries = fs.listStatus(dir).toSeq
    if (entries.exists(_.isDirectory)) None
    else Some(entries.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted)
  }

  /** ALL leaf data files under `dir` as dir-relative paths — for a
    * flat directory identical to [[listDataFiles]], for a
    * hive-partitioned one the partition subdirectories ride along in
    * the path (`p=1/part-...parquet`). The recursive unit of the
    * per-file stats that extend pruned merges and data skipping to
    * partitioned layouts.
    */
  def listLeafDataFiles(fs: FileSystem, dir: Path): Seq[String] =
    listLeafDataFilesSized(fs, dir).map(_._1)

  /** [[listLeafDataFiles]] with each leaf's size in bytes — the walk
    * already has the FileStatus in hand; capturing the length lets
    * sidecars record it and scan planning skip per-file stat calls.
    */
  def listLeafDataFilesSized(fs: FileSystem, dir: Path): Seq[(String, Long)] = {
    def walk(p: Path, rel: String): Seq[(String, Long)] =
      fs.listStatus(p).toSeq
        .filterNot(e => e.getPath.getName.startsWith("_") || e.getPath.getName.startsWith("."))
        .flatMap { e =>
          val r = if (rel.isEmpty) e.getPath.getName else rel + "/" + e.getPath.getName
          if (e.isDirectory) walk(e.getPath, r) else Seq((r, e.getLen))
        }
    walk(dir, "").sortBy(_._1)
  }

  /** Extract per-file stats from the parquet footers of `dir`'s data
    * files and write the `_graft_stats` sidecar INTO the directory
    * (callers invoke this while the directory is still private, before
    * the manifest CAS publishes it — the sidecar travels with the
    * immutable dir through carry-over references and vacuum).
    *
    * Footer reads are distributed over executors above
    * [[DistributeThreshold]] files (a 100k-file commit must not
    * serialize 100k object-store footer reads on the driver); below
    * it, job-launch overhead exceeds the read cost and the driver
    * loops directly.
    */
  def writeSidecar(spark: SparkSession, fs: FileSystem, dir: Path,
                   format: String): Unit = {
    if (format != "parquet") return // footer stats are a parquet feature
    try {
      // hive layouts record their LEAF files with the partition
      // subdirectories in the relative path, so pruned merges and
      // read-side skipping work file-level inside partitions too
      val sized = listLeafDataFilesSized(fs, dir)
      val files = sized.map(_._1)
      if (files.isEmpty) return
      val qualified = files.map(f => fs.makeQualified(new Path(dir, f)).toString)
      val stats =
        if (files.length <= DistributeThreshold)
          qualified.map(u => readFooterStats(u, new Configuration(
            spark.sparkContext.hadoopConfiguration)))
        else {
          val parallelism = math.min(files.length, 256)
          spark.sparkContext.parallelize(qualified, parallelism)
            // executors re-derive a Hadoop conf: the qualified URI
            // carries scheme+authority, so a default conf resolves it
            .map(u => FileStats.readFooterStats(u, new Configuration()))
            .collect().toSeq
        }
      // keys are dir-RELATIVE paths: re-relativize what
      // readFooterStats recorded (it keeps only the file name)
      val lines = sized.zip(stats).map { case ((rel, len), st) =>
        render(st.copy(file = rel, bytes = len))
      }
      val out = fs.create(new Path(dir, SidecarName), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
      // Schema sidecar: record EXACTLY what read-back inference would
      // return (one inference here at commit time, amortized over
      // every later read of this immutable dir) plus the partition
      // column sequence parsed from the leaf paths. writeSchemaSidecar
      // never throws — a failure degrades that dir to inference.
      val partCols = files.head.split('/').dropRight(1)
        .takeWhile(s => s.contains('=') && !s.startsWith("="))
        .map(_.split("=", 2)(0)).toSeq
      writeSchemaSidecar(fs, dir,
        spark.read.format(format).load(dir.toString).schema, partCols)
    } catch {
      case NonFatal(e) =>
        // stats are an optimization: a commit must not fail because
        // they could not be recorded — but be LOUD so a persistently
        // stats-less table (merge always full-rewrite) is diagnosable
        System.err.println(
          s"[graft] WARNING: could not write file-stats sidecar for $dir " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — merges touching " +
            "this directory will rewrite it entirely and reads will not skip it")
    }
  }

  private val DistributeThreshold = 64

  /** Footer-only stats of one parquet file (static: shipped to
    * executors for the distributed path). Row-group chunk stats reduce
    * to per-file min/max; a column with any chunk lacking usable stats
    * records nothing (conservative: no stats = always matches).
    */
  def readFooterStats(fileUri: String, conf: Configuration): FileStat = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val p = new Path(fileUri)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Option[ColStat]]
      // null counts reduce independently of min/max: ANY row group with
      // numNulls unset poisons the column (a partial count understates)
      val nullAcc = scala.collection.mutable.LinkedHashMap.empty[String, Option[Long]]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (!name.contains('.')) { // top-level primitives only
          val pt = c.getPrimitiveType
          val st = c.getStatistics
          val nc: Option[Long] =
            if (st != null && !st.isEmpty && st.isNumNullsSet) Some(st.getNumNulls)
            else None
          nullAcc.get(name) match {
            case None            => nullAcc(name) = nc
            case Some(None)      => ()
            case Some(Some(pre)) => nullAcc(name) = nc.map(_ + pre)
          }
          val usable = st != null && !st.isEmpty && st.hasNonNullValue
          val vals: Option[(Any, Any)] =
            if (!usable) None
            else pt.getPrimitiveTypeName match {
              case INT32 => Some((st.genericGetMin.asInstanceOf[Integer].longValue(),
                st.genericGetMax.asInstanceOf[Integer].longValue()))
              case INT64 if pt.getLogicalTypeAnnotation == null ||
                  pt.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
                Some((st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
              case FLOAT => Some((st.genericGetMin.asInstanceOf[java.lang.Float].doubleValue(),
                st.genericGetMax.asInstanceOf[java.lang.Float].doubleValue()))
              case DOUBLE => Some((st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
                st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue()))
              case BINARY if pt.getLogicalTypeAnnotation
                  .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                Some((st.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8,
                  st.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8))
              case _ => None // timestamps/decimal/binary/nested: no entry
            }
          // reduce across row groups; ANY group without usable stats
          // poisons the column for this file (partial min/max would be
          // silently wrong)
          acc.get(name) match {
            case None => acc(name) = vals.map { case (lo, hi) => ColStat(lo, hi) }
            case Some(None) => ()
            case Some(Some(prev)) => acc(name) = vals.map { case (lo, hi) =>
              ColStat(minOf(prev.min, lo), maxOf(prev.max, hi))
            }
          }
        }
      }
      FileStat(p.getName, rows, acc.collect { case (k, Some(v)) => k -> v }.toMap,
        nulls = nullAcc.collect { case (k, Some(n)) => k -> n }.toMap)
    } finally reader.close()
  }

  private def minOf(a: Any, b: Any): Any = if (cmp(a, b) <= 0) a else b
  private def maxOf(a: Any, b: Any): Any = if (cmp(a, b) >= 0) a else b

  /** Compare two stat values of the same runtime type. Strings compare
    * in unsigned UTF-8 byte order (the order parquet footers and
    * Spark's UTF8String use) — UTF-16 code-unit order disagrees for
    * supplementary-plane characters vs U+E000..U+FFFF and a mismatch
    * there turns data skipping into wrong results, not missed prunes.
    */
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    case _ => throw new IllegalArgumentException(
      s"incomparable stat values: ${a.getClass.getSimpleName} vs ${b.getClass.getSimpleName}")
  }

  private def render(fsr: FileStat): String = {
    val node = mapper.createObjectNode()
    node.put("file", fsr.file)
    node.put("rows", fsr.rows)
    if (fsr.bytes >= 0) node.put("bytes", fsr.bytes)
    val cols = node.putObject("cols")
    fsr.cols.toSeq.sortBy(_._1).foreach { case (name, cs) =>
      val c = cols.putObject(name)
      (cs.min, cs.max) match {
        case (lo: Long, hi: Long)     => c.put("t", "long");   c.put("min", lo); c.put("max", hi)
        case (lo: Double, hi: Double) => c.put("t", "double"); c.put("min", lo); c.put("max", hi)
        case (lo: String, hi: String) => c.put("t", "string"); c.put("min", lo); c.put("max", hi)
        case other => throw new IllegalStateException(s"unrenderable stat $other")
      }
    }
    if (fsr.nulls.nonEmpty) {
      val nn = node.putObject("nullc")
      fsr.nulls.toSeq.sortBy(_._1).foreach { case (name, n) => nn.put(name, n) }
    }
    mapper.writeValueAsString(node)
  }

  /** Parse a sidecar's content back into per-file stats. Unreadable
    * lines make the WHOLE sidecar unusable (None) — half-parsed stats
    * could classify a touched file as untouched.
    */
  def parse(content: String): Option[Seq[FileStat]] =
    try Some(content.split("\n").map(_.trim).filter(_.nonEmpty).toSeq.map { line =>
      val n = mapper.readTree(line)
      val cols = Option(n.get("cols")).map { cn =>
        cn.properties().asScala.map { e =>
          val v = e.getValue
          val stat = v.get("t").asText() match {
            case "long"   => ColStat(v.get("min").asLong(), v.get("max").asLong())
            case "double" => ColStat(v.get("min").asDouble(), v.get("max").asDouble())
            case "string" => ColStat(v.get("min").asText(), v.get("max").asText())
            case t => throw new IllegalStateException(s"unknown stat type '$t'")
          }
          e.getKey -> stat
        }.toMap
      }.getOrElse(Map.empty[String, ColStat])
      FileStat(n.get("file").asText(), n.get("rows").asLong(), cols,
        Option(n.get("bytes")).map(_.asLong()).getOrElse(-1L),
        Option(n.get("nullc")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asLong()).toMap)
          .getOrElse(Map.empty))
    })
    catch { case NonFatal(_) => None }

  /** The sidecar of `dir`, if present and readable. */
  def readSidecar(fs: FileSystem, dir: Path): Option[Seq[FileStat]] = {
    val p = new Path(dir, SidecarName)
    if (!fs.exists(p)) None
    else VersionedTable.readSmall(fs, p).flatMap(parse)
  }

  val SchemaSidecarName = "_graft_schema"

  /** Record the dir's LOGICAL read schema (all-nullable — file-source
    * reads force nullability, so this matches what inference would
    * return) and its hive partition columns. One tiny driver read at
    * load time then replaces per-directory parquet footer inference:
    * at a many-hundred-dir snapshot that inference was the dominant
    * read-path cost (each dir = a separate footer open), and
    * identical-schema FLAT dirs can further collapse into one
    * multi-path scan (see VersionedTable.load). Best-effort like the
    * stats sidecar: absence degrades to inference, never to a wrong
    * answer.
    */
  def writeSchemaSidecar(fs: FileSystem, dir: Path,
                         schema: org.apache.spark.sql.types.StructType,
                         partitionCols: Seq[String]): Unit =
    try {
      val node = mapper.createObjectNode()
      val parts = node.putArray("parts")
      partitionCols.foreach(parts.add)
      node.set[com.fasterxml.jackson.databind.JsonNode]("schema",
        mapper.readTree(
          org.apache.spark.sql.graftbridge.ColumnBridge.asNullable(schema).json))
      val out = fs.create(new Path(dir, SchemaSidecarName), true)
      try out.write((mapper.writeValueAsString(node) + "\n").getBytes("UTF-8"))
      finally out.close()
    } catch {
      case NonFatal(e) =>
        System.err.println(
          s"[graft] WARNING: could not write schema sidecar for $dir " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — reads will fall " +
            "back to per-directory footer inference")
    }

  /** The schema sidecar of `dir`: (read schema, partition columns).
    * None when absent or unreadable (legacy dirs, non-graft writers).
    */
  def readSchemaSidecar(fs: FileSystem, dir: Path)
      : Option[(org.apache.spark.sql.types.StructType, Seq[String])] = {
    val p = new Path(dir, SchemaSidecarName)
    if (!fs.exists(p)) None
    else VersionedTable.readSmall(fs, p).flatMap { content =>
      try {
        val n = mapper.readTree(content)
        val parts = Option(n.get("parts")).map(_.asScala.map(_.asText()).toSeq).getOrElse(Nil)
        org.apache.spark.sql.types.DataType.fromJson(n.get("schema").toString) match {
          case st: org.apache.spark.sql.types.StructType => Some((st, parts))
          case _ => None
        }
      } catch { case NonFatal(_) => None }
    }
  }

  /** Does a file whose `col` spans [statMin, statMax] possibly contain
    * one of `sortedKeys` (same runtime type, sorted ascending)? Binary
    * search for the first key >= min, then check it is <= max.
    */
  def rangeHitsKeys(stat: ColStat, sortedKeys: IndexedSeq[Any]): Boolean = {
    var lo = 0
    var hi = sortedKeys.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(sortedKeys(mid), stat.min) < 0) lo = mid + 1 else hi = mid
    }
    lo < sortedKeys.length && cmp(sortedKeys(lo), stat.max) <= 0
  }

  /** Interval overlap test for read-side skipping. */
  def rangeOverlaps(stat: ColStat, lower: Any, upper: Any): Boolean =
    cmp(stat.max, lower) >= 0 && cmp(stat.min, upper) <= 0
}
