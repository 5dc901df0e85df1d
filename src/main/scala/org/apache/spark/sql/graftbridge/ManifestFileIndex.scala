package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{PartitioningAwareFileIndex, PartitionSpec}

/** A [[PartitioningAwareFileIndex]] built ENTIRELY from graft manifest
  * metadata: the file list, file sizes and partition values all come
  * from the committed manifest + `_graft_stats` sidecars, so
  * constructing it performs ZERO filesystem calls — no listing jobs,
  * no per-file stat RPCs (the posture Delta/Iceberg take: file sizes
  * live in the log). InMemoryFileIndex by contrast eagerly stats
  * every path at construction, which at a 5 000-leaf snapshot on an
  * object store is 5 000 serial (or one listing-job's worth of) RPCs
  * before the first byte of planning.
  *
  * Partition pruning, file filtering and split planning are all the
  * inherited native behavior — only the DISCOVERY is replaced.
  *
  * `files` are (absolute path, size-in-bytes) pairs grouped by parent
  * directory by the constructor; `spec` carries the manifest-resolved
  * partition values (PartitionSpec.emptySpec for flat snapshots).
  *
  * Known divergence: synthesized FileStatus carries modification time
  * 0 (the manifest records sizes, not mtimes — mtimes are not stable
  * across object-store copies anyway), so a query projecting
  * `_metadata.file_modification_time` sees epoch 0 where a listed
  * index saw the store's mtime. `_metadata.file_size` and
  * `file_path` are exact. Nothing else consumes the mtime: split
  * planning uses length, and graft streams sequence by manifest
  * version, never by file time.
  */
class ManifestFileIndex(
    spark: SparkSession,
    spec: PartitionSpec,
    files: Seq[(String, Long)])
  extends PartitioningAwareFileIndex(spark, Map.empty[String, String], None) {

  private val statuses: Seq[FileStatus] = files.map { case (p, len) =>
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
  }

  /** The (path, bytes) list this index was built from — lets a
    * stat-skipping pass construct the PRUNED index without re-statting
    * the surviving files.
    */
  def sizedFiles: Seq[(String, Long)] = files

  override def partitionSpec(): PartitionSpec = spec

  override protected val leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }

  override protected val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  override def rootPaths: Seq[Path] = leafDirToChildrenFiles.keys.toSeq

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._2).sum

  override def toString: String =
    s"ManifestFileIndex(${files.length} files, ${spec.partitionColumns.map(_.name).mkString(",")})"
}
