package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftbridge.ManifestFileIndex

/** Manifest-planned scans (round 11): a uniform snapshot reads as ONE
  * scan over a ManifestFileIndex synthesized purely from manifest +
  * sidecar metadata (file list, sizes, partition values) — no
  * per-directory inference, no per-file stat calls — and the answers
  * are identical to the general per-dir union path's.
  */
class ManifestPlanSuite extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def manifestIndexOf(df: org.apache.spark.sql.DataFrame): Option[ManifestFileIndex] =
    df.queryExecution.logical.collectFirst {
      case LogicalRelation(rel: HadoopFsRelation, _, _, _, _)
        if rel.location.isInstanceOf[ManifestFileIndex] =>
          rel.location.asInstanceOf[ManifestFileIndex]
    }

  test("multi-delta flat snapshot: ONE ManifestFileIndex scan, sizes from sidecars, right answers") {
    val root = tmp("mplan_flat")
    (1 to 5).foreach { i =>
      VersionedTable.commitDelta(spark, root, "parquet",
        Seq((i.toLong, s"v$i")).toDF("id", "v"), compactAfter = Int.MaxValue)
    }
    val df = VersionedTable.read(spark, root)
    val idx = manifestIndexOf(df)
    assert(idx.isDefined,
      s"uniform flat snapshot must plan through ManifestFileIndex:\n${df.queryExecution.logical}")
    // sizes came from the sidecar and are REAL lengths (split planning
    // depends on them)
    assert(idx.get.sizedFiles.nonEmpty && idx.get.sizedFiles.forall(_._2 > 0))
    assert(df.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("uniform hive snapshot: one ManifestFileIndex with partition columns; pruning works") {
    val root = tmp("mplan_hive")
    (1 to 3).foreach { c =>
      VersionedTable.commitDelta(spark, root, "parquet",
        Seq((c * 10L, c % 2, s"r$c"), (c * 10L + 1, (c + 1) % 2, s"s$c")).toDF("id", "p", "v"),
        partitionBy = Seq("p"), compactAfter = Int.MaxValue)
    }
    val df = VersionedTable.read(spark, root)
    val idx = manifestIndexOf(df)
    assert(idx.isDefined,
      s"uniform hive snapshot must plan through ManifestFileIndex:\n${df.queryExecution.logical}")
    assert(idx.get.partitionSpec().partitionColumns.map(_.name) == Seq("p"))
    // values correct, partition column typed from the recorded schema
    val got = df.select("id", "p", "v").as[(Long, Int, String)].collect().toSet
    assert(got == Set((10L, 1, "r1"), (11L, 0, "s1"), (20L, 0, "r2"), (21L, 1, "s2"),
      (30L, 1, "r3"), (31L, 0, "s3")))
    // partition pruning: p===1 lists only p=1 files (resolved attr —
    // listFiles evaluates the predicate directly)
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    val pAttr = AttributeReference("p", org.apache.spark.sql.types.IntegerType)()
    val listed = idx.get.listFiles(Seq(EqualTo(pAttr, Literal(1))), Nil)
    val paths = listed.flatMap(_.files.map(_.getPath.toString))
    assert(paths.nonEmpty && paths.forall(_.contains("p=1")),
      s"partition filter must prune the manifest index: $paths")
  }

  test("partition-overwrite carry-over (subtree refs) plans through ManifestFileIndex too") {
    val root = tmp("mplan_pref")
    VersionedTable.commit(spark, root, "parquet",
      _ => Seq((1L, "A", "old"), (2L, "B", "old"), (3L, "C", "old")).toDF("id", "p", "v"),
      partitionBy = Seq("p"))
    // overwrite only partition B: A and C carry over as subtree refs
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((20L, "B", "new")).toDF("id", "p", "v"), Seq("p"))
    val df = VersionedTable.read(spark, root)
    assert(manifestIndexOf(df).isDefined,
      s"subtree-ref snapshot must plan through ManifestFileIndex:\n${df.queryExecution.logical}")
    val got = df.select("id", "p", "v").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "A", "old"), (3L, "C", "old"), (20L, "B", "new")))
  }

  test("additive evolution answers match between fast path and pre-round-12 union path") {
    // round 12 moved additive evolution ONTO the fast path; this pins
    // that the merged-schema scan answers exactly what the general
    // union path answered (the old contract), including a dir whose
    // column order differs
    val root = tmp("mplan_evo")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((2L, "b", 9L)).toDF("id", "v", "extra"), compactAfter = Int.MaxValue)
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq(("c", 3L)).toDF("v", "id"), compactAfter = Int.MaxValue)
    val df = VersionedTable.read(spark, root)
    assert(manifestIndexOf(df).isDefined, "additive evolution must take the fast path now")
    assert(df.columns.toSeq == Seq("id", "v", "extra"),
      "column order = manifest encounter order, like unionByName's")
    val got = df.select("id", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, "a", -1L), (2L, "b", 9L), (3L, "c", -1L)))
  }

  test("legacy dirs without schema sidecars fall back and still answer") {
    val root = tmp("mplan_legacy")
    (1 to 3).foreach { i =>
      VersionedTable.commitDelta(spark, root, "parquet",
        Seq((i.toLong, s"v$i")).toDF("id", "v"), compactAfter = Int.MaxValue)
    }
    // simulate a pre-round-11 table: delete the schema sidecars
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).foreach { st =>
      if (st.isDirectory && !st.getPath.getName.startsWith("_"))
        fs.delete(new org.apache.hadoop.fs.Path(st.getPath, FileStats.SchemaSidecarName), false)
    }
    val df = VersionedTable.read(spark, root)
    assert(manifestIndexOf(df).isEmpty, "sidecar-less snapshot must take the general path")
    assert(df.select("id").as[Long].collect().sorted.toSeq == (1L to 3L))
  }

  test("split planning over synthesized FileStatus: a large file splits by its REAL sidecar length") {
    val root = tmp("mplan_split")
    // one ~1.5 MB parquet file (100k rows, sorted so one file)
    VersionedTable.commitDelta(spark, root, "parquet",
      spark.range(100000).select(col("id"), concat(lit("payload_"), col("id")).as("v"))
        .coalesce(1),
      compactAfter = Int.MaxValue)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "131072") // 128 KB
      val df = VersionedTable.read(spark, root)
      assert(manifestIndexOf(df).isDefined)
      val parts = df.rdd.getNumPartitions
      assert(parts > 1,
        s"a 1.5 MB file at 128 KB maxPartitionBytes must split (got $parts partition)")
      // splits must cover the file exactly: no lost or duplicated rows
      assert(df.count() == 100000L)
      assert(df.agg(sum("id")).head.getLong(0) == 99999L * 100000L / 2)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("upgradeMetadata backfills sidecars in place: legacy table gains the fast path, answers unchanged") {
    val root = tmp("mplan_upgrade")
    (1 to 4).foreach { i =>
      VersionedTable.commitDelta(spark, root, "parquet",
        Seq((i.toLong, s"v$i")).toDF("id", "v"), compactAfter = Int.MaxValue)
    }
    // simulate a pre-round-11 table: strip schema sidecars and the
    // bytes field from the stats sidecars
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).foreach { st =>
      if (st.isDirectory && !st.getPath.getName.startsWith("_"))
        fs.delete(new org.apache.hadoop.fs.Path(st.getPath, FileStats.SchemaSidecarName), false)
    }
    val before = VersionedTable.read(spark, root)
    assert(manifestIndexOf(before).isEmpty, "stripped table must take the general path")
    assert(VersionedTable.upgradeMetadata(spark, root) == 4)
    assert(VersionedTable.upgradeMetadata(spark, root) == 0, "idempotent: second run is a no-op")
    val after = VersionedTable.read(spark, root)
    assert(manifestIndexOf(after).isDefined, "upgraded table must take the fast path")
    assert(after.select("id").as[Long].collect().sorted.toSeq == (1L to 4L))
  }

  test("ADDITIVE schema evolution stays on the fast path: one manifest scan, nulls for old files") {
    val root = tmp("mplan_evolve")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), compactAfter = Int.MaxValue)
    // append with a NEW column: the sidecars now disagree additively
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score"),
      compactAfter = Int.MaxValue)
    val df = VersionedTable.read(spark, root)
    val idx = manifestIndexOf(df)
    assert(idx.isDefined,
      s"additively-evolved snapshot must STAY on ManifestFileIndex:\n${df.queryExecution.logical}")
    assert(idx.get.sizedFiles.forall(_._2 > 0), "zero plan-time FS calls = sizes from sidecars")
    // merged schema in encounter order; old files read the new column as null
    assert(df.columns.toSeq == Seq("id", "v", "score"))
    val got = df.select("id", "v", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5)), (4L, "d", Some(0.7))))
    // one scan, not a union of per-dir branches
    assert(!df.queryExecution.executedPlan.toString.contains("Union"))
    // a TYPE change on a same-named column is NOT additive → general
    // path (still correct, via per-dir union)
    val root2 = tmp("mplan_conflict")
    VersionedTable.commitDelta(spark, root2, "parquet",
      Seq((1L, 10L)).toDF("id", "n"), compactAfter = Int.MaxValue)
    VersionedTable.commitDelta(spark, root2, "parquet",
      Seq((2L, "ten")).toDF("id", "n"), compactAfter = Int.MaxValue)
    val df2 = VersionedTable.read(spark, root2)
    assert(manifestIndexOf(df2).isEmpty, "type conflict must fall back to the general path")
    assert(df2.count() == 2)
  }

  test("read-side stat skipping through the DSv2 face keeps the manifest index (no re-stat)") {
    val root = tmp("mplan_skip")
    (1 to 4).foreach { i =>
      VersionedTable.commitDelta(spark, root, "parquet",
        Seq((i.toLong * 100, s"v$i")).toDF("id", "v"), compactAfter = Int.MaxValue)
    }
    val pruned = spark.read.format("graft").load(root).where(col("id") === 200L)
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s.scan
    }
    assert(scans.nonEmpty)
    val fileScan = scans.head.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
    assert(fileScan.fileIndex.isInstanceOf[ManifestFileIndex],
      s"pruned scan must keep the manifest-synthesized index: ${fileScan.fileIndex}")
    // skipping actually dropped the other files
    assert(fileScan.fileIndex.inputFiles.length < 4)
    assert(pruned.select("v").as[String].collect().toSeq == Seq("v2"))
  }
}
