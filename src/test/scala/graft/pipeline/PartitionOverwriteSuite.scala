package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-pruned dynamic partition overwrite
  * ([[VersionedTable.commitPartitionOverwrite]]): untouched hive
  * leaves carry over in the next manifest as partition-subtree
  * references (zero data I/O, byte-identical), touched leaves drop,
  * and the source lands as one new partitioned directory — the
  * O(source) commit shape `overwrite_partition` needs at 100 TB.
  */
class PartitionOverwriteSuite extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  private def digest(p: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(java.nio.file.Files.readAllBytes(p))
    md.digest().map("%02x".format(_)).mkString
  }

  /** All data files under dir (recursive), name-relative → md5. */
  private def treeDigest(root: String, dir: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root, dir)
    java.nio.file.Files.walk(base).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter(p => !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => base.relativize(p).toString -> digest(p)).toMap
  }

  private def seed = Seq(
    (1L, "US", 10L), (2L, "US", 20L),
    (3L, "DE", 30L), (4L, "DE", 40L),
    (5L, "FR", 50L), (6L, "FR", 60L)).toDF("id", "cc", "v")

  test("untouched partitions carry over as subtree refs, byte-identical; touched drop") {
    val root = tmpRoot("graft_po")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    val v1dir = VersionedTable.currentSnapshot(spark, root).get.dataDirs.head
    val before = treeDigest(root, v1dir)

    val fix = Seq((7L, "DE", 700L)).toDF("id", "cc", "v")
    val v2 = VersionedTable.commitPartitionOverwrite(spark, root, "parquet", fix, Seq("cc"))
    assert(v2 == 2L)

    val snap = VersionedTable.currentSnapshot(spark, root).get
    val refs = snap.dataDirs.filter(VersionedTable.isPartitionRef)
    val dirs = snap.dataDirs.filterNot(VersionedTable.isFileRef)
    assert(refs.map(_.split('/').last).toSet == Set("cc=US", "cc=FR"),
      s"US and FR must carry over as partition refs: ${snap.dataDirs}")
    assert(refs.forall(_.startsWith(v1dir + "/")), s"refs must point into v1's dir: $refs")
    assert(dirs.size == 1 && dirs.head != v1dir, s"one new dir expected: ${snap.dataDirs}")

    // carried subtrees byte-identical (nothing rewrote them)
    val after = treeDigest(root, v1dir)
    assert(after == before, "carried-over partition subtrees must be untouched bytes")

    // read-back = dynamic-overwrite semantics: DE replaced, US/FR intact
    val got = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "US", 10L), (2L, "US", 20L), (5L, "FR", 50L),
      (6L, "FR", 60L), (7L, "DE", 700L)))

    // time travel: v1 reads the full original snapshot
    val v1got = VersionedTable.readVersion(spark, root, 1L)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(v1got == seed.as[(Long, String, Long)].collect().toSet)
  }

  test("a dir with no touched partition carries over WHOLE; refs re-classify on the next overwrite") {
    val root = tmpRoot("graft_po2")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    // append lands a second partitioned dir holding only GB
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((8L, "GB", 80L)).toDF("id", "cc", "v"), partitionBy = Seq("cc"))

    val fix = Seq((9L, "US", 900L)).toDF("id", "cc", "v")
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet", fix, Seq("cc"))
    val snap3 = VersionedTable.currentSnapshot(spark, root).get
    // GB's dir untouched → whole-dir entry survives; seed dir decomposes
    assert(snap3.dataDirs.count(e => !VersionedTable.isFileRef(e)) == 2,
      s"GB delta dir + the new dir as whole dirs: ${snap3.dataDirs}")
    assert(snap3.dataDirs.count(VersionedTable.isPartitionRef) == 2,
      s"DE and FR as partition refs: ${snap3.dataDirs}")

    // second overwrite classifies the EXISTING refs (drop FR, keep DE)
    val fix2 = Seq((10L, "FR", 1000L)).toDF("id", "cc", "v")
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet", fix2, Seq("cc"))
    val got = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got == Set((3L, "DE", 30L), (4L, "DE", 40L), (8L, "GB", 80L),
      (9L, "US", 900L), (10L, "FR", 1000L)))
    val snap4 = VersionedTable.currentSnapshot(spark, root).get
    assert(snap4.dataDirs.exists(e => VersionedTable.isPartitionRef(e) &&
      e.endsWith("cc=DE")), s"DE ref must survive overwrite #2: ${snap4.dataDirs}")
    assert(!snap4.dataDirs.exists(e => e.endsWith("cc=FR") &&
      VersionedTable.isPartitionRef(e)), s"FR ref must drop: ${snap4.dataDirs}")
  }

  test("multi-column partitioning and escaped values classify correctly") {
    val root = tmpRoot("graft_po3")
    val base = Seq((1L, "a b", 2024, 10L), (2L, "x=y", 2024, 20L), (3L, "a b", 2025, 30L))
      .toDF("id", "name", "yr", "v")
    VersionedTable.commit(spark, root, "parquet", _ => base, partitionBy = Seq("name", "yr"))
    val fix = Seq((4L, "a b", 2024, 400L)).toDF("id", "name", "yr", "v")
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet", fix, Seq("name", "yr"))
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val refs = snap.dataDirs.filter(VersionedTable.isPartitionRef)
    assert(refs.size == 2, s"two untouched leaves must carry: ${snap.dataDirs}")
    val got = VersionedTable.read(spark, root)
      .select("id", "name", "yr", "v").as[(Long, String, Int, Long)].collect().toSet
    assert(got == Set((2L, "x=y", 2024, 20L), (3L, "a b", 2025, 30L), (4L, "a b", 2024, 400L)))
  }

  test("int partition values match through the cast-string domain") {
    val root = tmpRoot("graft_po4")
    val base = Seq((1L, 7, 10L), (2L, 8, 20L)).toDF("id", "bucket", "v")
    VersionedTable.commit(spark, root, "parquet", _ => base, partitionBy = Seq("bucket"))
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((3L, 7, 300L)).toDF("id", "bucket", "v"), Seq("bucket"))
    val got = VersionedTable.read(spark, root)
      .select("id", "bucket", "v").as[(Long, Int, Long)].collect().toSet
    assert(got == Set((2L, 8, 20L), (3L, 7, 300L)))
    assert(VersionedTable.currentSnapshot(spark, root).get.dataDirs
      .exists(e => VersionedTable.isPartitionRef(e) && e.endsWith("bucket=8")))
  }

  test("unclassifiable layout (flat base dir) falls back to a sound full rewrite") {
    val root = tmpRoot("graft_po5")
    // base committed UNPARTITIONED; overwrite asks for cc partitioning
    VersionedTable.commit(spark, root, "parquet", _ => seed)
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((7L, "DE", 700L)).toDF("id", "cc", "v"), Seq("cc"))
    val got = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "US", 10L), (2L, "US", 20L), (5L, "FR", 50L),
      (6L, "FR", 60L), (7L, "DE", 700L)))
    // full rewrite: no refs in the new manifest
    assert(VersionedTable.currentSnapshot(spark, root).get.dataDirs
      .forall(e => !VersionedTable.isFileRef(e)))
  }

  test("null partition value is refused loudly") {
    val root = tmpRoot("graft_po6")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    val bad = Seq((7L, null.asInstanceOf[String], 700L)).toDF("id", "cc", "v")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitPartitionOverwrite(spark, root, "parquet", bad, Seq("cc"))
    }
    assert(e.getMessage.contains("null partition value"))
  }

  test("DSv2 flat file enumeration refuses partition refs loudly") {
    val root = tmpRoot("graft_po7")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((7L, "DE", 700L)).toDF("id", "cc", "v"), Seq("cc"))
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val e = intercept[UnsupportedOperationException] {
      VersionedTable.entryFiles(spark, root, snap.dataDirs)
    }
    assert(e.getMessage.contains("partition subtree"))
  }

  test("additive schema evolution: a new column in the overwrite batch null-fills carried slices") {
    val root = tmpRoot("graft_po9")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    val fix = Seq((7L, "DE", 700L, "new-col")).toDF("id", "cc", "v", "extra")
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet", fix, Seq("cc"))
    val got = VersionedTable.read(spark, root)
      .select("id", "cc", "v", "extra").collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("extra"))).toMap
    assert(got(7L).contains("new-col"))
    assert(got(1L).isEmpty && got(5L).isEmpty, "carried partitions read the new column as null")
    assert(got.size == 5)
  }

  test("delete on a hive-partitioned table prunes at leaf level and keeps the layout") {
    val root = tmpRoot("graft_po10")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    VersionedTable.commitDelete(spark, root, "id = 3")
    val snap = VersionedTable.currentSnapshot(spark, root).get
    // per-leaf stats prove most leaves hold no id=3: they carry as
    // file refs THROUGH their partition subdirs
    val carried = snap.dataDirs.filter(VersionedTable.isFileRef)
    assert(carried.nonEmpty && carried.forall(_.contains("cc=")),
      s"untouched leaves must carry by reference with their partition path: ${snap.dataDirs}")
    // any replacement dir (detected layout) stays hive-partitioned; a
    // touched leaf whose every row died writes nothing and is dropped
    // from the manifest instead of landing as an unreadable empty dir
    snap.dataDirs.filterNot(VersionedTable.isFileRef).foreach { newDir =>
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(root, newDir))
        .anyMatch(p => p.getFileName.toString.startsWith("cc=")),
        s"the replacement dir must keep the detected hive layout: $newDir")
    }
    val got = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got == seed.as[(Long, String, Long)].collect().toSet.filterNot(_._1 == 3L))
    // compaction folds the refs; a later partition overwrite prunes again
    VersionedTable.compact(spark, root, partitionBy = Seq("cc"))
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((9L, "FR", 900L)).toDF("id", "cc", "v"), Seq("cc"))
    assert(VersionedTable.currentSnapshot(spark, root).get.dataDirs
      .exists(VersionedTable.isPartitionRef),
      "partition pruning must resume after compaction")
    val got2 = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got2 == got.filterNot(_._2 == "FR") + ((9L, "FR", 900L)))
  }

  test("vacuum keeps parent dirs pinned by partition refs; compact folds refs away") {
    val root = tmpRoot("graft_po8")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    val v1dir = VersionedTable.currentSnapshot(spark, root).get.dataDirs.head
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((7L, "DE", 700L)).toDF("id", "cc", "v"), Seq("cc"))
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, v1dir)),
      "v1's dir holds carried partitions and must survive vacuum")
    val got = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got.size == 5 && got.contains((7L, "DE", 700L)))

    // compact folds the refs into one fresh dir; a later vacuum retires v1's dir
    VersionedTable.compact(spark, root, partitionBy = Seq("cc"))
    assert(VersionedTable.currentSnapshot(spark, root).get.dataDirs
      .forall(e => !VersionedTable.isFileRef(e)))
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, v1dir)),
      "after compaction nothing references v1's dir")
    val got2 = VersionedTable.read(spark, root)
      .select("id", "cc", "v").as[(Long, String, Long)].collect().toSet
    assert(got2 == got)
  }

  test("partition-overwrite dirs get a stats sidecar so later pruned commits can skip them") {
    val root = tmpRoot("graft_posc")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      Seq((7L, "DE", 700L)).toDF("id", "cc", "v"), Seq("cc"))
    val poDir = VersionedTable.currentSnapshot(spark, root).get.dataDirs
      .filterNot(VersionedTable.isFileRef).head
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, poDir, FileStats.SidecarName)),
      s"every commit path must write $poDir/${FileStats.SidecarName} — without it " +
        "later merges rewrite the whole dir and reads cannot data-skip it")
    // and the sidecar actually enables pruning: a delete touching only
    // id=7 must carry the overwrite dir's other content by reference
    VersionedTable.commitDelete(spark, root, "id = 7")
    assert(VersionedTable.read(spark, root).count() == 4L)
  }

  test("commits record the #layout marker; delete keeps the layout via it; legacy walks") {
    val root = tmpRoot("graft_polay")
    VersionedTable.commit(spark, root, "parquet", _ => seed, partitionBy = Seq("cc"))
    def pointer(v: Long): java.nio.file.Path =
      java.nio.file.Paths.get(root, "_manifest", f"v$v%010d")
    def pointerText(v: Long): String =
      new String(java.nio.file.Files.readAllBytes(pointer(v)), "UTF-8")
    assert(pointerText(1).contains("#layout=cc"),
      s"commit must record its partition columns: ${pointerText(1)}")
    // delete resolves the layout from the marker (no directory walk)
    // and keeps it through the rewrite
    VersionedTable.commitDelete(spark, root, "id = 3")
    assert(pointerText(2).contains("#layout=cc"), pointerText(2))
    val got = VersionedTable.read(spark, root)
      .select("id", "cc").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "US"), (2L, "US"), (4L, "DE"), (5L, "FR"), (6L, "FR")))
    assert(VersionedTable.read(spark, root).schema.fieldNames.contains("cc"))

    // legacy pointer (no marker): the walk fallback still detects the
    // layout and the next delete keeps it
    val legacy = pointerText(2).linesIterator.filterNot(_.startsWith("#layout=")).mkString("\n")
    java.nio.file.Files.delete(pointer(2))
    java.nio.file.Files.write(pointer(2), legacy.getBytes("UTF-8"))
    VersionedTable.commitDelete(spark, root, "id = 4")
    val got3 = VersionedTable.read(spark, root)
      .select("id", "cc").as[(Long, String)].collect().toSet
    assert(got3 == Set((1L, "US"), (2L, "US"), (5L, "FR"), (6L, "FR")))
    assert(pointerText(3).contains("#layout=cc"),
      s"the post-legacy commit must re-record the marker: ${pointerText(3)}")
    // flat tables record an EMPTY marker (distinguishable from legacy)
    val flat = tmpRoot("graft_polay2")
    VersionedTable.commit(spark, flat, "parquet", _ => seed)
    val fp = java.nio.file.Paths.get(flat, "_manifest", "v0000000001")
    assert(new String(java.nio.file.Files.readAllBytes(fp), "UTF-8")
      .linesIterator.exists(_ == "#layout="), "flat commits record #layout=")
  }

  test("overwrite of an empty source on a nonexistent table commits a READABLE empty v1") {
    val root = tmpRoot("graft_poe")
    val v = VersionedTable.commitPartitionOverwrite(spark, root, "parquet",
      seed.limit(0), Seq("cc"))
    assert(v == 1L)
    // a partitioned 0-row write emits no files; the no-op path must
    // commit a flat schema-bearing file or every later read dies in
    // parquet schema inference
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("id", "cc", "v"))
  }
}
