package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-pruned MERGE ([[VersionedTable.commitMerge]]) and manifest-level
  * data skipping ([[VersionedTable.readPruned]]): per-file min/max
  * stats classify files as touched/untouched, untouched files carry
  * over in the next manifest BY REFERENCE (byte-identical, zero data
  * I/O), and reads open only range-intersecting files.
  */
class PrunedMergeSuite extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  /** md5 of a file's bytes. */
  private def digest(p: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(java.nio.file.Files.readAllBytes(p))
    md.digest().map("%02x".format(_)).mkString
  }

  private def dataFiles(root: String, dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(root, dir)).iterator().asScala
      .filter(p => !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .toSeq.sortBy(_.getFileName.toString)
  }

  private def base8 = spark.range(0, 8000)
    .select(col("id").as("k"), (col("id") * 2).as("v"), lit("base").as("src"))

  /** v1 = 8 range-clustered files over k ∈ [0, 8000). */
  private def seedTable(root: String): String = {
    VersionedTable.commit(spark, root, "parquet",
      _ => base8.repartitionByRange(8, col("k")).sortWithinPartitions("k"))
    VersionedTable.currentSnapshot(spark, root).get.dataDirs.head
  }

  test("commitMerge rewrites only key-intersecting files; the rest carry over byte-identical") {
    val root = tmpRoot("graft_pm")
    val v1dir = seedTable(root)
    val before = dataFiles(root, v1dir).map(p => p.getFileName.toString -> digest(p)).toMap
    assert(before.size == 8, s"seed should write 8 files, got ${before.size}")

    // updates hit only keys < 500 (the lowest file); inserts are brand-new keys
    val source = (0L until 500L).map(k => (k, k * 10, "fix")).toDF("k", "v", "src")
      .union((100000L until 100010L).map(k => (k, -k, "new")).toDF("k", "v", "src"))
    val v2 = VersionedTable.commitMerge(spark, root, "parquet", source, Seq("k"))
    assert(v2 == 2L)

    val snap2 = VersionedTable.currentSnapshot(spark, root).get
    val carried = snap2.dataDirs.filter(VersionedTable.isFileRef)
    val newDirs = snap2.dataDirs.filterNot(VersionedTable.isFileRef)
    assert(newDirs.size == 1, s"exactly one rewritten dir expected: ${snap2.dataDirs}")
    assert(carried.size == 7,
      s"7 of 8 range-clustered files must carry over untouched: $carried")
    // carried refs point into the ORIGINAL v1 directory, bytes unchanged
    carried.foreach { ref =>
      assert(ref.startsWith(v1dir + "/"), s"carry-over must reference the v1 dir: $ref")
      val name = ref.substring(ref.indexOf('/') + 1)
      assert(digest(java.nio.file.Paths.get(root, v1dir, name)) == before(name),
        s"carried file $name must be byte-identical")
    }

    // read-back equals the upsert semantics exactly
    val got = VersionedTable.read(spark, root)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"), r.getAs[String]("src")))
      .sortBy(_._1)
    val expected = ((500L until 8000L).map(k => (k, k * 2, "base")) ++
      (0L until 500L).map(k => (k, k * 10, "fix")) ++
      (100000L until 100010L).map(k => (k, -k, "new"))).sortBy(_._1)
    assert(got.length == expected.length)
    assert(got.toSeq == expected)

    // time travel to v1 still intact
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 8000L)

    // vacuum keep=1 must NOT reclaim the v1 dir — its files are still
    // referenced at file granularity
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, v1dir)))
    assert(VersionedTable.read(spark, root).count() == 8010L)

    // a merge span is a rewrite for delta-maintenance readers
    assert(VersionedTable.appendedDirsBetween(spark, root, 1L, 2L).isEmpty ||
      VersionedTable.commitKindOf(spark, root, 2L).contains("merge"))
    assert(VersionedTable.commitKindOf(spark, root, 2L).contains("merge"))

    // compact folds the file refs into one dir; a later vacuum then
    // reclaims the partially-dead v1 dir
    VersionedTable.compact(spark, root)
    val snap3 = VersionedTable.currentSnapshot(spark, root).get
    assert(!snap3.dataDirs.exists(VersionedTable.isFileRef))
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, v1dir)),
      "after compaction nothing references v1's dir — vacuum must reclaim it")
    assert(VersionedTable.read(spark, root).count() == 8010L)
  }

  test("inserts-only merge touches zero files; repeated merges stack file refs correctly") {
    val root = tmpRoot("graft_pm_ins")
    val v1dir = seedTable(root)
    // all source keys beyond every file's max: nothing to rewrite
    val inserts = (900000L until 900005L).map(k => (k, k, "new")).toDF("k", "v", "src")
    VersionedTable.commitMerge(spark, root, "parquet", inserts, Seq("k"))
    val snap2 = VersionedTable.currentSnapshot(spark, root).get
    assert(snap2.dataDirs.contains(v1dir),
      "an untouched dir carries over as the ORIGINAL dir entry, not file refs")
    assert(VersionedTable.read(spark, root).count() == 8005L)
    // second merge updates one old key: the v1 dir now decomposes
    val fix = Seq((42L, 0L, "fix2")).toDF("k", "v", "src")
    VersionedTable.commitMerge(spark, root, "parquet", fix, Seq("k"))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 8005L)
    assert(got.where(col("k") === 42L).head().getAs[String]("src") == "fix2")
    assert(got.where(col("src") === "new").count() == 5L)
  }

  test("missing sidecar degrades to full rewrite, never wrong answers") {
    val root = tmpRoot("graft_pm_nostats")
    val v1dir = seedTable(root)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, v1dir, FileStats.SidecarName))
    val source = Seq((1L, 111L, "fix")).toDF("k", "v", "src")
    VersionedTable.commitMerge(spark, root, "parquet", source, Seq("k"))
    val snap2 = VersionedTable.currentSnapshot(spark, root).get
    // without stats every file is conservatively touched → no carry-over
    assert(!snap2.dataDirs.exists(_.startsWith(v1dir + "/")))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 8000L)
    assert(got.where(col("k") === 1L).head().getAs[Long]("v") == 111L)
  }

  test("hive-partitioned snapshot merges with LEAF-FILE pruning; partition columns survive") {
    val root = tmpRoot("graft_pm_hive")
    // key ranges disjoint per partition so per-leaf stats can prune
    VersionedTable.commit(spark, root, "parquet",
      _ => Seq((1L, "a", 1L), (2L, "a", 2L), (100L, "b", 3L), (101L, "b", 4L))
        .toDF("k", "part", "v"),
      partitionBy = Seq("part"))
    val source = Seq((100L, "b", 30L)).toDF("k", "part", "v")
    VersionedTable.commitMerge(spark, root, "parquet", source, Seq("k"),
      partitionBy = Seq("part"))
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val carried = snap.dataDirs.filter(VersionedTable.isFileRef)
    assert(carried.exists(_.contains("part=a")),
      s"part=a's leaves prove no source key and must carry by reference: ${snap.dataDirs}")
    assert(!VersionedTable.readVersion(spark, root, 2L).columns.isEmpty)
    // ONLY the leaf holding k=100 rewrote — every other leaf file
    // (including k=101's within the SAME partition) carried over
    assert(snap.dataDirs.count(e => !VersionedTable.isFileRef(e)) == 1,
      s"one replacement dir expected: ${snap.dataDirs}")
    // carried refs keep their partition column through the basePath read
    val got = VersionedTable.read(spark, root).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("part"), r.getAs[Long]("v"))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 1L), (2L, "a", 2L), (100L, "b", 30L), (101L, "b", 4L)))
    // the replacement dir keeps the hive layout
    val newDir = snap.dataDirs.filterNot(VersionedTable.isFileRef).last
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, newDir, "part=b")),
      s"partial rewrite must preserve partitioning: $newDir")
  }

  test("readPruned opens only range-intersecting files; filtered result matches a full scan") {
    val root = tmpRoot("graft_pm_skip")
    seedTable(root)
    // one appended delta too: pruning must work across entry kinds
    VersionedTable.commitDelta(spark, root, "parquet",
      (20000L until 21000L).map(k => (k, k, "late")).toDF("k", "v", "src"))
    val full = VersionedTable.read(spark, root).where(col("k").between(1000L, 1999L))
    val pruned = VersionedTable.readPruned(spark, root, "k", 1000L, 1999L)
      .where(col("k").between(1000L, 1999L))
    assert(pruned.collect().map(_.getAs[Long]("k")).sorted.toSeq ==
      full.collect().map(_.getAs[Long]("k")).sorted.toSeq)
    // audit: far fewer files opened than exist
    val (fs, rootP) = {
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (f, f.makeQualified(p))
    }
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val kept = VersionedTable.prunedEntries(spark, fs, rootP, snap.dataDirs, "k", 1000L, 1999L)
    // range-partition boundaries are SAMPLED, so the 1000-wide range can
    // straddle a boundary or two — but never most of the table
    assert(kept.size <= 3, s"range [1000,1999] should hit ≤3 of 9 files, got $kept")
    // a range hitting nothing reads an empty (schema-correct) frame
    assert(VersionedTable.readPruned(spark, root, "k", 5000000L, 6000000L)
      .where(col("k") >= 5000000L).count() == 0L)
  }

  test("readPruned skips leaf files INSIDE hive partitions (per-leaf sidecar stats)") {
    val root = tmpRoot("graft_pm_hiveskip")
    VersionedTable.commit(spark, root, "parquet",
      _ => spark.range(0, 4000)
        .select(col("id").as("k"), (col("id") % 4).as("p"), (col("id") * 2).as("v"))
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"),
      partitionBy = Seq("p"))
    val (fs, rootP) = {
      val pth = new org.apache.hadoop.fs.Path(root)
      val f = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (f, f.makeQualified(pth))
    }
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val all = FileStats.listLeafDataFiles(fs,
      new org.apache.hadoop.fs.Path(rootP, snap.dataDirs.head))
    val kept = VersionedTable.prunedEntries(spark, fs, rootP, snap.dataDirs, "k", 100L, 199L)
    assert(kept.forall(_.contains("p=")), s"kept refs keep partition paths: $kept")
    assert(kept.size < all.size / 2,
      s"narrow k-range must skip most leaf files: ${kept.size} of ${all.size}")
    // the pruned read returns the same rows as the full scan, with the
    // partition column intact
    // the partition column infers from the path (int): compare as long
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("p").cast("long"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val full = rows(VersionedTable.read(spark, root).where(col("k").between(100L, 199L)))
    val pruned = rows(VersionedTable.readPruned(spark, root, "k", 100L, 199L)
      .where(col("k").between(100L, 199L)))
    assert(pruned.toSeq == full.toSeq && full.length == 100)
  }

  test("commitOverwriteWhere rewrites only cond-intersecting files; the rest carry byte-identical") {
    val root = tmpRoot("graft_ow")
    val v1dir = seedTable(root)
    val before = dataFiles(root, v1dir).map(p => p.getFileName.toString -> digest(p)).toMap

    // replace the k >= 7000 span (the top range-clustered file)
    val repl = (7000L until 7500L).map(k => (k, -1L, "repl")).toDF("k", "v", "src")
    val v2 = VersionedTable.commitOverwriteWhere(spark, root, "parquet", repl, "k >= 7000")
    assert(v2 == 2L)
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val carried = snap.dataDirs.filter(VersionedTable.isFileRef)
    // range-partition boundaries are sampled: k>=7000 can straddle one
    // boundary, touching 2 files instead of 1 — but never most of them
    assert(carried.size >= 6, s"most files hold only k<7000 rows: ${snap.dataDirs}")
    carried.foreach { ref =>
      val name = ref.substring(ref.indexOf('/') + 1)
      assert(digest(java.nio.file.Paths.get(root, v1dir, name)) == before(name))
    }
    // semantics: base WHERE NOT cond ∪ source WHERE cond
    val got = VersionedTable.read(spark, root).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"), r.getAs[String]("src"))).sortBy(_._1)
    val expected = ((0L until 7000L).map(k => (k, k * 2, "base")) ++
      (7000L until 7500L).map(k => (k, -1L, "repl"))).sortBy(_._1)
    assert(got.toSeq == expected)
  }

  test("commitOverwriteWhere: AND conjuncts prune; OR and non-literal conds degrade soundly") {
    val root = tmpRoot("graft_ow2")
    seedTable(root)
    // conjunct on the clustered column prunes even with an unprunable
    // second conjunct riding along
    val repl = Seq((100L, 0L, "x")).toDF("k", "v", "src")
    VersionedTable.commitOverwriteWhere(spark, root, "parquet", repl,
      "k <= 200 AND src = 'base'")
    val snap = VersionedTable.currentSnapshot(spark, root).get
    assert(snap.dataDirs.count(VersionedTable.isFileRef) >= 6,
      s"the k<=200 conjunct must prune most of the 8 files: ${snap.dataDirs}")
    // replaceWhere semantics: the repl row has src='x', fails cond, and
    // therefore does NOT land — only the k∈[0,200] base rows vanish
    val got1 = VersionedTable.read(spark, root)
    assert(got1.count() == 8000L - 201L, s"rows after replace: ${got1.count()}")
    assert(got1.where(col("src") === "x").count() == 0L)

    // OR conditions prune per-DISJUNCT (round 12): a file is carried
    // when every disjunct's range excludes it — k=5 and k=7999 touch
    // only their two containing files
    val root2 = tmpRoot("graft_ow3")
    seedTable(root2)
    VersionedTable.commitOverwriteWhere(spark, root2, "parquet",
      Seq((5L, 5L, "y")).toDF("k", "v", "src"), "k = 5 OR k = 7999")
    val snap2 = VersionedTable.currentSnapshot(spark, root2).get
    assert(snap2.dataDirs.count(VersionedTable.isFileRef) >= 6,
      s"per-disjunct exclusion must carry the untouched files: ${snap2.dataDirs}")
    val got2 = VersionedTable.read(spark, root2)
    assert(got2.count() == 7999L)
    assert(got2.where(col("k") === 5L).head().getAs[String]("src") == "y")
    assert(got2.where(col("k") === 7999L).count() == 0L)

    // IN-lists prune via their [min,max] hull
    val root3 = tmpRoot("graft_ow_in")
    seedTable(root3)
    VersionedTable.commitDelete(spark, root3, "k IN (10, 20, 30)")
    val snap3 = VersionedTable.currentSnapshot(spark, root3).get
    assert(snap3.dataDirs.count(VersionedTable.isFileRef) >= 6,
      s"IN (10,20,30) hull must prune most files: ${snap3.dataDirs}")
    assert(VersionedTable.read(spark, root3).count() == 7997L)
  }

  test("commitDelete removes only matching rows, rewriting only intersecting files") {
    val root = tmpRoot("graft_del")
    val v1dir = seedTable(root)
    val before = dataFiles(root, v1dir).map(p => p.getFileName.toString -> digest(p)).toMap
    VersionedTable.commitDelete(spark, root, "k >= 7500")
    val snap = VersionedTable.currentSnapshot(spark, root).get
    val carried = snap.dataDirs.filter(VersionedTable.isFileRef)
    assert(carried.size >= 6, s"most files hold only k<7500 rows: ${snap.dataDirs}")
    carried.foreach { ref =>
      val name = ref.substring(ref.indexOf('/') + 1)
      assert(digest(java.nio.file.Paths.get(root, v1dir, name)) == before(name))
    }
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 7500L)
    assert(got.agg(max(col("k"))).head().getLong(0) == 7499L)
    // time travel: the deleted rows are still in v1
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 8000L)

    // a delete whose condition provably matches nothing still commits
    // a readable snapshot with every row intact
    VersionedTable.commitDelete(spark, root, "k >= 5000000")
    assert(VersionedTable.read(spark, root).count() == 7500L)
  }

  test("commitDelete keeps NULL-evaluating rows uniformly — pruned and rewritten files agree") {
    val root = tmpRoot("graft_delnull")
    // two range-clustered files on k, each with v=NULL every 10th row;
    // cond is on v: file A's v-range [1,99] is provably disjoint
    // (stats-carried by reference), file B's [1001,1099] intersects
    // (rewritten through the filter) — SQL DELETE keeps rows where the
    // condition evaluates NULL, so the NULL rows must survive in BOTH,
    // independent of which file they happened to land in.
    val df = spark.range(0, 200).select(
      col("id").as("k"),
      when(col("id") % 10 === 0, lit(null))
        .otherwise(when(col("id") < 100, col("id")).otherwise(col("id") + 900)).as("v"))
    VersionedTable.commit(spark, root, "parquet",
      _ => df.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    VersionedTable.commitDelete(spark, root, "v >= 1000")
    val snap = VersionedTable.currentSnapshot(spark, root).get
    assert(snap.dataDirs.exists(VersionedTable.isFileRef),
      s"the disjoint file must carry by reference: ${snap.dataDirs}")
    val got = VersionedTable.read(spark, root)
    // survivors: 100 rows of file A + file B's 10 NULL rows
    assert(got.count() == 110L, "NULL-evaluating rows must be KEPT (three-valued DELETE)")
    assert(got.where(col("v").isNull).count() == 20L,
      "every NULL row survives, in carried AND rewritten files alike")
    assert(got.where(col("v") >= 1000).count() == 0L)
  }

  test("string stats compare in UTF-8 byte order — supplementary-plane deletes stay correct") {
    // U+10000 encodes as UTF-8 F0 90 80 80 (> U+FFFD's EF BF BD) but as
    // the UTF-16 surrogate pair D800 DC00 (< FFFD in code-unit order).
    // Parquet footers record min/max in unsigned UTF-8 byte order, so a
    // code-unit compare would read this file's stats as min>max-style
    // nonsense and wrongly prove it disjoint from s = U+10000 —
    // carrying a row the delete must remove (wrong result, not a
    // missed prune).
    val hi = new String(Character.toChars(0x10000))
    val rep = "�"
    assert(FileStats.cmp(rep, hi) < 0, "FileStats.cmp must use UTF-8 byte order")
    val root = tmpRoot("graft_utf8")
    VersionedTable.commit(spark, root, "parquet",
      _ => Seq((1L, rep), (2L, hi)).toDF("k", "s").coalesce(1))
    VersionedTable.commitDelete(spark, root, s"s = '$hi'")
    val got = VersionedTable.read(spark, root).collect()
    assert(got.length == 1 && got.head.getString(1) == rep,
      s"the U+10000 row must be deleted; got ${got.toSeq}")
  }

  test("Writer overwrite_where on a versioned sink takes the pruned path") {
    import graft.pipeline.{OverwriteWhere, SinkSpec}
    val root = tmpRoot("graft_ow4")
    val v1dir = seedTable(root)
    Writer.write(spark,
      (6000L until 6100L).map(k => (k, 0L, "w")).toDF("k", "v", "src"),
      SinkSpec(root, mode = OverwriteWhere("k >= 6000 AND k < 6100"), versioned = true))
    val snap = VersionedTable.currentSnapshot(spark, root).get
    assert(snap.dataDirs.exists(VersionedTable.isFileRef),
      s"the Writer route must carry untouched files by reference: ${snap.dataDirs}")
    assert(snap.dataDirs.count(e => !VersionedTable.isFileRef(e)) == 1)
    assert(VersionedTable.read(spark, root).count() == 8000L)
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 8000L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, v1dir)))
  }
}
