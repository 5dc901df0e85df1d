package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Branches (zero-copy writable clones inside one table root):
  * two-way isolation, zero-copy fork semantics, publish fast-forward,
  * vacuum protection of branch-referenced dirs, drop + reclaim, the
  * guard rails (duplicate/illegal names, branch-of-branch, vacuum and
  * catalog-view refusals), restore on a branch, and layout carry-over
  * on partitioned tables.
  */
class BranchSuite extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def ids(root: String): Seq[Long] =
    VersionedTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq

  test("branch forks zero-copy, writes are isolated both ways, publish fast-forwards main") {
    val root = tmp("branch_basic")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), compactAfter = Int.MaxValue)
    val bv = VersionedTable.createBranch(spark, root, "exp")
    assert(bv == 1L)
    val bRoot = VersionedTable.branchRoot(root, "exp")
    // fork point: branch reads main's snapshot, by reference (same dirs)
    assert(ids(bRoot) == Seq(1L, 2L))
    assert(VersionedTable.currentSnapshot(spark, bRoot).get.dataDirs ==
      VersionedTable.currentSnapshot(spark, root).get.dataDirs)
    // branch write invisible on main; main write invisible on branch
    VersionedTable.commitDelta(spark, bRoot, "parquet",
      Seq((3L, "c")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((9L, "z")).toDF("id", "v"), compactAfter = Int.MaxValue)
    assert(ids(bRoot) == Seq(1L, 2L, 3L))
    assert(ids(root) == Seq(1L, 2L, 9L))
    assert(VersionedTable.listBranches(spark, root) == Seq("exp"))
    // branch history/time-travel are its own sequence
    assert(VersionedTable.history(spark, bRoot).map(_.version) == Seq(1L, 2L))
    assert(VersionedTable.readVersion(spark, bRoot, 1L).count() == 2)
    // FORK-POINT GUARD: main advanced past the fork (the 9L commit the
    // branch audit never saw) — publish must REFUSE, not silently
    // revert it (the Iceberg fast-forward contract)
    val refused = intercept[IllegalStateException] {
      VersionedTable.publishBranch(spark, root, "exp")
    }
    assert(refused.getMessage.contains("advanced past the fork point"))
    assert(ids(root) == Seq(1L, 2L, 9L)) // refusal left main untouched
    // force: the operator re-audited against the new main and accepts
    // last-writer-wins — main's head becomes the branch's snapshot
    val pub = VersionedTable.publishBranch(spark, root, "exp", force = true)
    assert(ids(root) == Seq(1L, 2L, 3L))
    // a publish span is a REWRITE for delta readers (main's 9L vanished)
    assert(VersionedTable.appendedFilesBetween(spark, root, pub - 1, pub).isEmpty)
    // re-publishing an already-published branch mints no new version
    // (the no-op check runs before the guard)
    assert(VersionedTable.publishBranch(spark, root, "exp") == pub)
  }

  test("publish succeeds without force when main never advanced past the fork") {
    val root = tmp("branch_ff")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "clean")
    val bRoot = VersionedTable.branchRoot(root, "clean")
    VersionedTable.commitDelta(spark, bRoot, "parquet",
      Seq((2L, "b")).toDF("id", "v"), compactAfter = Int.MaxValue)
    val pub = VersionedTable.publishBranch(spark, root, "clean")
    assert(pub == 2L)
    assert(ids(root) == Seq(1L, 2L))
  }

  test("rebase replays an append-only branch onto a moved main; publish then fast-forwards") {
    val root = tmp("branch_rebase")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "exp")
    val bRoot = VersionedTable.branchRoot(root, "exp")
    VersionedTable.commitDelta(spark, bRoot, "parquet",
      Seq((3L, "br")).toDF("id", "v"), compactAfter = Int.MaxValue)
    // main moves past the fork — publish refuses (pinned above); the
    // constructive path is rebase
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((9L, "main")).toDF("id", "v"), compactAfter = Int.MaxValue)
    intercept[IllegalStateException] { VersionedTable.publishBranch(spark, root, "exp") }
    val rv = VersionedTable.rebaseBranch(spark, root, "exp")
    assert(rv == 3L) // one pointer-only commit on the branch
    // the rebased branch holds main's head content PLUS its additions
    assert(ids(bRoot) == Seq(1L, 2L, 3L, 9L))
    // and the guard now passes without force: nothing is reverted
    val pub = VersionedTable.publishBranch(spark, root, "exp")
    assert(ids(root) == Seq(1L, 2L, 3L, 9L))
    // re-rebase onto the just-published head is a no-op (fork == head)
    assert(VersionedTable.rebaseBranch(spark, root, "exp") == rv)
    // SQL face
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((20L, "m2")).toDF("id", "v"), compactAfter = Int.MaxValue)
    val row = spark.sql(s"GRAFT_REBASE('$root', 'exp')").collect().head
    assert(row.getString(0) == "exp" && row.getLong(1) == rv + 1)
    assert(ids(bRoot) == Seq(1L, 2L, 3L, 9L, 20L))
  }

  test("rebase refuses non-append-only branch spans and layout drift") {
    val root = tmp("branch_rebase_rw")
    VersionedTable.commitDelta(spark, root, "parquet",
      (1L to 6L).map(i => (i, "base")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "del")
    val bRoot = VersionedTable.branchRoot(root, "del")
    VersionedTable.commitDelete(spark, bRoot, "id > 4") // rewrites inherited data
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((9L, "main")).toDF("id", "v"), compactAfter = Int.MaxValue)
    val e = intercept[UnsupportedOperationException] {
      VersionedTable.rebaseBranch(spark, root, "del")
    }
    assert(e.getMessage.contains("not append-only"))
    assert(ids(bRoot) == (1L to 4L)) // refusal left the branch untouched
  }

  test("branch mutations (merge/delete) stay off main; incremental reads work per-branch") {
    val root = tmp("branch_mut")
    VersionedTable.commitDelta(spark, root, "parquet",
      (1L to 10L).map(i => (i, "base")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "fix")
    val bRoot = VersionedTable.branchRoot(root, "fix")
    VersionedTable.commitDelete(spark, bRoot, "id > 8")
    val bv = VersionedTable.currentSnapshot(spark, bRoot).get.version
    VersionedTable.commitDelta(spark, bRoot, "parquet",
      Seq((11L, "fix")).toDF("id", "v"), compactAfter = Int.MaxValue)
    assert(ids(bRoot) == ((1L to 8L) :+ 11L))
    assert(ids(root) == (1L to 10L))
    // changesSince on the branch sees exactly the branch's append
    val delta = VersionedTable.changesSince(spark, bRoot, bv)
      .select("id").as[Long].collect().toSeq
    assert(delta == Seq(11L))
  }

  test("vacuum keeps every branch-referenced dir alive; dropBranch + vacuum reclaims") {
    val root = tmp("branch_vac")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "keepme")
    val bRoot = VersionedTable.branchRoot(root, "keepme")
    VersionedTable.commitDelta(spark, bRoot, "parquet",
      Seq((2L, "b")).toDF("id", "v"), compactAfter = Int.MaxValue)
    // main moves on: a full rewrite orphans v1's dir FROM MAIN'S view
    VersionedTable.commit(spark, root, "parquet",
      _ => Seq((9L, "z")).toDF("id", "v"))
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0)
    // the branch still reads its whole snapshot: its dirs survived
    assert(ids(bRoot) == Seq(1L, 2L))
    assert(ids(root) == Seq(9L))
    // drop, then vacuum reclaims the branch-only dirs
    assert(VersionedTable.dropBranch(spark, root, "keepme"))
    assert(!VersionedTable.dropBranch(spark, root, "keepme")) // idempotent
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0)
    assert(VersionedTable.listBranches(spark, root).isEmpty)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("data-"))
    assert(dataDirs.length == 1, s"only main's live dir survives: ${dataDirs.mkString(",")}")
  }

  test("guard rails: duplicate name, illegal name, branch-of-branch, vacuum/view refusals") {
    val root = tmp("branch_guard")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "dup")
    intercept[IllegalArgumentException] {
      VersionedTable.createBranch(spark, root, "dup")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.createBranch(spark, root, "bad/name")
    }
    val bRoot = VersionedTable.branchRoot(root, "dup")
    intercept[IllegalArgumentException] {
      VersionedTable.branchRoot(bRoot, "nested")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.vacuum(spark, bRoot, keep = 1, graceMs = 0)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.syncCatalogView(spark, "some_view", bRoot)
    }
    // branching from a vacuumed version refuses
    VersionedTable.commit(spark, root, "parquet", _ => Seq((2L, "b")).toDF("id", "v"))
    VersionedTable.dropBranch(spark, root, "dup")
    VersionedTable.vacuum(spark, root, keep = 1, graceMs = 0)
    intercept[IllegalArgumentException] {
      VersionedTable.createBranch(spark, root, "late", fromVersion = Some(1L))
    }
  }

  test("DSv2 face rides branches: format(\"graft\") read/write and time travel on root#branch=") {
    val root = tmp("branch_dsv2")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("id", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "exp")
    val bRoot = VersionedTable.branchRoot(root, "exp")
    // DSv2 append onto the branch; main untouched
    Seq((2L, "b")).toDF("id", "v").write.format("graft").mode("append").save(bRoot)
    assert(spark.read.format("graft").load(bRoot)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(spark.read.format("graft").load(root)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // branch time travel through the DSv2 option
    assert(spark.read.format("graft").option("versionAsOf", "1").load(bRoot).count() == 1L)
    // filters still push into the branch scan (manifest-planned file index)
    val p = spark.read.format("graft").load(bRoot).where(col("id") === 2L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]") ||
      p.contains("PushedFilters: [EqualTo(id,2), IsNotNull(id)]"), p)
  }

  test("Writer sinks ride branches: path writes land on the branch; table sinks refuse up front") {
    val root = tmp("branch_writer")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("hash_key", "v"), compactAfter = Int.MaxValue)
    VersionedTable.createBranch(spark, root, "exp")
    val bRoot = VersionedTable.branchRoot(root, "exp")
    // a YAML-shaped versioned sink pointed at the branch: upsert lands there
    Writer.write(spark, Seq((1L, "a2"), (2L, "b")).toDF("hash_key", "v"),
      SinkSpec(bRoot, mode = MergeUpsert, versioned = true))
    val branchRows = VersionedTable.read(spark, bRoot)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(branchRows == Map(1L -> "a2", 2L -> "b"))
    assert(VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "a"))
    // table: + branch refuses BEFORE committing anything
    val before = VersionedTable.currentSnapshot(spark, bRoot).get.version
    val e = intercept[IllegalArgumentException] {
      Writer.write(spark, Seq((3L, "c")).toDF("hash_key", "v"),
        SinkSpec(bRoot, mode = MergeUpsert, versioned = true, table = Some("some_table")))
    }
    assert(e.getMessage.contains("MAIN"), e.getMessage)
    assert(VersionedTable.currentSnapshot(spark, bRoot).get.version == before,
      "the refusal must land before any commit")
  }

  test("CLI branch commands: branch / branches / publish / drop-branch round trip") {
    val root = tmp("branch_cli")
    VersionedTable.commitDelta(spark, root, "parquet",
      Seq((1L, "a")).toDF("id", "v"), compactAfter = Int.MaxValue)
    graft.Cli.executeTable(spark, "branch", root, List("--name", "exp"))
    assert(VersionedTable.listBranches(spark, root) == Seq("exp"))
    graft.Cli.executeTable(spark, "branches", root, Nil) // prints, must not throw
    VersionedTable.commitDelta(spark, VersionedTable.branchRoot(root, "exp"), "parquet",
      Seq((2L, "b")).toDF("id", "v"), compactAfter = Int.MaxValue)
    graft.Cli.executeTable(spark, "publish", root, List("--name", "exp"))
    assert(ids(root) == Seq(1L, 2L))
    graft.Cli.executeTable(spark, "drop-branch", root, List("--name", "exp"))
    assert(VersionedTable.listBranches(spark, root).isEmpty)
  }

  test("restore works on a branch; partitioned layout carries through branch and publish") {
    val root = tmp("branch_part")
    val df = Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "p")
    VersionedTable.commit(spark, root, "parquet", _ => df, partitionBy = Seq("p"))
    VersionedTable.createBranch(spark, root, "exp")
    val bRoot = VersionedTable.branchRoot(root, "exp")
    VersionedTable.commitDelta(spark, bRoot, "parquet",
      Seq((3L, "z", "p1")).toDF("id", "v", "p"),
      partitionBy = Seq("p"), compactAfter = Int.MaxValue)
    // partition column reads back on the branch (layout marker carried)
    val byPart = VersionedTable.read(spark, bRoot).groupBy("p").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPart == Map("p1" -> 2L, "p2" -> 1L))
    // roll the branch back to its fork point — main untouched
    VersionedTable.restore(spark, bRoot, 1L)
    assert(VersionedTable.read(spark, bRoot).count() == 2)
    assert(VersionedTable.read(spark, root).count() == 2)
    // forward again and publish: main gets the branch rows AND the layout
    VersionedTable.restore(spark, bRoot, 2L)
    VersionedTable.publishBranch(spark, root, "exp")
    val mainByPart = VersionedTable.read(spark, root).groupBy("p").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mainByPart == Map("p1" -> 2L, "p2" -> 1L))
    // partition pruning still answers on the published main
    assert(VersionedTable.read(spark, root).where(col("p") === "p1").count() == 2)
  }
}
