package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VersionedTable.diffVersions — the manifest-driven CDC path choice:
  * O(delta) projection for append-only spans, full keyed
  * reconciliation when any commit in the span rewrote directories.
  */
class DiffVersionsSuite extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  private def write(df: org.apache.spark.sql.DataFrame, root: String, mode: WriteMode) =
    Writer.write(spark, df, SinkSpec(root, mode = mode, versioned = true))

  test("append-only span takes the O(delta) fast path: no join, rows = the delta") {
    val root = tmpRoot("graft_diffv_app")
    write(Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "v"), root, Overwrite)
    write(Seq((3L, "c", 30)).toDF("k", "s", "v"), root, Append)
    write(Seq((4L, "d", 40)).toDF("k", "s", "v"), root, Append)
    val diff = VersionedTable.diffVersions(spark, root, 1L, 3L, Seq("k"), Seq("s", "v"))
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"append-only diff must not join:\n$plan")
    val rows = diff.orderBy("k").collect()
    assert(rows.map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"),
      r.getAs[String]("changed_cols"), r.getAs[String]("old_s"), r.getAs[String]("new_s"))).toSeq ==
      Seq((3L, "added", null, null, "c"), (4L, "added", null, null, "d")))
    // schema identical to the general path's output
    assert(diff.columns.toSeq ==
      Seq("k", "change_type", "changed_cols", "old_s", "new_s", "old_v", "new_v"))
  }

  test("a rewrite inside the span routes to the full reconciliation") {
    val root = tmpRoot("graft_diffv_rw")
    write(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v"), root, Overwrite)
    // v2 overwrite: drop k=3, change k=2, add k=4
    write(Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40)).toDF("k", "s", "v"), root, Overwrite)
    val got = VersionedTable.diffVersions(spark, root, 1L, 2L, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("change_type"), r.getAs[String]("changed_cols"))).toMap
    assert(got == Map(
      2L -> (("changed", "s")),
      3L -> (("removed", null)),
      4L -> (("added", null))))
  }

  test("bounded auto-compaction keeps the fast path: fold marker recovers the delta dir") {
    val root = tmpRoot("graft_diffv_fold")
    def append(rows: Seq[(Long, String, Int)]) =
      VersionedTable.commitDelta(spark, root, "parquet", rows.toDF("k", "s", "v"),
        compactAfter = 2)
    append(Seq((1L, "a", 10)))
    append(Seq((2L, "b", 20))) // v2: two dirs
    append(Seq((3L, "c", 30))) // v3: FOLD (compactAfter=2 exceeded)
    val diff = VersionedTable.diffVersions(spark, root, 1L, 3L, Seq("k"), Seq("s", "v"))
    assert(!diff.queryExecution.executedPlan.toString.contains("Join"))
    assert(diff.orderBy("k").collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSeq ==
      Seq((2L, "added"), (3L, "added")))
  }

  test("fast path and general path agree on an append-only span") {
    val root = tmpRoot("graft_diffv_eq")
    write(Seq((1L, "a", 10)).toDF("k", "s", "v"), root, Overwrite)
    write(Seq((2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v"), root, Append)
    val fast = VersionedTable.diffVersions(spark, root, 1L, 2L, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(_.toSeq)
    val general = graft.operators.Relational.snapshotDiff(
        VersionedTable.readVersion(spark, root, 1L),
        VersionedTable.readVersion(spark, root, 2L), Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(_.toSeq)
    assert(fast.toSeq == general.toSeq)
  }
}
