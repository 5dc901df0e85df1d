package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Keyed snapshot reconciliation (Relational.snapshotDiff) — the CDC
  * diff behind q71/q72.
  */
class SnapshotDiffSuite extends SparkSpec {
  import spark.implicits._

  private def collectDiff(rows: Array[Row]): Map[Long, (String, String)] =
    rows.map(r => r.getAs[Long]("k") ->
      (r.getAs[String]("change_type"), r.getAs[String]("changed_cols"))).toMap

  test("snapshotDiff classifies added / removed / changed and drops unchanged") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v")
    val next = Seq((1L, "a", 10), (2L, "B", 21), (4L, "d", 40)).toDF("k", "s", "v")
    val out = Relational.snapshotDiff(base, next, Seq("k"), Seq("s", "v")).collect()
    val got = collectDiff(out)
    assert(got.keySet == Set(2L, 3L, 4L)) // key 1 unchanged → dropped
    assert(got(2L) == (("changed", "s,v"))) // both columns, compare order
    assert(got(3L)._1 == "removed" && got(3L)._2 == null)
    assert(got(4L)._1 == "added" && got(4L)._2 == null)
    // old/new pairs carry the values (null on the absent side)
    val r4 = out.find(_.getAs[Long]("k") == 4L).get
    assert(r4.getAs[String]("old_s") == null && r4.getAs[String]("new_s") == "d")
    val r3 = out.find(_.getAs[Long]("k") == 3L).get
    assert(r3.getAs[String]("old_s") == "c" && r3.getAs[String]("new_s") == null)
  }

  test("snapshotDiff is null-safe: null values compare equal, null→value is a change") {
    val base = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("x")))
      .toDF("k", "s")
    val next = Seq((1L, Option.empty[String]), (2L, Some("now")), (3L, Option.empty[String]))
      .toDF("k", "s")
    val got = collectDiff(
      Relational.snapshotDiff(base, next, Seq("k"), Seq("s")).collect())
    assert(got.keySet == Set(2L, 3L)) // 1: null <=> null → unchanged
    assert(got(2L) == (("changed", "s")))
    assert(got(3L) == (("changed", "s")))
  }

  test("snapshotDiff with empty compare list reduces to key presence") {
    val base = Seq((1L, 1), (2L, 2)).toDF("k", "v")
    val next = Seq((2L, 99), (3L, 3)).toDF("k", "v")
    val got = collectDiff(
      Relational.snapshotDiff(base, next, Seq("k"), Seq.empty).collect())
    assert(got == Map(1L -> (("removed", null)), 3L -> (("added", null))))
  }

  test("snapshotDiff composite keys partition the match correctly") {
    val base = Seq((1L, "us", 10), (1L, "eu", 20)).toDF("k", "region", "v")
    val next = Seq((1L, "us", 11), (1L, "apac", 30)).toDF("k", "region", "v")
    val out = Relational.snapshotDiff(base, next, Seq("k", "region"), Seq("v"))
      .orderBy("region").collect()
    assert(out.map(r => (r.getAs[String]("region"), r.getAs[String]("change_type"))).toSeq ==
      Seq(("apac", "added"), ("eu", "removed"), ("us", "changed")))
  }

  test("snapshotDiff plans one full-outer sort-merge join, no nested loop") {
    val base = Seq((1L, 10)).toDF("k", "v")
    val next = Seq((1L, 11)).toDF("k", "v")
    val plan = Relational.snapshotDiff(base, next, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    // AQE may choose shuffled-hash over sort-merge for tiny inputs;
    // both are the single-shuffle keyed plan. The failure mode guarded
    // against is the O(n·m) nested loop.
    assert(plan.contains("FullOuter"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
