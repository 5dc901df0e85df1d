package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bounds and exact-regime pins for the native space-saving top-k
  * aggregate (graftbridge.SpaceSavingTopK).
  */
class SpaceSavingSuite extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, col0: String, cap: Int) =
    df.agg(VectorFunctions.spaceSavingTopK(col(col0), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.cnt").as("cnt"), col("e.err").as("err"))

  test("exact regime: distinct <= capacity reproduces groupBy counts with err = 0") {
    val df = spark.range(10000L).select((col("id") % 37).cast("string").as("v"))
      .repartition(7) // force partial buffers + merges
    val got = sketch(df, "v", 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, n) =>
      assert(got(k)._1 == n, s"count for $k")
      assert(got(k)._2 == 0L, s"err for $k")
    }
  }

  test("approximate regime: space-saving bounds hold under merge") {
    // Zipf-ish: value v appears ~N/v times; 200 distinct, capacity 16.
    val rows = (1 to 200).flatMap(v => Seq.fill(2000 / v)(v.toString))
    val n = rows.size.toLong
    val cap = 16
    val df = rows.toDF("v").repartition(5)
    val got = sketch(df, "v", cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // summary size bounded by capacity
    assert(got.length <= cap)
    got.foreach { case (item, cnt, err) =>
      val t = truth(item)
      assert(cnt >= t, s"$item: estimate $cnt undercounts true $t")
      assert(cnt - t <= n / cap + 1, s"$item: overestimate ${cnt - t} exceeds n/capacity")
      assert(err <= n / cap + 1, s"$item: err bound")
    }
    // every heavy hitter (freq > 2n/cap, comfortably above the bound)
    // is tracked and ranks in the top of the sketch
    val tracked = got.map(_._1).toSet
    truth.filter(_._2 > 2 * n / cap).keys.foreach { h =>
      assert(tracked(h), s"heavy hitter $h missing from sketch")
    }
    // counter mass: the top-capacity counters hold most of the stream,
    // and the guaranteed lower bounds (cnt - err <= true) stay below it
    assert(got.map(_._2).sum >= n / 2)
    assert(got.map(x => x._2 - x._3).sum <= n)
  }

  test("grouped sketches: per-group state is independent") {
    val df = spark.range(3000L).select(
      (col("id") % 3).as("g"), (col("id") % 11).cast("string").as("v"))
    val got = df.groupBy("g")
      .agg(VectorFunctions.spaceSavingTopK(col("v"), 32).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.item").as("item"), col("e.cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = df.groupBy("g", "v").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("SQL surface: space_saving_topk registered and usable from SQL") {
    org.apache.spark.sql.graftbridge.GraftFunctions.register(spark)
    spark.range(500L).select((col("id") % 5).as("v")).createOrReplaceTempView("ss_in")
    val rows = spark.sql(
      """SELECT e.item AS item, e.cnt AS cnt
        |FROM (SELECT space_saving_topk(v, 8) AS sk FROM ss_in)
        |LATERAL VIEW explode(sk) t AS e
        |ORDER BY cnt DESC, item""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) == 100L))
  }
}
