package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{AsOfJoinExec, AsOfJoinPlan}
import graft.{SparkSpec, Tables}

/** Native as-of join (AsOfJoinPlan/Exec/Strategy) vs the union+window
  * formulation, plus boundary semantics and physical plan shape.
  */
class AsOfJoinSuite extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("native as-of equals union+window formulation on real tables") {
    val orders = Relational.latestByKey(
        Tables.load(spark, sfDir, "orders"), Seq("o_custkey", "o_orderdate"), "o_orderkey", Nil)
      .withColumnRenamed("o_custkey", "user_id")
    val events = Tables.load(spark, sfDir, "events")
    val viaWindow = Relational.asOf(events, orders,
      key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_totalprice"))
    val viaNative = AsOfJoinPlan.of(events, orders,
      key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_totalprice"))
    assert(viaNative.columns.toSeq == viaWindow.columns.toSeq)
    assert(sortedRows(viaNative) == sortedRows(viaWindow))
  }

  test("boundary semantics: inclusive <=, latest-of-equal-times wins, no-match is null") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0))
      .toDF("k", "rt", "v")
    val got = AsOfJoinPlan.of(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(100.0)), // inclusive: rt == t matches
      (1L, 20L, Some(150.0)), // latest rt <= t
      (2L, 5L, None),         // rt 6 > 5: no match for this key
      (3L, 9L, None)))        // key absent from right entirely
  }

  test("double keys: -0.0 left vs 0.0 right matches like the window formulation") {
    // raw UnsafeRow bytes distinguish -0.0 from 0.0 (and murmur3 hashes
    // them to different partitions); the source-projection normalization
    // must make them co-partition and compare equal, as the window
    // formulation's NormalizeFloatingNumbers does.
    val left = Seq((-0.0, 10L, "a"), (0.0, 20L, "b"), (1.5, 5L, "c")).toDF("k", "t", "tag")
    val right = Seq((0.0, 8L, "p0"), (1.5, 1L, "p1")).toDF("k", "rt", "p")
    val native = AsOfJoinPlan.of(left, right, "k", "t", "rt", Seq("p"))
    val window = Relational.asOf(left, right, "k", "t", "rt", Seq("p"))
    assert(native.where(col("p").isNotNull).count() == 3)
    assert(sortedRows(native) == sortedRows(window))
  }

  test("right rows from a smaller key never leak into the next key") {
    val left = Seq((5L, 100L), (6L, 1L)).toDF("k", "t")
    val right = Seq((5L, 50L, "p5")).toDF("k", "rt", "p")
    val got = AsOfJoinPlan.of(left, right, "k", "t", "rt", Seq("p"))
      .orderBy("k").collect().map(r => (r.getLong(0), Option(r.get(2))))
    // key 6's left row arrives after key 5's payload was carried: the
    // carried key check must null it out, not leak "p5".
    assert(got.toSeq == Seq((5L, Some("p5")), (6L, None)))
  }

  test("mismatched time types widen like the union formulation (DATE left vs TIMESTAMP right)") {
    // left DATE 2024-01-02 vs right TIMESTAMP same-day 10:00 — widening
    // to timestamp makes the left midnight PRECEDE the right row (no
    // match); narrowing the right to DATE would truncate and falsely
    // match. Native must agree with the union+window formulation.
    val left = Seq((1L, "2024-01-02"), (2L, "2024-01-03"))
      .toDF("lid", "d").select(col("lid"), col("d").cast("date").as("t"))
    val right = Seq(("2024-01-02 10:00:00", "p1"))
      .toDF("rt", "p").select(col("rt").cast("timestamp").as("t2"), col("p"))
      .withColumn("k", lit(1)).select(col("k"), col("t2"), col("p"))
    val leftK = left.withColumn("k", lit(1))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "p").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    val native = rows(AsOfJoinPlan.of(leftK, right, "k", "t", "t2", Seq("p")))
    val window = rows(Relational.asOf(leftK, right, "k", "t", "t2", Seq("p")))
    assert(native == window)
    assert(native == Seq((1L, None), (2L, Some("p1"))))
  }

  test("self-join: same table on both sides resolves without expr-id conflicts") {
    val df = Seq((1L, 10L, 1.0), (1L, 20L, 2.0)).toDF("k", "t", "v")
    val got = AsOfJoinPlan.of(df, df, "k", "t", "t", Seq("v"))
      .orderBy("t").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 2.0))
  }

  test("output ordering propagates: a downstream (key,time) window adds no exchange or sort") {
    // the exec declares clustering on the key and ordering on
    // (key, time); a window over exactly that shape must reuse both —
    // this pins the type-matched path keeping the ORIGINAL attributes
    // (shadow-cast columns would be dropped and lose the ordering)
    import org.apache.spark.sql.expressions.Window
    val left = spark.range(2000L).select(col("id").as("k"), (col("id") * 2).as("t"))
    val right = spark.range(100L).select(col("id").as("k"), col("id").as("rt"),
      (col("id") * 10).as("v"))
    val joined = AsOfJoinPlan.of(left, right, "k", "t", "rt", Seq("v"))
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("t")))
    assert(joined.count() == 2000L)
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    val sorts = "Sort ".r.findAllIn(plan).length
    // the as-of itself costs 2 exchanges + 2 sorts; the window must add NONE
    assert(exchanges <= 2, s"window added an exchange:\n$plan")
    assert(sorts <= 2, s"window added a sort:\n$plan")
  }

  test("plan shape: one AsOfJoinExec, two exchanges, no union/window/BNLJ") {
    val left = spark.range(1000L).select(col("id").as("k"), (col("id") * 2).as("t"))
    val right = spark.range(100L).select(col("id").as("k"), col("id").as("rt"),
      (col("id") * 10).as("v"))
    val df = AsOfJoinPlan.of(left, right, "k", "t", "rt", Seq("v"))
    assert(df.count() == 1000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Window") &&
      !plan.contains("Union"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <= 2 exchanges, got $exchanges:\n$plan")
    // the physical node is really ours (unwrap the AQE plan wrapper)
    val hasExec = df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.exists(_.isInstanceOf[AsOfJoinExec])
      case _: AsOfJoinExec => true
    }
    assert(hasExec.contains(true), plan)
  }
}
