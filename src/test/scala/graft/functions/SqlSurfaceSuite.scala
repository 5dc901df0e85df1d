package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinBucketingSuite extends SparkSpec {
  import spark.implicits._

  test("optimizer rule: range-only theta join rewrites to a hash join, identical results") {
    val rule = org.apache.spark.sql.graftbridge.RangeJoinBucketing(spark)
    val points = (0 until 300).map(i => (i.toLong, i * 1.0 + (i % 4) * 0.2)).toDF("p_id", "v")
    val intervals = Seq((1L, 0.0, 25.0), (2L, 24.8, 25.2), (3L, 100.0, 260.0),
      (4L, 500.0, 501.0)).toDF("iv_id", "lo", "hi")
    def thetaJoin() = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = keys(thetaJoin()) // conf unset: rule dormant, BNLJ plan
    assert(thetaJoin().queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
    def equiJoin() = points.join(intervals, col("p_id") === col("iv_id"))
    val equiBaseline = keys(equiJoin())

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ rule
    spark.conf.set(rule.confKey, "16.0")
    try {
      val rewritten = thetaJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      // the bucketed branch fires: bucket projection + an equi join on
      // it (the wide-interval fallback branch legitimately remains as
      // a runtime-empty nested loop that AQE eliminates)
      assert(plan.contains("__graft_bucket"), s"rewrite did not fire:\n$plan")
      assert(keys(rewritten) == naive, "bucketed rewrite changed the result set")
      // orientation flip (lo <= v AND hi >= v) matches too
      val flipped = points.join(intervals, col("lo") <= col("v") && col("hi") >= col("v"))
      assert(flipped.queryExecution.executedPlan.toString.contains("__graft_bucket"))
      assert(keys(flipped) == naive)
      // equi-key joins pass through untouched (no bucket rewrite)
      val equi = equiJoin()
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_bucket"))
      assert(keys(equi) == equiBaseline)
      // inverted interval (lo > hi): empty result, NOT a sequence error
      val inverted = Seq((9L, 50.0, 10.0)).toDF("iv_id", "lo", "hi")
      assert(points.join(inverted,
        col("v") >= col("lo") && col("v") <= col("hi")).count() == 0)
      // an interval spanning billions of buckets takes the fallback
      // branch instead of exploding a giant array — same results
      val withWide = intervals.unionByName(Seq((10L, -1e7, 1e7)).toDF("iv_id", "lo", "hi"))
      val wideJoined = points.join(withWide, col("v") >= col("lo") && col("v") <= col("hi"))
      val expectWide = naive ++ (0 until 300).map(i => (i.toLong, 10L))
      assert(keys(wideJoined) == expectWide, "wide-interval fallback lost or duplicated rows")
    } finally {
      spark.conf.unset(rule.confKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rule is idempotent after sibling rules insert Projects above its branches") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Union}
    val rule = org.apache.spark.sql.graftbridge.RangeJoinBucketing(spark)
    val points = Seq((1L, 5.0)).toDF("p_id", "v")
    val intervals = Seq((1L, 0.0, 10.0)).toDF("iv_id", "lo", "hi")
    val analyzed = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi")).queryExecution.analyzed
    spark.conf.set(rule.confKey, "16.0")
    try {
      val once = rule(analyzed)
      def unions(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        p.collect { case u: Union => u }.size
      assert(unions(once) == 1, "first application should produce the branch union")
      // Simulate ColumnPruning/CombineFilters reshaping inside the same
      // fixed-point batch: wrap every Filter in a no-op Project, then
      // re-apply. A top-node-only self-recognition would rewrite the
      // fallback join again and grow a second Union.
      val reshaped = once.transformUp { case f: Filter => Project(f.output, f) }
      assert(unions(rule(reshaped)) == unions(reshaped),
        "rule re-rewrote its own fallback branch after a plan reshape")
      // and a plain second application is a no-op too
      assert(unions(rule(once)) == 1)
    } finally spark.conf.unset(rule.confKey)
  }
}

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class SqlSurfaceSuite extends SparkSpec {
  import spark.implicits._

  test("SQL functions equal the Column API (same native expressions)") {
    org.apache.spark.sql.graftbridge.GraftFunctions.register(spark)
    Seq((1L, "hello world text", Array(1f, 2f, 3f), Array(0.5f, 0.25f, 2f)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("sql_surface_t")
    val r = spark.sql(
      """SELECT minhash_sig(text, 16, 5, 42) AS sig, simhash64(text, 5) AS sh,
        |       float_dot(a, b) AS dot, string_split(text, ' ')[1] AS tok1
        |FROM sql_surface_t""".stripMargin).collect()(0)
    val c = spark.table("sql_surface_t").select(
      VectorFunctions.minhashSig(col("text"), 16, 5, 42L).as("sig"),
      VectorFunctions.simhash64(col("text"), 5).as("sh"),
      VectorFunctions.dotF(col("a"), col("b")).as("dot")).collect()(0)
    assert(r.getSeq[Long](0) == c.getSeq[Long](0))
    assert(r.getLong(1) == c.getLong(1))
    assert(math.abs(r.getDouble(2) - 7.0) < 1e-9) // 0.5 + 0.5 + 6
    assert(r.getString(3) == "world")
    // the bounded-collect aggregate is on the SQL surface too
    val bc = spark.sql(
      """SELECT k, bounded_collect_list(v, 2) AS ids FROM VALUES
        |  (1, 10), (1, 11), (2, 20), (2, 21), (2, 22), (2, 23) AS t(k, v)
        |GROUP BY k""".stripMargin).collect()
      .map(row => row.getInt(0) -> row.getSeq[Int](1)).toMap
    assert(bc(1).sorted == Seq(10, 11)) // under cap: complete
    assert(bc(2).length == 3)           // capped at limit+1
  }

  test("GraftExtensions injects the functions into a fresh session") {
    // getOrCreate returns the shared test session (ignoring extensions)
    // unless the active/default session is cleared first; restore after.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
        .getOrCreate()
      val n = s.sql("SELECT simhash64('abcdef abcdef', 5) AS h").collect()(0).getLong(0)
      assert(n != 0L)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
