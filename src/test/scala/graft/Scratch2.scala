package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 scale probes (dev scratchpad, like Scratch): the new
  * operators under cardinality/volume stress.
  *
  *  - space_saving_topk at 100M rows / 10M distinct values with
  *    capacity 256: state must stay O(capacity × partitions) and the
  *    runtime must track INPUT volume (one pass), not distinct count;
  *  - native as-of join at R×-replicated events (left side grows R×,
  *    the right side stays fixed): runtime must scale ~linearly in the
  *    left volume — one shuffle each side, merge pass, O(1) state.
  */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // --- space-saving sketch: skewed stream, huge distinct domain ---
    for (n <- Seq(10000000L, 100000000L)) {
      val skewed = spark.range(n).select(
        // ~half the stream concentrates on 100 hot keys; the rest is a
        // ~n/2-distinct long tail — the regime the sketch exists for.
        when(col("id") % 2 === 0, (col("id") % 100).cast("string"))
          .otherwise(col("id").cast("string")).as("v"))
      time(s"space_saving_topk n=$n") {
        skewed.agg(graft.functions.VectorFunctions.spaceSavingTopK(col("v"), 256).as("sk"))
          .select(size(col("sk")).as("m")).as[Int].head()
      }
      clear()
      // exact reference cost at the same volume (full shuffle of the domain)
      time(s"exact groupBy+top n=$n") {
        skewed.groupBy("v").count().orderBy(col("count").desc).limit(10).count()
      }
      clear()
    }

    // --- native as-of: left side replicated R×, right side fixed ---
    val events = Tables.load(spark, dir, "events")
    val orders = operators.Relational.latestByKey(
        Tables.load(spark, dir, "orders"), Seq("o_custkey", "o_orderdate"), "o_orderkey", Nil)
      .withColumnRenamed("o_custkey", "user_id")
    def replicatedEvents(r: Int) =
      (0 until r).map(i => events.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
    for (r <- Seq(10, 100)) {
      val left = replicatedEvents(r)
      time(s"asof native  R=$r (${100000 * r} events)") {
        operators.Relational.asOfNative(left, orders,
          "user_id", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice")).count()
      }
      clear()
      time(s"asof window  R=$r") {
        operators.Relational.asOf(left, orders,
          "user_id", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice")).count()
      }
      clear()
    }

    // --- the structural win: BUCKETED inputs (the at-ingest layout).
    // The native exec's declared requirements let EnsureRequirements
    // elide the shuffles over bucketed scans; the union+window
    // formulation must ALWAYS re-shuffle both sides together.
    spark.sql("DROP TABLE IF EXISTS asof_events_b")
    spark.sql("DROP TABLE IF EXISTS asof_orders_b")
    pipeline.Writer.writeBucketed(replicatedEvents(100), "asof_events_b", Seq("user_id"), 32)
    pipeline.Writer.writeBucketed(orders, "asof_orders_b", Seq("user_id"), 32)
    val bLeft = spark.table("asof_events_b")
    val bRight = spark.table("asof_orders_b")
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.count() // finalize the adaptive plan
      var c = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => c += 1; e.children.foreach(walk)
          case other => other.children.foreach(walk)
        }
      }
      walk(df.queryExecution.executedPlan)
      c
    }
    val nativeB = operators.Relational.asOfNative(bLeft, bRight,
      "user_id", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
    val windowB = operators.Relational.asOf(bLeft, bRight,
      "user_id", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
    println(s"[scratch2] asof bucketed shuffles: native=${shuffles(nativeB)} window=${shuffles(windowB)}")
    clear()
    time("asof native  bucketed") { nativeB.count() }
    clear()
    time("asof window  bucketed") { windowB.count() }
    spark.sql("DROP TABLE IF EXISTS asof_events_b")
    spark.sql("DROP TABLE IF EXISTS asof_orders_b")
    println(s"[scratch2] cacheManager empty: ${spark.sharedState.cacheManager.isEmpty}")
    spark.stop()
  }
}
