package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline._
import graft.quality._
import graft.operators.Relational

/** Relational / pipeline-core operator queries (SURVEY.md §2,
  * q02–q23). Every query exercises library code (Pipeline steps,
  * Validator, Scd2Merge, Relational ops) and has a DuckDB oracle with a
  * fully deterministic ORDER BY.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  /** Scratch root for queries that materialize real commits (q66/q67):
    * unique per call (a reused root would accumulate versions and
    * change changesSince's answer on re-run), must outlive the RETURNED
    * lazy frame, and is deleted on JVM exit so repeated gate/bench runs
    * don't fill /tmp with table copies.
    */
  private[queries] def scratchRoot(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(d) catch { case _: Throwable => () }
    }))
    d.toString + "/t"
  }

  private def file(dir: String, name: String) = FileSource(name, s"$dir/$name.parquet")

  /** The q71/q72 snapshot pair: deterministic adds (%5==4 keys absent
    * from base), deletes (%7==3 keys absent from next) and in-place
    * changes (price fix for customers %10==0 through exact integer
    * cents, status case-flip for %20==0) over the orders table.
    */
  private def diffSnapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = t(s, dir, "orders")
      .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
    val base = all.where(col("o_orderkey") % 5 =!= 4)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("__cents / 100.0D").as("price"), col("o_orderstatus").as("status"))
    val next = all.where(col("o_orderkey") % 7 =!= 3)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_custkey") % 10 === 0, expr("((__cents * 105 + 50) div 100) / 100.0D"))
          .otherwise(expr("__cents / 100.0D")).as("price"),
        when(col("o_custkey") % 20 === 0, lower(col("o_orderstatus")))
          .otherwise(col("o_orderstatus")).as("status"))
    (base, next)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q02: filter step + aggregation (TPC-H Q6 shape). The Filter step's
    // predicate pushes into the parquet scan (PushedFilters) because the
    // pipeline stays one lazy plan.
    "q02_filter" -> ((s, dir) => {
      val spec = PipelineSpec("filter_revenue", Seq(file(dir, "lineitem")), Seq(
        Filter("l_shipdate >= timestamp'1995-01-01' AND l_shipdate < timestamp'1996-01-01' " +
          "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")))
      Pipeline(s, spec).run()
        // 4dp product summed in exact 1e-4 units, floor((x+50)/100) to
        // cents — immune to the ~sf10 round(sum(double),2) erosion; the
        // pmod term turns Spark's truncating `div` into floor division
        // so a NEGATIVE total would also match DuckDB's flooring `//`.
        .agg(expr("((sum(cast(round(l_extendedprice * l_discount * 10000) as bigint)) + 50" +
          " - pmod(sum(cast(round(l_extendedprice * l_discount * 10000) as bigint)) + 50, 100)) div 100) / 100.0D").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // q03: fact ⋈ three dims via Join steps; dims broadcast — at scale
    // the orders fact never shuffles for these joins.
    "q03_join" -> ((s, dir) => {
      val spec = PipelineSpec("revenue_by_nation",
        Seq(file(dir, "orders"), file(dir, "customer"), file(dir, "nation"), file(dir, "region")),
        Seq(
          Join("customer", how = "inner", broadcastOther = true, condition = Some("l.o_custkey = r.c_custkey")),
          Join("nation", how = "inner", broadcastOther = true, condition = Some("l.c_nationkey = r.n_nationkey")),
          Join("region", how = "inner", broadcastOther = true, condition = Some("l.n_regionkey = r.r_regionkey"))))
      Pipeline(s, spec).run()
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(expr("cast(round(o_totalprice * 100) as bigint)")) / 100.0, 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    // q04: gold SQL chain — step 1 registers a view consumed by step 2
    // (drune execute_gold_transformation).
    "q04_sql_chain" -> ((s, dir) => {
      val spec = PipelineSpec("gold_monthly", Seq(file(dir, "orders")), Seq(
        Sql("SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS month, " +
          // 100.0D: a bare 100.0 literal parses as DECIMAL in Spark SQL
          // and would change the division's result type vs the oracle.
          "round(sum(cast(round(o_totalprice * 100) as bigint)) / 100.0D, 2) AS revenue, " +
          "count(*) AS n_orders FROM orders GROUP BY 1",
          "monthly_rev"),
        // corpus-wide average via a broadcast 1-row cross join, not
        // `avg(revenue) OVER ()` — an unpartitioned window funnels the
        // frame through ONE task (WindowExec warns), while the scalar
        // aggregate broadcasts; same values, scale-clean plan
        Sql("SELECT month, revenue, n_orders, " +
          "round(revenue / a.avg_rev, 4) AS ratio_to_avg FROM monthly_rev " +
          "CROSS JOIN (SELECT avg(revenue) AS avg_rev FROM monthly_rev) a")))
      Pipeline(s, spec).run().orderBy("month")
    }),

    // q05: pivot step with explicit values (no distinct-scan job).
    "q05_pivot" -> ((s, dir) => {
      val spec = PipelineSpec("pivot_qty", Seq(file(dir, "lineitem")), Seq(
        Pivot(Seq("l_returnflag"), "l_linestatus", "l_quantity", "sum", Seq("F", "O"))))
      Pipeline(s, spec).run()
        .select(col("l_returnflag"), round(col("F"), 2).as("F"), round(col("O"), 2).as("O"))
        .orderBy("l_returnflag")
    }),

    // q06: silver transform — rename / SQL expression / cast / hash_key
    // control column, all in ONE select projection.
    "q06_silver_transform" -> ((s, dir) => {
      val cols = Seq(
        ColumnSpec("customer_id", from = Some("c_custkey"), dataType = Some("bigint")),
        ColumnSpec("customer_name", from = Some("c_name"), dataType = Some("string"),
          expression = Some("upper(trim({col}))")),
        ColumnSpec("segment", from = Some("c_mktsegment"), dataType = Some("string")),
        ColumnSpec("balance", from = Some("c_acctbal"), dataType = Some("double")),
        ColumnSpec("nation_key", from = Some("c_nationkey"), dataType = Some("bigint")),
        ColumnSpec("loyalty_tier", optional = true, dataType = Some("string")))
      Pipeline.transform(t(s, dir, "customer"),
          Transform(cols, primaryKey = Seq("customer_id"), addControlColumns = true))
        // created_at/updated_at are wall-clock stamps — assert their
        // contract (equal on fresh rows) as a deterministic boolean
        // instead of hashing timestamps.
        .withColumn("created_eq", col("created_at") === col("updated_at"))
        .drop("updated_at", "created_at")
        .orderBy("customer_id")
    }),

    // q07: window functions — rank within key + running sum.
    "q07_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val cum = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          rank().over(byPrice).as("price_rank"),
          round(sum(expr("cast(round(o_totalprice * 100) as bigint)")).over(cum) / 100.0, 2).as("cum_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // q08: top-k by value with deterministic tiebreak.
    "q08_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))),

    // q09: distinct aggregation.
    "q09_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("o_orderstatus")),

    // q10: conformed union of two sources.
    "q10_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(lit("customer").as("party_type"), col("c_custkey").as("party_id"), col("c_name").as("party_name"))
      val sup = t(s, dir, "supplier")
        .select(lit("supplier").as("party_type"), col("s_suppkey").as("party_id"), col("s_name").as("party_name"))
      c.unionByName(sup).orderBy("party_type", "party_id")
    }),

    // q11: latest record per key (merge read-side semantics).
    "q11_latest_by_key" -> ((s, dir) =>
      Relational.latestByKey(t(s, dir, "orders"), Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_custkey")),

    // q12: validation violation summary — all rules in ONE scan
    // (Validator), vs drune's 2-jobs-per-rule.
    "q12_validate_counts" -> ((s, dir) => {
      val specs = Seq(
        ColumnConstraints("c_name", Seq(Constraint(NotNull, WarnAction))),
        ColumnConstraints("c_acctbal", Seq(
          Constraint(Gte(0.0), WarnAction),
          Constraint(Between(-1000.0, 10000.0), WarnAction))),
        ColumnConstraints("c_mktsegment", Seq(
          Constraint(IsIn(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY")), WarnAction),
          Constraint(MinLength(3), WarnAction))))
      Validator.validate(t(s, dir, "customer"), "customer_quality", specs)
        .summary
        .orderBy("failed_column", "validation_rule")
    }),

    // q38: warn-rule failure log — reference log schema parity: each
    // bad row carries the rule, the offending value, its hash_key (so
    // the log joins back to the row) and a log timestamp (asserted as a
    // deterministic non-null flag; wall-clock stamps don't hash).
    "q38_failure_log" -> ((s, dir) => {
      val withKey = Pipeline.addControlColumns(
        t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")),
        Transform(Nil, primaryKey = Seq("c_custkey"), addControlColumns = true))
      val specs = Seq(
        ColumnConstraints("c_acctbal", Seq(Constraint(Gte(0.0), WarnAction))),
        ColumnConstraints("c_mktsegment", Seq(Constraint(MinLength(3), WarnAction))))
      Validator.validate(withKey, "customer_quality", specs)
        .failureLog
        .withColumn("has_ts", col("log_timestamp").isNotNull)
        .drop("log_timestamp")
        .orderBy("failed_column", "hash_key")
    }),

    // q13: surviving rows after drop-mode rules (nulls pass non-null
    // rules — see Validator scaladoc).
    "q13_validate_drop" -> ((s, dir) => {
      val specs = Seq(
        ColumnConstraints("c_name", Seq(Constraint(NotNull, DropAction))),
        ColumnConstraints("c_acctbal", Seq(Constraint(Gte(0.0), DropAction))))
      Validator.validate(t(s, dir, "customer"), "customer_drop", specs)
        .valid
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("balance"))
        .orderBy("c_custkey")
    }),

    // q14: column profiling — one aggregation pass for every column.
    "q14_profile" -> ((s, dir) =>
      Profiler.profile(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "c_nationkey"))
        .orderBy("column_name")),

    // q15: upsert (merge) semantics without IO: corrections win on key.
    // Prices flow through exact integer cents (the +5% adjustment as
    // (cents*105+50) div 100, integer HALF_UP): round(x*1.05, 2) on
    // raw doubles flips a half-cent boundary cell between engines at
    // sf0.1 — same failure class the q43 fix closed.
    "q15_merge_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey"), col("o_custkey"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      val fixes = orders.where(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("((__cents * 105 + 50) div 100) / 100.0D").as("price"), lit("fix").as("src"))
      Relational.upsert(base, fixes, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // q16: table-level duplicate_check rule.
    "q16_dupcheck" -> ((s, dir) =>
      Validator.checkTable(t(s, dir, "lineitem"), DuplicateCheck(Seq("l_partkey", "l_suppkey")))
        .orderBy("l_partkey", "l_suppkey")),

    // q17: SCD2 merge — base snapshot + changed source rows produce
    // expire+insert version chains. Fixed timestamps keep it
    // oracle-comparable.
    "q17_scd2" -> ((s, dir) => {
      val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2024-06-01 00:00:00").cast("timestamp")
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("customer_id"),
        col("c_acctbal").as("balance"),
        col("c_mktsegment").as("segment"))
      def keyed(df: DataFrame) = Pipeline.dataHash(
        df.withColumn("hash_key", sha2(col("customer_id").cast("string"), 256)),
        Seq("balance", "segment"))
      val base = keyed(c)
        .withColumn("is_current", lit(true))
        .withColumn("start_date", t0)
        .withColumn("end_date", lit(null).cast("timestamp"))
      val source = keyed(c.withColumn("balance",
        when(col("segment") === "BUILDING", col("balance") + 100).otherwise(col("balance"))))
      Scd2Merge(s, source, Some(base), Seq("balance", "segment"), now = t1)
        .select(col("customer_id"), col("balance"), col("segment"), col("is_current"),
          date_format(col("start_date"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
          date_format(col("end_date"), "yyyy-MM-dd HH:mm:ss").as("end_ts"))
        .orderBy("customer_id", "start_ts")
    }),

    // q18: rollup aggregation (grouping sets).
    "q18_rollup" -> ((s, dir) => {
      val joined = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      joined.rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(expr("cast(round(o_totalprice * 100) as bigint)")) / 100.0, 2).as("revenue"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    // q19: anti join — orders with no lineitems (orphan detection).
    "q19_antijoin" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")),

    // q20: sessionization — 30 min gap splits sessions.
    "q20_sessionize" -> ((s, dir) =>
      Relational.sessionize(t(s, dir, "events"), "user_id", "ts", "event_id", 1800)
        .select(col("event_id"), col("user_id"), col("session_seq"))
        .orderBy("user_id", "event_id")),

    // q21: fixed-bucket histogram — bounded output at any input size.
    "q21_histogram" -> ((s, dir) =>
      Relational.histogram(t(s, dir, "orders"), "o_totalprice", 0.0, 600000.0, 20)
        .orderBy("bucket")),

    // q22: tumbling time-window aggregation.
    "q22_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(expr("cast(round(value * 100) as bigint)")) / 100.0, 2).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("hour", "event_type")),

    // q36: semi-structured extraction — JSON props field to typed
    // column, aggregated. get_json_object is codegen'd (Jackson under
    // the hood), no UDF.
    "q36_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type")),

    // q23: as-of join — most recent order ≤ event time per user; ONE
    // shuffle via union+window, no range join. Deliberately NOT the
    // native AsOfJoinExec here: at this scale (unclustered inputs,
    // ~100k rows) the single union shuffle measures ~1.7× faster than
    // the exec's two shuffle stages; the native operator is for
    // pre-clustered/bucketed layouts where its declared requirements
    // elide the shuffles entirely (see AsOfJoinSuite + plan audit —
    // byte-identical output is pinned there).
    "q23_asof_join" -> ((s, dir) => {
      val orders = Relational.latestByKey(
          t(s, dir, "orders"), Seq("o_custkey", "o_orderdate"), "o_orderkey", Nil)
        .withColumnRenamed("o_custkey", "user_id")
      Relational.asOf(t(s, dir, "events"), orders,
          key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("matched_price"))
        .orderBy("event_id")
    }),

    // q43: distribution stats — exact interpolated percentiles (the
    // `percentile` aggregate, ANSI percentile_cont semantics) + stddev
    // of order value per nation. Dims broadcast onto the orders fact;
    // one keyed aggregation. At 100 TB exact percentiles on a hot key
    // would switch to approx_percentile (same plan shape) — exact kept
    // here for cross-engine oracle equality. Percentiles are computed
    // over integer CENTS (round-then-cast, since Spark's double→bigint
    // cast truncates while DuckDB's rounds): integer lerp endpoints make
    // the interpolation bit-identical across engines, where raw-double
    // inputs flipped a round(…,2) cell on a .005 boundary.
    // avg/sd are ALSO derived from the exact integer sums (sum(c),
    // sum(c*c), n): raw-double avg/stddev aggregates are accumulation-
    // order dependent across engines, so the last cent of a 6-figure
    // average flips between Spark and DuckDB. Integer sums are exact;
    // both engines cast them to DOUBLE at the same points and then run
    // the identical IEEE expression, so the hashes agree bit-for-bit.
    "q43_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .withColumn("price_cents", expr("cast(round(o_totalprice * 100) as bigint)"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          // Interpolated percentile recovered as an EXACT integer in
          // cents*100 (frac at p=.5/.9/.99 is a multiple of 0.01 cents;
          // FP interpolation error ~1e-10 << 0.5, so round() recovers
          // the exact value), then HALF_UP to cents in integer math.
          // round(double, 2) on a half-cent (x.225) flips between
          // engines — this formulation never rounds an ambiguous double.
          expr("cast(round(percentile(price_cents, 0.5) * 100) as bigint)").as("p50_raw"),
          expr("cast(round(percentile(price_cents, 0.9) * 100) as bigint)").as("p90_raw"),
          expr("cast(round(percentile(price_cents, 0.99) * 100) as bigint)").as("p99_raw"),
          sum(col("price_cents")).as("sum_c"),
          sum(col("price_cents").cast("decimal(38,0)") * col("price_cents")).as("sumsq_c"))
        .select(
          col("n_name"), col("n_orders"),
          expr("((p50_raw + 50) div 100) / 100.0D").as("p50"),
          expr("((p90_raw + 50) div 100) / 100.0D").as("p90"),
          expr("((p99_raw + 50) div 100) / 100.0D").as("p99"),
          // avg to the cent in INTEGER HALF_UP too: sum_c/n is a small-
          // denominator rational, so exact half-cents occur and
          // round(double,2) flips them between engines. (sd keeps the
          // double round: a sqrt output's shortest decimal repr landing
          // exactly on x.xx5 is not a reachable case. The integer form
          // assumes sum_c >= 0 — Spark `div` truncates while DuckDB
          // `//` floors, so NEGATIVE totals would disagree; prices are
          // positive by domain.)
          expr("((2 * sum_c + n_orders) div (2 * n_orders)) / 100.0D")
            .as("avg_price"),
          expr("""round(sqrt((cast(sumsq_c as double)
                 - cast(sum_c as double) * cast(sum_c as double) / cast(n_orders as double))
                 / cast(n_orders - 1 as double)) / 100.0D, 2)""")
            .as("sd_price"))
        .orderBy("n_name")),

    // q48: correlation / covariance aggregates per group — one keyed
    // aggregation with map-side co-moment partials (Pearson via
    // corr/covar_samp, both codegen'd; no second pass over the data).
    "q48_corr" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(corr(col("l_discount"), col("l_extendedprice")), 4).as("corr_disc_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"))
        .orderBy("l_returnflag")),

    // q52: distribution window functions — quartile assignment +
    // percent_rank/cume_dist per status. One shuffle+sort on the
    // partition key; the rank family shares a single window frame.
    // The divisions are small-integer rationals — deterministic across
    // engines (no FP-order sensitivity).
    "q52_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderkey")
    }),

    // q53: CUBE — the full 2^k grouping lattice (complements q18
    // ROLLUP / q51 GROUPING SETS). One expand + one keyed aggregation;
    // revenue summed in integer cents so every lattice cell is exact.
    "q53_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .withColumn("cents", expr("cast(round(o_totalprice * 100) as bigint)"))
        .cube(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("cents") / 100.0, 2).as("revenue"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("o_orderstatus"))),

    // q54: time-range join aggregation — per event, the same user's
    // orders in the trailing 30 days. The equi key (user) makes this a
    // plain co-partitioned join with the range as a join-time filter —
    // ONE shuffle on user_id, never a nested loop. (For range joins
    // with NO equi key, see Relational.intervalJoin.) Spend summed in
    // integer cents: per-event groups are small but a double sum's
    // order still isn't deterministic across engines.
    "q54_range_agg" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, dir, "orders").select(
        col("o_custkey").as("user_id"), col("o_orderdate"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      e.join(o,
          e("user_id") === o("user_id") &&
            col("o_orderdate").cast("timestamp") <= col("ts") &&
            col("o_orderdate").cast("timestamp") >= col("ts") - expr("INTERVAL 30 DAYS"),
          "left")
        .groupBy(col("event_id"), e("user_id").as("user_id"))
        .agg(count(col("o_orderdate")).as("n_orders_30d"),
          round(coalesce(sum("cents"), lit(0L)) / 100.0, 2).as("spend_30d"))
        .orderBy("event_id")
    }),

    // q55: sliding (overlapping) time windows — each event lands in
    // duration/slide windows; Spark's window() expands rows then runs
    // ONE keyed aggregation (same shuffle count as tumbling, output
    // ×(duration/slide)).
    "q55_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(expr("cast(round(value * 100) as bigint)")) / 100.0, 2).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("win_start", "event_type")),

    // q56: per-group feature scaling for training pipelines — min-max
    // scaled price + deviation from the group mean, over integer cents
    // so min/max/sum are exact and the divisions are deterministic
    // across engines (a windowed avg of raw doubles is FP-order-
    // sensitive). One window over the status partition, no joins.
    "q56_scaling" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus")
      t(s, dir, "orders")
        .withColumn("cents", expr("cast(round(o_totalprice * 100) as bigint)"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          round((col("cents") - min("cents").over(w)).cast("double") /
            (max("cents").over(w) - min("cents").over(w)), 6).as("scaled"),
          round((col("cents") - sum("cents").over(w).cast("double") /
            count(lit(1)).over(w)) / 100.0, 2).as("dev_from_mean"))
        .orderBy("o_orderkey")
    }),

    // q51: GROUPING SETS — explicit aggregation lattice (finer control
    // than ROLLUP/CUBE: only the requested groupings materialize; one
    // expand + one keyed aggregation, same shuffle count as a plain
    // groupBy).
    "q51_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               round(sum(cast(round(o_totalprice * 100) as bigint)) / 100.0D, 2) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    }),

    // q61: the SAME as-of semantics as q23, planned through the NATIVE
    // AsOfJoinExec (merge-scan physical operator) — the driver's oracle
    // hash-checks the custom exec end-to-end, where q23 pins the
    // union+window formulation. Two implementations, one oracle.
    "q61_asof_native" -> ((s, dir) => {
      val orders = Relational.latestByKey(
          t(s, dir, "orders"), Seq("o_custkey", "o_orderdate"), "o_orderkey", Nil)
        .withColumnRenamed("o_custkey", "user_id")
      Relational.asOfNative(t(s, dir, "events"), orders,
          key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("matched_price"))
        .orderBy("event_id")
    }),

    // q65: q61's exact semantics reached through the PURE-SQL surface —
    // the GraftExtensions-injected parser plans GRAFT_ASOF(...) onto
    // AsOfJoinExec, and the driver's oracle hash-checks that whole
    // parser -> plan -> exec path end-to-end (q23 pins union+window,
    // q61 the DataFrame facade, q65 the SQL statement: three routes,
    // one oracle).
    "q65_asof_sql" -> ((s, dir) => {
      Relational.latestByKey(
          t(s, dir, "orders"), Seq("o_custkey", "o_orderdate"), "o_orderkey", Nil)
        .withColumnRenamed("o_custkey", "user_id")
        .createOrReplaceTempView("asof65_ord")
      t(s, dir, "events").createOrReplaceTempView("asof65_events")
      s.sql("GRAFT_ASOF(asof65_events, asof65_ord, user_id, ts, o_orderdate, o_orderkey, o_totalprice)")
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("matched_price"))
        .orderBy("event_id")
    }),

    // q66: the VERSIONED COMMIT PROTOCOL under the oracle gate — q15's
    // exact upsert semantics, but run as two real manifest commits
    // (overwrite seed → CAS publish v1, merge fixes → re-merge plan +
    // CAS publish v2) against a scratch root, then read back through
    // the manifest. The driver's hash check covers the whole
    // write→commit→snapshot-read loop, the way q61 covers the native
    // exec. (Commits run at plan-construction; the returned frame reads
    // the committed snapshot lazily — the scratch root must outlive the
    // query, so it lives in the JVM temp dir, not a deleted-on-return
    // directory.)
    "q66_versioned_merge" -> ((s, dir) => {
      val root = scratchRoot("graft_q66")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey").as("hash_key"), col("o_custkey"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      val fixes = orders.where(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey").as("hash_key"), col("o_custkey"),
          expr("((__cents * 105 + 50) div 100) / 100.0D").as("price"), lit("fix").as("src"))
      Writer.write(s, base, SinkSpec(root, mode = Overwrite, versioned = true))
      Writer.write(s, fixes, SinkSpec(root, mode = MergeUpsert, versioned = true))
      VersionedTable.read(s, root)
        .select(col("hash_key").as("o_orderkey"), col("o_custkey"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q67: O(delta) APPENDS + INCREMENTAL READ under the oracle gate —
    // two append commits land in their own directories (pointer-only
    // publishes), and changesSince(v1) must return EXACTLY the second
    // batch: the incremental-consumption contract a downstream pipeline
    // relies on to avoid rescanning a growing corpus.
    "q67_versioned_delta" -> ((s, dir) => {
      val root = scratchRoot("graft_q67")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(root, mode = Append, versioned = true))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(root, mode = Append, versioned = true))
      VersionedTable.changesSince(s, root, 1L).orderBy("o_orderkey")
    }),

    // q98: RESTORE under the oracle gate — v1 commits the base, v2
    // appends extra rows (shifted keys), v3 DELETEs a third of the
    // base, then restore(v1) republishes v1's exact entry set as v4
    // with ZERO data I/O (pointer-only commit; RestoreSuite pins the
    // zero-copy property and the vacuumed-target refusal). The read
    // must equal the plain base selection — if restore no-opped, the
    // v3 deletions (and v2 extras) would poison the hash.
    "q98_versioned_restore" -> ((s, dir) => {
      val root = scratchRoot("graft_q98")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val v1 = VersionedTable.commit(s, root, "parquet", _ => orders)
      VersionedTable.commitDelta(s, root, "parquet",
        orders.select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus")).limit(500))
      VersionedTable.commitDelete(s, root, "o_orderkey % 3 = 0")
      VersionedTable.restore(s, root, v1)
      VersionedTable.read(s, root).orderBy("o_orderkey")
    }),

    // q105: BRANCH round trip — fork a zero-copy writable branch, land
    // an append AND a delete on it (main untouched), then publish the
    // branch: main fast-forwards to the branch head as a pointer-only
    // commit. The oracle computes the closed form of the whole
    // write-audit-publish loop from the base table.
    // q108: ADDITIVE SCHEMA EVOLUTION through the manifest fast path
    // (round 12) — the even-key base commits with (o_orderkey,
    // o_custkey), the odd-key delta appends with an extra status
    // column; the snapshot read must stay ONE manifest-planned scan
    // (ManifestPlanSuite pins the plan shape + zero plan-time FS
    // calls) with the base rows null-filled. The driver hash covers
    // the merged-schema read end-to-end.
    "q108_evolved_read" -> ((s, dir) => {
      val root = scratchRoot("graft_q108")
      val orders = t(s, dir, "orders")
      VersionedTable.commitDelta(s, root, "parquet",
        orders.where(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey")),
        compactAfter = Int.MaxValue)
      VersionedTable.commitDelta(s, root, "parquet",
        orders.where(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus").as("status")),
        compactAfter = Int.MaxValue)
      VersionedTable.read(s, root)
        .select(col("o_orderkey"), col("o_custkey"), col("status"))
        .orderBy("o_orderkey")
    }),

    "q105_versioned_branch" -> ((s, dir) => {
      val root = scratchRoot("graft_q105")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      VersionedTable.commitDelta(s, root, "parquet",
        orders.where(col("o_orderkey") % 2 === 0), compactAfter = Int.MaxValue)
      VersionedTable.createBranch(s, root, "exp")
      val bRoot = VersionedTable.branchRoot(root, "exp")
      VersionedTable.commitDelta(s, bRoot, "parquet",
        orders.where(col("o_orderkey") % 2 === 1 && col("o_custkey") % 5 === 0),
        compactAfter = Int.MaxValue)
      VersionedTable.commitDelete(s, bRoot, "o_orderstatus = 'F' AND o_custkey % 7 = 0")
      VersionedTable.publishBranch(s, root, "exp")
      VersionedTable.read(s, root).orderBy("o_orderkey")
    }),

    // q106: BRANCH DIFF — the audit step between branch and publish:
    // branch deletes %3 keys, updates custkey on surviving %10==1 keys
    // (file-pruned merge), appends %100==1 clones; branchDiff(main,
    // branch) must report exactly removed/changed/added with column
    // attribution. The oracle computes the same reconciliation from the
    // closed form of the three branch commits.
    "q106_branch_diff" -> ((s, dir) => {
      val root = scratchRoot("graft_q106")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      VersionedTable.commitDelta(s, root, "parquet", orders, compactAfter = Int.MaxValue)
      VersionedTable.createBranch(s, root, "exp")
      val bRoot = VersionedTable.branchRoot(root, "exp")
      VersionedTable.commitDelete(s, bRoot, "o_orderkey % 3 = 0")
      VersionedTable.commitMerge(s, bRoot, "parquet",
        orders.where(col("o_orderkey") % 10 === 1 && col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), (col("o_custkey") + 1000000L).as("o_custkey"),
            col("o_orderstatus")),
        keys = Seq("o_orderkey"))
      VersionedTable.commitDelta(s, bRoot, "parquet",
        orders.where(col("o_orderkey") % 100 === 1)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus")),
        compactAfter = Int.MaxValue)
      VersionedTable.branchDiff(s, root, "exp",
          Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // q71: keyed snapshot reconciliation (CDC diff) — base loses keys
    // %7==3, gains keys %5==4, and customers %10==0 get a price fix
    // (%20==0 additionally a status change, exercising the multi-column
    // changed_cols list). ONE full-outer sort-merge shuffle; every
    // classification is a codegen'd null-safe comparison.
    "q71_snapshot_diff" -> ((s, dir) => {
      val (base, next) = diffSnapshots(s, dir)
      Relational.snapshotDiff(base, next, Seq("o_orderkey"), Seq("o_custkey", "price", "status"))
        .orderBy("o_orderkey")
    }),

    // q72: the SAME reconciliation across two REAL versioned commits —
    // v1 and v2 are manifest snapshots on disk, diffed via
    // VersionedTable.diffVersions, so the oracle checks the full CDC
    // story: commit protocol → manifest-driven path choice → time
    // travel → keyed diff. The v2 overwrite REWRITES directories, so
    // the manifest routes this to the general full-outer
    // reconciliation (the O(delta) append fast path is pinned in
    // DiffVersionsSuite).
    "q72_versioned_cdc" -> ((s, dir) => {
      val root = scratchRoot("graft_q72")
      val (base, next) = diffSnapshots(s, dir)
      Writer.write(s, base, SinkSpec(root, mode = Overwrite, versioned = true))
      Writer.write(s, next, SinkSpec(root, mode = Overwrite, versioned = true))
      VersionedTable.diffVersions(s, root, 1L, 2L,
          Seq("o_orderkey"), Seq("o_custkey", "price", "status"))
        .orderBy("o_orderkey")
    }),

    // q75: INCREMENTALLY-MAINTAINED rollup under the oracle gate — the
    // source lands as two real append commits, and the rollup is
    // refreshed after EACH: refresh #2 folds only the second commit's
    // rows into the stored rollup (O(delta + |rollup|), the fact's
    // history is never rescanned). The final rollup must equal a flat
    // GROUP BY over everything — which is exactly what the DuckDB
    // oracle computes.
    "q75_incremental_rollup" -> ((s, dir) => {
      import graft.pipeline.MaterializedAgg
      import graft.pipeline.MaterializedAgg.MAgg
      val srcRoot = scratchRoot("graft_q75src")
      val aggRoot = scratchRoot("graft_q75agg")
      val orders = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val groups = Seq("o_orderstatus", "month")
      val aggs = Seq(MAgg("n_orders", "", "count"), MAgg("cents_sum", "cents", "sum"),
        MAgg("min_cents", "cents", "min"), MAgg("max_cents", "cents", "max"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      MaterializedAgg.read(s, aggRoot)
        .select(col("o_orderstatus"), col("month"), col("n_orders"),
          expr("cents_sum / 100.0D").as("revenue"),
          expr("min_cents / 100.0D").as("min_price"),
          expr("max_cents / 100.0D").as("max_price"))
        .orderBy("o_orderstatus", "month")
    }),

    // q77: GRAFT_DIFF over an APPEND-ONLY span, through the SQL
    // statement surface — the manifest's commit-kind markers prove no
    // rewrite happened, so diffVersions SKIPS the full-outer
    // reconciliation entirely and emits the appended delta as 'added'
    // rows: O(delta) with no shuffle join (DiffVersionsSuite pins the
    // plan join-free; this puts the fast path's ROWS under the
    // driver's hash — q72 covers the general rewrite route).
    "q77_cdc_append_sql" -> ((s, dir) => {
      val root = scratchRoot("graft_q77")
      val orders = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus").as("status"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(root, mode = Append, versioned = true))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(root, mode = Append, versioned = true))
      s.sql(s"GRAFT_DIFF('$root', 1, 2, KEY o_orderkey, COMPARE o_custkey, status)")
        .orderBy("o_orderkey")
    }),

    // q78: the DECLARATIVE materialized-view surface under the oracle
    // — the rollup is declared in YAML (`materialized:` block on a
    // versioned target), refresh #1 runs by executing the pipeline,
    // and refresh #2 — after a second real source commit — runs
    // through the GRAFT_REFRESH('/aggRoot') SQL statement using the
    // definition the first refresh persisted (_matview sidecar). Same
    // O(delta + |rollup|) maintenance as q75, reached with zero Scala
    // API calls: the route a migrating drune gold-step user takes.
    "q78_matview_yaml" -> ((s, dir) => {
      val srcRoot = scratchRoot("graft_q78src")
      val aggRoot0 = scratchRoot("graft_q78agg")
      // the YAML target path must not pre-exist as a plain directory
      // (createTempDirectory makes the parent; the rollup root is /t)
      val orders = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      val yaml =
        s"""pipeline_name: q78_matview
           |sources:
           |  - name: fact
           |    type: versioned
           |    path: $srcRoot
           |target:
           |  path: $aggRoot0
           |  materialized:
           |    group_by: [o_orderstatus]
           |    aggregates:
           |      - {name: n_orders, kind: count}
           |      - {name: cents_sum, kind: sum, expr: cents}
           |      - {name: max_cents, kind: max, expr: cents}
           |""".stripMargin
      Pipeline(s, YamlLoader.load(yaml)).run() // refresh #1: full snapshot fold
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      s.sql(s"GRAFT_REFRESH('$aggRoot0')") // refresh #2: O(delta) fold by stored def
        .select(col("o_orderstatus"), col("n_orders"),
          expr("cents_sum / 100.0D").as("revenue"),
          expr("max_cents / 100.0D").as("max_price"))
        .orderBy("o_orderstatus")
    }),

    // q82: MATVIEW WITH AVG under the oracle gate — avg is not
    // mergeable as a stored quotient, so MaterializedAgg decomposes it
    // into sum+count partials (hidden __avg_cents_sum/_cnt columns)
    // that fold additively across refreshes; the read derives the
    // quotient. Two real append commits + two refreshes: refresh #2
    // folds ONLY the second commit's partials, and the derived avg
    // must equal DuckDB's flat sum/count over everything.
    "q82_matview_avg" -> ((s, dir) => {
      import graft.pipeline.MaterializedAgg
      import graft.pipeline.MaterializedAgg.MAgg
      val srcRoot = scratchRoot("graft_q82src")
      val aggRoot = scratchRoot("graft_q82agg")
      val orders = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val groups = Seq("o_orderstatus", "month")
      val aggs = Seq(MAgg("n_orders", "", "count"), MAgg("avg_cents", "cents", "avg"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      MaterializedAgg.read(s, aggRoot)
        .select(col("o_orderstatus"), col("month"), col("n_orders"),
          round(col("avg_cents") / 100.0, 4).as("avg_price"))
        .orderBy("o_orderstatus", "month")
    }),

    // q91: the PURE-SQL WRITE PATH under the oracle — q66's base+merge
    // lifecycle driven entirely by GRAFT_APPEND / GRAFT_MERGE / GRAFT_
    // READ statements: the base lands as an O(delta) append commit,
    // the fixes as a file-pruned upsert on hash_key, and the snapshot
    // reads back through the statement surface. With q89's delete this
    // closes the loop: every versioned-table mutation is now
    // hash-checked from SQL alone (the statements share q66's closed
    // form, so the oracle also proves append+merge == overwrite+merge).
    "q91_sql_writes" -> ((s, dir) => {
      val root = scratchRoot("graft_q91")
      t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
        .createOrReplaceTempView("q91_orders")
      s.sql(s"""GRAFT_APPEND('$root', SELECT o_orderkey AS hash_key, o_custkey,
                |  __cents / 100.0D AS price, 'base' AS src FROM q91_orders)""".stripMargin)
        .collect()
      s.sql(s"""GRAFT_MERGE('$root', KEY hash_key, SELECT o_orderkey AS hash_key,
                |  o_custkey, ((__cents * 105 + 50) div 100) / 100.0D AS price,
                |  'fix' AS src FROM q91_orders WHERE o_custkey % 10 = 0)""".stripMargin)
        .collect()
      s.sql(s"GRAFT_READ('$root')")
        .select(col("hash_key").as("o_orderkey"), col("o_custkey"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q92: SQL MAINTENANCE under the oracle — two O(delta) append
    // commits, then GRAFT_COMPACT folds the delta dirs into ONE
    // dir and GRAFT_VACUUM retires every retired version
    // (grace 0: the scratch root is session-private). The snapshot
    // read back after both must still be exactly the union of the
    // appends — the driver hash proves compaction rewrites and
    // retention deletes never lose or duplicate a row.
    "q92_sql_maintenance" -> ((s, dir) => {
      val root = scratchRoot("graft_q92")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      (0 until 2).foreach { i =>
        Writer.write(s, orders.where(col("o_orderkey") % 2 === i),
          SinkSpec(root, mode = Append, versioned = true))
      }
      // plain fold (the ZORDER BY / FILES clauses are parse-pinned in
      // SqlSurfaceSuite; the z-order rewrite itself in ZOrderSuite)
      s.sql(s"GRAFT_COMPACT('$root')").collect()
      s.sql(s"GRAFT_VACUUM('$root', KEEP 1, GRACE 0)").collect()
      s.sql(s"GRAFT_READ('$root')").orderBy("o_orderkey")
    }),

    // q89: STATS-PRUNED ROW DELETE through the pure-SQL statement —
    // GRAFT_DELETE commits an overwrite-where with an empty source:
    // the o_orderkey<1000 span vanishes, every file the stats prove
    // clean carries by reference (PrunedMergeSuite pins the bytes),
    // and the driver's hash covers parse → commitDelete →
    // classification → NOT(cond) rewrite → snapshot read. The GDPR/
    // retraction commit shape: O(touched files), not O(table).
    "q89_delete" -> ((s, dir) => {
      val root = scratchRoot("graft_q89")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      VersionedTable.commit(s, root, "parquet",
        _ => orders.repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      s.sql(s"GRAFT_DELETE('$root', WHERE o_orderkey < 1000)").collect()
      VersionedTable.read(s, root).orderBy("o_orderkey")
    }),

    // q87: EXACT incremental COUNT DISTINCT via the TWO-LEVEL rollup —
    // count-distinct has no mergeable scalar partial, so the matview
    // groups by (status, custkey) with a count aggregate (that IS
    // foldable) and the read counts rollup ROWS per status plus sums
    // the stored counts: exact NDV maintained at O(distinct pairs)
    // rollup size with O(delta) refreshes. Two real append commits +
    // two refreshes; the result must equal DuckDB's flat
    // count(DISTINCT)/count(*) over everything.
    "q87_matview_ndv" -> ((s, dir) => {
      import graft.pipeline.MaterializedAgg
      import graft.pipeline.MaterializedAgg.MAgg
      val srcRoot = scratchRoot("graft_q87src")
      val aggRoot = scratchRoot("graft_q87agg")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      val groups = Seq("o_orderstatus", "o_custkey")
      val aggs = Seq(MAgg("n", "", "count"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      MaterializedAgg.read(s, aggRoot)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("ndv_cust"), sum(col("n")).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // q88: APPROXIMATE incremental NDV via the HLL sketch fold — each
    // refresh sketches only the delta's values (hll_sketch_agg) and
    // unions into the stored per-group sketch (hll_union), so distinct
    // counts over a growing 100 TB fact stay fresh at O(sketch) state
    // per group and O(delta) refresh cost. No SQL oracle (DuckDB's
    // approx_distinct is a different estimator): rows-only here;
    // MaterializedAggSuite pins the incremental estimate equal to the
    // batch sketch and exact at small cardinality.
    "q88_matview_hll" -> ((s, dir) => {
      import graft.pipeline.MaterializedAgg
      import graft.pipeline.MaterializedAgg.MAgg
      val srcRoot = scratchRoot("graft_q88src")
      val aggRoot = scratchRoot("graft_q88agg")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      val groups = Seq("o_orderstatus")
      val aggs = Seq(MAgg("n_orders", "", "count"), MAgg("ndv_cust", "o_custkey", "ndv"))
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 0),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      Writer.write(s, orders.where(col("o_orderkey") % 2 === 1),
        SinkSpec(srcRoot, mode = Append, versioned = true))
      MaterializedAgg.refresh(s, srcRoot, aggRoot, groups, aggs)
      MaterializedAgg.read(s, aggRoot)
        .select(col("o_orderstatus"), col("n_orders"), col("ndv_cust"))
        .orderBy("o_orderstatus")
    }),

    // q81: FILE-PRUNED MERGE under the oracle gate — the snapshot is
    // committed as 8 range-clustered files on the merge key, and the
    // merge (price fixes confined to o_orderkey < 1000, plus pure
    // inserts at key+10M) commits through commitMerge: the per-file
    // min/max stats written at commit time prove ~7 of 8 files cannot
    // contain a source key, so they carry over in the next manifest BY
    // REFERENCE — zero data I/O — and only the key-intersecting file(s)
    // rewrite (PrunedMergeSuite pins the carried files byte-identical;
    // the driver's hash covers stats → classification → partial
    // rewrite → file-ref manifest → snapshot read). The O(touched)
    // commit shape that replaces round 8's O(table) merge at 100 TB.
    "q81_merge_pruned" -> ((s, dir) => {
      val root = scratchRoot("graft_q81")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey").as("hash_key"), col("o_custkey"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      VersionedTable.commit(s, root, "parquet",
        _ => base.repartitionByRange(8, col("hash_key")).sortWithinPartitions("hash_key"))
      val fixes = orders.where(col("o_orderkey") < 1000)
        .select(col("o_orderkey").as("hash_key"), col("o_custkey"),
          expr("((__cents * 105 + 50) div 100) / 100.0D").as("price"), lit("fix").as("src"))
      val inserts = orders.where(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 10000000L).as("hash_key"), col("o_custkey"),
          expr("__cents / 100.0D").as("price"), lit("new").as("src"))
      VersionedTable.commitMerge(s, root, "parquet",
        fixes.unionByName(inserts), Seq("hash_key"))
      VersionedTable.read(s, root)
        .select(col("hash_key").as("o_orderkey"), col("o_custkey"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q83: the DSv2 `graft` FORMAT FACE under the oracle gate — the
    // table lands as two real append commits and reads back through
    // spark.read.format("graft") (Spark's own DSv2 parquet scan over
    // the manifest-resolved file list: the filter pushes into the
    // parquet footers and the projection prunes the read schema, both
    // pinned in PlanAuditSuite). The driver hash proves commit
    // protocol → DSv2 table resolution → pushed scan → aggregation
    // equals a flat SQL over the raw rows.
    "q83_dsv2_read" -> ((s, dir) => {
      val root = scratchRoot("graft_q83")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      Writer.write(s, li.where(col("l_orderkey") % 2 === 0),
        SinkSpec(root, mode = Append, versioned = true))
      Writer.write(s, li.where(col("l_orderkey") % 2 === 1),
        SinkSpec(root, mode = Append, versioned = true))
      s.read.format("graft").load(root)
        .where(col("l_quantity") >= 25)
        .groupBy(col("l_returnflag"))
        // quantity is integer-valued: its double sum is exact (q01 note)
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // q84: PARTITION-PRUNED dynamic partition overwrite under the
    // oracle gate — the base commits as a hive-partitioned snapshot
    // (partition col o_orderstatus), then overwrite_partition replaces
    // ONLY the 'F' partition with re-priced rows: the untouched 'O'
    // and 'P' leaves carry over in the next manifest as
    // partition-subtree references (zero data I/O, byte-identical —
    // PartitionOverwriteSuite), the 'F' leaf drops, and the source
    // lands as one new partitioned dir. O(source) commit instead of
    // round-8's O(table) anti-join rewrite; the driver hash covers
    // classification → subtree carry-over → basePath re-read →
    // dynamic-overwrite semantics end-to-end.
    "q84_partition_overwrite" -> ((s, dir) => {
      val root = scratchRoot("graft_q84")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      val po = orders.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("((__cents * 110 + 50) div 100) / 100.0D").as("price"),
          lit("po").as("src"))
      Writer.write(s, base, SinkSpec(root, mode = Overwrite, versioned = true,
        partitionBy = Seq("o_orderstatus")))
      Writer.write(s, po, SinkSpec(root, mode = OverwritePartition, versioned = true,
        partitionBy = Seq("o_orderstatus")))
      VersionedTable.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q107: the NATIVE DELTA LAKE WRITER under the oracle gate — the
    // base lands as a freshly-created partitioned Delta table (v0:
    // protocol + metaData + hive-partitioned adds through graft's own
    // _delta_log commit, sources/DeltaWrite), then a dynamic partition
    // overwrite replaces ONLY the 'F' partition (v1: remove actions
    // cover exactly the touched partition's files; 'O'/'P' files carry
    // over untouched in the log). The read-back goes through the
    // log-planned DeltaRead scan, so the driver hash covers the whole
    // writer→log→reader protocol loop end-to-end. Same closed form as
    // q84 — deliberately: identical semantics through a different
    // storage protocol.
    "q107_delta_write" -> ((s, dir) => {
      val root = scratchRoot("graft_q107")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      Writer.write(s, base, SinkSpec(root, format = "delta", mode = Append,
        partitionBy = Seq("o_orderstatus")))
      val po = orders.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("((__cents * 110 + 50) div 100) / 100.0D").as("price"),
          lit("po").as("src"))
      Writer.write(s, po, SinkSpec(root, format = "delta", mode = OverwritePartition,
        partitionBy = Seq("o_orderstatus")))
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q117: DV-EMITTING DELETE round trip (round 12) — write a delta
    // table, soft-delete two predicates via deletion vectors (the
    // second UNIONS into the first through the (path, dv.uniqueId)
    // replay; zero data-file I/O, protocol upgraded to v3), read back
    // through the DV-splitting scan under the oracle hash.
    "q117_delta_dv_delete" -> ((s, dir) => {
      val root = scratchRoot("graft_q117")
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      graft.sources.DeltaWrite.append(s, base.repartition(4), root)
      graft.sources.DeltaWrite.delete(s, root, "o_orderstatus = 'F'")
      graft.sources.DeltaWrite.delete(s, root, "o_custkey % 10 = 3")
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // q131: DELTA UPDATE (round 14) — the DV-based in-place UPDATE:
    // matched rows soft-delete via deletion vectors in their files and
    // their updated images append as new files (delta-spark's
    // DV-enabled UPDATE; unmatched rows never rewrite). First update
    // through the Scala API, second through GRAFT_UPDATE SQL with a
    // right-hand side reading TWO pre-update columns — simultaneous-
    // assignment semantics under the oracle's CASE recomputation.
    "q131_delta_update" -> ((s, dir) => {
      val root = scratchRoot("graft_q131")
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      graft.sources.DeltaWrite.append(s, base.repartition(4), root)
      graft.sources.DeltaWrite.update(s, root, "o_orderstatus = 'F'",
        Map("o_orderstatus" -> "'G'"))
      s.sql(s"GRAFT_UPDATE('$root', " +
        "SET o_custkey = o_custkey * 2 + (o_orderkey % 10), WHERE o_custkey % 7 = 0)")
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // q137: ROW TRACKING round trip (round 17) — writer feature
    // `rowTracking`: enable on a table with live unstamped files (the
    // enabling commit BACKFILLS baseRowId/defaultRowCommitVersion over
    // every live add and mints the delta.rowTracking high-water-mark
    // domain), append (fresh id range past the hwm), merge (touched
    // files rewrite, untouched carry), read back under the oracle.
    // The id invariants themselves (disjoint ranges, hwm coverage,
    // DV-delete carry, checkpoint fold) are pinned in DeltaWriteSuite.
    "q137_delta_row_tracking" -> ((s, dir) => {
      val root = scratchRoot("graft_q137")
      val orders = t(s, dir, "orders")
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      graft.sources.DeltaWrite.append(s, base.repartition(4), root)
      graft.sources.DeltaWrite.setProperties(s, root,
        Map("delta.enableRowTracking" -> "true"))
      graft.sources.DeltaWrite.append(s,
        base.where(col("o_orderkey") % 7 === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_custkey")), root)
      val src = graft.sources.DeltaRead.read(s, root)
        .where(col("o_custkey") % 3 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_custkey") * 10).as("o_custkey"))
      graft.sources.DeltaWrite.merge(s, src, root, Seq("o_orderkey"))
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // q138: TYPE WIDENING round trip (round 17) — readerWriter feature
    // `typeWidening`: write an int-typed column, widen it to long
    // (metaData-only commit recording delta.typeChanges; zero data
    // I/O), then append long data — the read resolves the OLD int32
    // files under the wide schema via Spark 4's parquet widening
    // promotions. Refusals (narrowing, off-matrix widenings) and the
    // foreign-feature read are pinned in DeltaWriteSuite.
    "q138_delta_widened" -> ((s, dir) => {
      val root = scratchRoot("graft_q138")
      val orders = t(s, dir, "orders")
      graft.sources.DeltaWrite.append(s,
        orders.where(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey").cast("int").as("o_custkey")),
        root)
      graft.sources.DeltaWrite.widenColumn(s, root, "o_custkey",
        org.apache.spark.sql.types.LongType)
      graft.sources.DeltaWrite.append(s,
        orders.where(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_custkey").cast("long").as("o_custkey")),
        root)
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // q139: ROW-ID READ surface (round 17 — the user face of q137's
    // rowTracking): three single-file sorted commits land deterministic
    // id ranges (backfill numbers the create's file 0..n0-1 in row
    // order; each append's file starts at hwm+1), and readWithRowIds
    // surfaces _row_id = baseRowId + physical row_index. The oracle
    // reconstructs the ids from per-slice row_numbers + slice offsets.
    "q139_delta_row_ids" -> ((s, dir) => {
      val root = scratchRoot("graft_q139")
      val orders = t(s, dir, "orders")
      def slice(r: Int) = orders.where(col("o_orderkey") % 3 === r)
        .select(col("o_orderkey"), col("o_custkey"))
        .repartition(1).sortWithinPartitions("o_orderkey")
      graft.sources.DeltaWrite.append(s, slice(0), root)
      graft.sources.DeltaWrite.setProperties(s, root,
        Map("delta.enableRowTracking" -> "true"))
      graft.sources.DeltaWrite.append(s, slice(1), root)
      graft.sources.DeltaWrite.append(s, slice(2), root)
      graft.sources.DeltaRead.readWithRowIds(s, root)
        .select(col("o_orderkey"), col("_row_id"))
        .orderBy("o_orderkey")
    }),

    // q140: MERGE-STABLE ROW IDS (round 18 — completes q137/q139's
    // row-tracking arc into delta-spark's materialized stable-id
    // contract): two sorted single-file commits land deterministic id
    // ranges, the table declares delta.rowTracking
    // .materializedRowIdColumnName, and an UPDATE-ONLY merge (every
    // source key exists) rewrites the touched files — surviving rows
    // must keep their ids via the hidden materialized column, so the
    // post-merge readWithRowIds hashes against the same per-slice
    // row_number reconstruction q139 uses. Without preservation the
    // rewritten rows would read fresh ids past the hwm and the hash
    // breaks. Insert-minting + UPDATE stability are pinned in
    // DeltaWriteSuite ("MERGE and UPDATE preserve declared
    // materialized row ids").
    "q140_delta_merge_ids" -> ((s, dir) => {
      val root = scratchRoot("graft_q140")
      val orders = t(s, dir, "orders")
      def slice(r: Int) = orders.where(col("o_orderkey") % 2 === r)
        .select(col("o_orderkey"), col("o_custkey"))
        .repartition(1).sortWithinPartitions("o_orderkey")
      graft.sources.DeltaWrite.append(s, slice(0), root)
      graft.sources.DeltaWrite.setProperties(s, root, Map(
        "delta.enableRowTracking" -> "true",
        "delta.rowTracking.materializedRowIdColumnName" -> "_graft_mat_rid"))
      graft.sources.DeltaWrite.append(s, slice(1), root)
      val src = graft.sources.DeltaRead.read(s, root)
        .where(col("o_custkey") % 5 === 0)
        .select(col("o_orderkey"), (col("o_custkey") * 100).as("o_custkey"))
      graft.sources.DeltaWrite.merge(s, src, root, Seq("o_orderkey"))
      graft.sources.DeltaRead.readWithRowIds(s, root)
        .select(col("o_orderkey"), col("o_custkey"), col("_row_id"))
        .orderBy("o_orderkey")
    }),

    // q141: ID-KEYED CHANGE FEED (round 18 — q140's CDF face):
    // readChangesWithRowIds surfaces _row_id on every change row —
    // derived inserts from the adds' baseRowId + index, cdc deletes
    // with their retired ids, update/merge pre/postimages SHARING each
    // row's id (the writer stamps the hidden _graft_cdc_row_id column
    // into _change_data on rowTracking tables; merge inserts re-derive
    // from the commit's new files' fresh-id rows). Disjoint %7
    // predicates make every change row's (type, version, id, value)
    // closed-form reconstructible. Refusals (pre-enablement spans,
    // unkeyed change rows) are pinned in DeltaWriteSuite ("the CDF
    // feed carries row ids").
    "q141_delta_cdf_ids" -> ((s, dir) => {
      val root = scratchRoot("graft_q141")
      val orders = t(s, dir, "orders")
      // %8 slices (a quarter of orders): the single-file sorted commits
      // the oracle's id determinism requires serialize every scan to
      // 2-way parallelism, so the fixture stays small — full-volume DML
      // cost is q117/q118/q131's job, q141's is id semantics
      def slice(r: Int) = orders.where(col("o_orderkey") % 8 === r)
        .select(col("o_orderkey"), col("o_custkey"))
        .repartition(1).sortWithinPartitions("o_orderkey")
      graft.sources.DeltaWrite.append(s, slice(0), root)
      graft.sources.DeltaWrite.setProperties(s, root, Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableRowTracking" -> "true",
        "delta.rowTracking.materializedRowIdColumnName" -> "_graft_mat_rid"))
      graft.sources.DeltaWrite.append(s, slice(1), root)
      graft.sources.DeltaWrite.delete(s, root, "o_orderkey % 7 = 3")
      graft.sources.DeltaWrite.update(s, root, "o_orderkey % 7 = 5",
        Map("o_custkey" -> "o_custkey + 1000000"))
      val src = graft.sources.DeltaRead.read(s, root)
        .where(col("o_orderkey") % 7 === 1)
        .select(col("o_orderkey"), (col("o_custkey") * 10).as("o_custkey"))
      graft.sources.DeltaWrite.merge(s, src, root, Seq("o_orderkey"))
      graft.sources.DeltaRead.readChangesWithRowIds(s, root, 2L)
        .select(col("o_orderkey"), col("o_custkey"), col("_change_type"),
          col("_commit_version"), col("_row_id"))
        .orderBy("o_orderkey", "_commit_version", "_change_type")
    }),

    // q142: VARIANT COLUMNS (round 18 — Spark 4's VariantType + the
    // Delta `variantType` reader+writer feature): deterministic JSON
    // documents (nested object) parse into a variant column, land in a
    // Delta table CREATED straight in the v3/v7 features form
    // (readerFeatures/writerFeatures carry variantType — a (1,2)
    // protocol would let feature-unaware readers misparse the
    // encoding) with the UNSHREDDED struct<metadata, value> parquet
    // layout the feature licenses (Spark shreds by default; graft's
    // writer pins shredding off per data write). A DV DELETE keyed on
    // a variant_get extraction proves DML composes with variant scans,
    // then the read-back extracts typed paths ($.c bigint, nested
    // $.n.p string, an absent path as NULL). Oracle: the extractions
    // invert the JSON construction, so plain columns reconstruct
    // everything.
    "q142_delta_variant" -> ((s, dir) => {
      val root = scratchRoot("graft_q142")
      val orders = t(s, dir, "orders")
      // repartition(4) (r18): the variant encode ran as ONE task on the
      // single-split bench input — 0.86 s serial in the fixture write
      // (guide §2.5); 4-way matches the q117/q131 fixture shape. Result
      // rows are unchanged (the DELETE and read-back key on content).
      val df = orders.repartition(4).selectExpr("o_orderkey",
        """parse_json(concat('{"k":', o_orderkey, ',"c":', o_custkey,
           ',"n":{"p":"', o_orderpriority, '"}}')) AS payload""")
      graft.sources.DeltaWrite.append(s, df, root)
      graft.sources.DeltaWrite.delete(s, root,
        "variant_get(payload, '$.k', 'bigint') % 7 = 2")
      graft.sources.DeltaRead.read(s, root)
        .where(expr("variant_get(payload, '$.k', 'bigint') % 3 = 0"))
        .select(col("o_orderkey"),
          expr("variant_get(payload, '$.c', 'bigint')").as("o_custkey"),
          expr("variant_get(payload, '$.n.p', 'string')").as("o_orderpriority"),
          expr("try_variant_get(payload, '$.missing', 'string')").as("absent"))
        .orderBy("o_orderkey")
    }),

    // q133: ALTER-COLUMN family (round 14) — enable name-mode column
    // mapping on a table THIS engine created (each field's physical
    // name = its current name, so existing files bind unchanged), then
    // RENAME and DROP COLUMN as metaData-only commits, then append
    // under the NEW logical names. Every step zero data I/O; the
    // read-back binds old files through physical names and new files
    // through minted ones, all under the oracle hash.
    "q133_delta_alter" -> ((s, dir) => {
      val root = scratchRoot("graft_q133")
      val base = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      graft.sources.DeltaWrite.append(s, base.repartition(2), root)
      s.sql(s"GRAFT_ALTER('$root', MAP COLUMNS)")
      s.sql(s"GRAFT_ALTER('$root', RENAME c_acctbal TO balance)")
      s.sql(s"GRAFT_ALTER('$root', DROP COLUMN c_nationkey)")
      val extra = t(s, dir, "customer").where(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"), col("c_name"),
          col("c_acctbal").as("balance"))
      graft.sources.DeltaWrite.append(s, extra, root)
      graft.sources.DeltaRead.read(s, root)
        .select(col("c_custkey"), col("c_name"), round(col("balance"), 2).as("balance"))
        .orderBy("c_custkey")
    }),

    // q132: CHECK CONSTRAINTS (round 14) — ALTER TABLE ADD CONSTRAINT
    // parity: the constraint validates existing rows before committing,
    // upgrades the protocol for checkConstraints, and every later
    // row-adding write evaluates it over the incoming batch. A
    // violating append FAILS WHOLE (caught here) and must leave the
    // table byte-identical; a valid append lands. Oracle = base slice
    // plus only the valid appended rows.
    "q132_delta_constraint" -> ((s, dir) => {
      val root = scratchRoot("graft_q132")
      val base = t(s, dir, "orders").where(col("o_custkey") % 3 === 0).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.sources.DeltaWrite.append(s, base.repartition(2), root)
      s.sql(s"GRAFT_CONSTRAINT('$root', ADD price_positive CHECK (o_totalprice > 0))")
      // valid rows land
      val good = t(s, dir, "orders").where(col("o_custkey") % 3 === 1).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.sources.DeltaWrite.append(s, good, root)
      // a violating batch fails whole — the table must not change
      try {
        graft.sources.DeltaWrite.append(s,
          good.withColumn("o_totalprice", col("o_totalprice") * -1), root)
        throw new IllegalStateException("constraint violation was not enforced")
      } catch { case _: IllegalArgumentException => () }
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // q109: DELTA CHECKPOINT round trip (round 12) — eleven partitioned
    // appends drive the log past the auto-checkpoint interval (v10
    // folds into 0...010.checkpoint.parquet + _last_checkpoint by the
    // writer itself), then a dynamic partition overwrite lands AFTER
    // the checkpoint so the read-back must reconcile checkpoint-carried
    // adds against post-checkpoint removes: DeltaRead's no-LIST
    // `_last_checkpoint` fast path + distributed checkpoint replay +
    // driver tail, end-to-end under the oracle hash. DeltaWriteSuite
    // pins the mechanics (pointer shape, txn carry-over, foreign-reader
    // equivalence of checkpointed vs replayed state).
    "q109_delta_checkpoint" -> ((s, dir) => {
      val root = scratchRoot("graft_q109")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      for (i <- 0 until 11)
        graft.sources.DeltaWrite.append(s,
          base.where(col("o_orderkey") % 11 === i).coalesce(1), root,
          Seq("o_orderstatus"))
      val ck = orders.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("((__cents * 105 + 50) div 100) / 100.0D").as("price"),
          lit("ck").as("src"))
      graft.sources.DeltaWrite.overwritePartitions(s, ck.coalesce(1), root,
        Seq("o_orderstatus"))
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q118: FILE-PRUNED DELTA MERGE (round 13) — q81's closed form
    // through the Delta log instead of graft's manifest protocol. The
    // base commits as 8 range-clustered files whose add.stats carry
    // hash_key min/max; the upsert's key set (fixes < 1000 plus
    // disjoint inserts) intersects only the edge files, so
    // DeltaWrite.merge removes+rewrites JUST those and every other add
    // entry carries by absence of a remove action — byte-identical,
    // pinned in DeltaWriteSuite. O(touched + source) upsert I/O on a
    // foreign-format table; the read-back hash proves pruning never
    // dropped or duplicated a row.
    "q118_delta_merge" -> ((s, dir) => {
      val root = scratchRoot("graft_q118")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey").as("hash_key"), col("o_custkey"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      graft.sources.DeltaWrite.append(s,
        base.repartitionByRange(8, col("hash_key")).sortWithinPartitions("hash_key"),
        root)
      val fixes = orders.where(col("o_orderkey") < 1000)
        .select(col("o_orderkey").as("hash_key"), col("o_custkey"),
          expr("((__cents * 105 + 50) div 100) / 100.0D").as("price"), lit("fix").as("src"))
      val inserts = orders.where(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 10000000L).as("hash_key"), col("o_custkey"),
          expr("__cents / 100.0D").as("price"), lit("new").as("src"))
      graft.sources.DeltaWrite.merge(s, fixes.unionByName(inserts), root, Seq("hash_key"))
      graft.sources.DeltaRead.read(s, root)
        .select(col("hash_key").as("o_orderkey"), col("o_custkey"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q125: DELTA CHANGE DATA FEED (round 14) — the last writer-protocol
    // gap a CDC consumer hits. Enable CDF (one metaData+protocol
    // commit), then drive the three change-producing shapes: a pure
    // append (file-less per the spec — readers derive inserts from its
    // add actions), a MERGE (updates decompose into update_preimage /
    // update_postimage cdc rows, new keys into insert rows, carried
    // rows into NOTHING — exactly what add/remove derivation cannot
    // express), and a DV DELETE (deleted rows land as cdc files; the
    // masked data file itself is never rewritten). The returned frame
    // is the full change feed over the span, so the oracle hash covers
    // cdc-file write + cdc-action commit + the span reader end-to-end.
    "q125_delta_cdf" -> ((s, dir) => {
      val root = scratchRoot("graft_q125")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      graft.sources.DeltaWrite.append(s,
        orders.where(col("o_orderkey") % 10 < 7).repartition(4), root)     // v0
      graft.sources.DeltaWrite.setProperties(s, root,
        Map("delta.enableChangeDataFeed" -> "true"))                       // v1
      graft.sources.DeltaWrite.append(s,
        orders.where(col("o_orderkey") % 10 === 7), root)                  // v2: inserts
      val src = orders.where(col("o_orderkey") % 10 === 4)
        .withColumn("o_orderstatus", lit("U"))
        .unionByName(orders.where(col("o_orderkey") % 10 === 8))
      graft.sources.DeltaWrite.merge(s, src, root, Seq("o_orderkey"))      // v3: upd+ins
      graft.sources.DeltaWrite.delete(s, root, "o_orderkey % 10 = 1")      // v4: deletes
      graft.sources.DeltaRead.readChanges(s, root, 2L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
        .orderBy("commit_version", "change_type", "o_orderkey")
    }),

    // q121: DELTA SCHEMA EVOLUTION via mergeSchema append (round 13) —
    // the base commits two columns, the second append carries a THIRD
    // (price) under mergeSchema=true: the commit re-emits metaData with
    // the union schema and the read must null-backfill the column for
    // every pre-evolution file (parquet by-name resolution) while
    // serving real values for the new one. The hash covers both the
    // evolved schema and the per-file backfill boundary.
    "q121_delta_evolve" -> ((s, dir) => {
      val root = scratchRoot("graft_q121")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      graft.sources.DeltaWrite.append(s, base, root)
      val evolved = orders.where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("__cents / 100.0D").as("price"))
      graft.sources.DeltaWrite.append(s, evolved, root, mergeSchema = true)
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("price"))
        .orderBy("o_orderkey")
    }),

    // q122: DV PURGE round trip (round 13) — DV-emitting deletes leave
    // soft-deleted rows behind a read-path filter; purgeDvs (REORG
    // PURGE) rewrites ONLY the DV-carrying files with the masks applied
    // (dataChange=false — a stream must not re-deliver). The read-back
    // hash proves the materialization dropped exactly the soft-deleted
    // rows and nothing else; the snapshot must be DV-free after.
    "q122_delta_purge" -> ((s, dir) => {
      val root = scratchRoot("graft_q122")
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      graft.sources.DeltaWrite.append(s, base.repartition(4), root)
      graft.sources.DeltaWrite.delete(s, root, "o_custkey % 7 = 2")
      graft.sources.DeltaWrite.purgeDvs(s, root, minDeletedFraction = 0.0)
      require(graft.sources.DeltaRead.snapshot(s, root).dvs.isEmpty,
        "purge must leave a DV-free snapshot")
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // q124: DELTA RESTORE round trip (round 13) — q98's closed form on
    // the Delta protocol: base append, a DV-emitting delete AND a
    // later append both land, then RESTORE(v0) rewinds the whole state
    // as ONE zero-data-I/O commit (removes retire the DV'd identity
    // and the late files; re-adds re-instate the clean originals). The
    // read-back must equal the untouched base — a leaked DV, a
    // lingering late file, or a lost original poisons the hash.
    "q124_delta_restore" -> ((s, dir) => {
      val root = scratchRoot("graft_q124")
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      graft.sources.DeltaWrite.append(s, base.repartition(4), root) // v0
      graft.sources.DeltaWrite.delete(s, root, "o_custkey % 3 = 1") // v1: DVs
      graft.sources.DeltaWrite.append(s,                            // v2: drift
        base.where(col("o_orderkey") % 100 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 90000000L), root)
      graft.sources.DeltaWrite.restore(s, root, 0L)                 // v3: rewind
      graft.sources.DeltaRead.read(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // q110: BRANCH REBASE (round 12) — the full diverge-rebase-publish
    // loop under the oracle hash. Even keys commit as main's base, a
    // branch forks and appends the %4==1 slice, then MAIN moves (the
    // %4==3 slice) so the fork point is stale: publish would refuse
    // (BranchSuite pins the refusal). rebaseBranch replays the
    // branch's append-only span onto main's head as ONE pointer-only
    // commit (zero data I/O — the scale-correct shape), publish then
    // fast-forwards cleanly, and the read must hold all three slices:
    // a lost update on either side poisons the hash.
    "q110_branch_rebase" -> ((s, dir) => {
      val root = scratchRoot("graft_q110")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      VersionedTable.commitDelta(s, root, "parquet",
        orders.where(col("o_orderkey") % 2 === 0), compactAfter = Int.MaxValue)
      VersionedTable.createBranch(s, root, "exp")
      val bRoot = VersionedTable.branchRoot(root, "exp")
      VersionedTable.commitDelta(s, bRoot, "parquet",
        orders.where(col("o_orderkey") % 4 === 1), compactAfter = Int.MaxValue)
      VersionedTable.commitDelta(s, root, "parquet",
        orders.where(col("o_orderkey") % 4 === 3), compactAfter = Int.MaxValue)
      VersionedTable.rebaseBranch(s, root, "exp")
      VersionedTable.publishBranch(s, root, "exp")
      VersionedTable.read(s, root).orderBy("o_orderkey")
    }),

    // q86: STATS-PRUNED overwrite_where (replaceWhere) under the
    // oracle gate — the base commits as 8 range-clustered files on
    // o_orderkey, then the o_orderkey<1000 span is replaced with
    // re-priced rows through commitOverwriteWhere: the per-file
    // min/max stats prove ~7 of 8 files hold no matching row, so they
    // carry over BY REFERENCE (byte-identical, PrunedMergeSuite) and
    // only the intersecting file(s) filter-and-rewrite. The backfill
    // commit shape at 100 TB: O(touched + source), not O(table).
    "q86_overwrite_where" -> ((s, dir) => {
      val root = scratchRoot("graft_q86")
      val orders = t(s, dir, "orders")
        .withColumn("__cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      val base = orders.select(col("o_orderkey"), col("o_custkey"),
        expr("__cents / 100.0D").as("price"), lit("base").as("src"))
      VersionedTable.commit(s, root, "parquet",
        _ => base.repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey"))
      val repl = orders.where(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("((__cents * 120 + 50) div 100) / 100.0D").as("price"),
          lit("bf").as("src"))
      VersionedTable.commitOverwriteWhere(s, root, "parquet", repl, "o_orderkey < 1000")
      VersionedTable.read(s, root)
        .select(col("o_orderkey"), col("o_custkey"), col("price"), col("src"))
        .orderBy("o_orderkey")
    }),

    // q62: funnel conversion — view→purchase by the same user within
    // one hour, grouped by day. Equi-join on user_id (the range test
    // rides the hash join as a post-filter, never a nested loop);
    // timestamps truncate to SECONDS on both engines first, erasing
    // the ns(DuckDB)-vs-µs(Spark) storage difference at the window
    // boundary.
    "q62_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts"))
      // Both sides descend from the same `ev` plan; rename the buy-side
      // key so the join condition is lineage-unambiguous (a shared-
      // lineage views("user_id") === buys("user_id") makes Spark log a
      // trivially-true-predicate warning and silently rewrite it).
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user"), col("ts").as("buy_ts"))
      views.join(buys, col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(date_format(col("view_ts"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("converting_users"),
          count(lit(1)).as("n_conversions"))
        .orderBy("day")
    }),

    // q63: cohort retention — users bucketed by first-event day,
    // counted distinct per (cohort day, activity day). Two keyed
    // aggregations + one equi-join on user_id; all-integer output.
    "q63_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      // Rename the cohort-side key: both inputs share the `ev` lineage,
      // and a using-column self-join logs the trivially-true-predicate
      // warning (same issue as q62).
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        .withColumnRenamed("user_id", "cohort_user")
      ev.select(col("user_id"), col("day")).distinct()
        .join(cohorts, col("user_id") === col("cohort_user"))
        .groupBy(col("cohort_day"), col("day"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_day", "day")
    }),

    // q64: argmin join — per part, the supplier with the lowest
    // observed price (TPC-H Q2's min-cost-supplier shape). Min in
    // integer cents per (part, supplier), then ONE window row_number
    // with a total tie-break order — deterministic where min_by/
    // arg_min across engines is not.
    "q64_argmin_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val best = t(s, dir, "lineitem")
        .withColumn("cents", expr("cast(round(l_extendedprice * 100) as bigint)"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("cents")).as("min_cents"))
      val w = Window.partitionBy("l_partkey").orderBy(col("min_cents"), col("l_suppkey"))
      best.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_partkey"), col("l_suppkey").as("best_supplier"),
          expr("min_cents / 100.0D").as("min_price"))
        .orderBy("l_partkey")
    }),

    // q60: approximate top-k frequency via the native space-saving
    // aggregate (graftbridge.SpaceSavingTopK) — bounded O(capacity)
    // state per group however many distinct values stream through; the
    // 100 TB shape for "most frequent URLs/tokens/types". Capacity 256
    // exceeds p_type's distinct count, so every count is EXACT and the
    // DuckDB count(*) oracle hash-matches; the approximate regime's
    // bounds are pinned in SpaceSavingSuite. Ranking stays declarative
    // (explode + total order + limit) so tie-breaks match the oracle.
    "q60_topk_sketch" -> ((s, dir) =>
      t(s, dir, "part")
        .agg(graft.functions.VectorFunctions.spaceSavingTopK(col("p_type"), 256).as("sketch"))
        .select(explode(col("sketch")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("item"))
        .limit(10)))

  /** Shared by q71 (pure relational) and q72 (through two real
    * versioned commits + time travel): the keyed diff of
    * [[diffSnapshots]], with DuckDB's IS NOT DISTINCT FROM standing in
    * for Spark's null-safe `<=>` and concat_ws skipping the
    * unchanged-column NULLs identically in both engines.
    */
  private val snapshotDiffSql: String =
    """WITH allr AS (
      |  SELECT o_orderkey, o_custkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |         o_orderstatus AS status
      |  FROM orders),
      |base AS (
      |  SELECT o_orderkey, o_custkey, cents / 100.0 AS price, status
      |  FROM allr WHERE o_orderkey % 5 <> 4),
      |nxt AS (
      |  SELECT o_orderkey, o_custkey,
      |         CASE WHEN o_custkey % 10 = 0 THEN ((cents * 105 + 50) // 100) / 100.0
      |              ELSE cents / 100.0 END AS price,
      |         CASE WHEN o_custkey % 20 = 0 THEN lower(status) ELSE status END AS status
      |  FROM allr WHERE o_orderkey % 7 <> 3)
      |SELECT coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |       WHEN n.o_orderkey IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change_type,
      |  CASE WHEN b.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL THEN
      |    concat_ws(',',
      |      CASE WHEN NOT (b.o_custkey IS NOT DISTINCT FROM n.o_custkey) THEN 'o_custkey' END,
      |      CASE WHEN NOT (b.price IS NOT DISTINCT FROM n.price) THEN 'price' END,
      |      CASE WHEN NOT (b.status IS NOT DISTINCT FROM n.status) THEN 'status' END)
      |  END AS changed_cols,
      |  b.o_custkey AS old_o_custkey, n.o_custkey AS new_o_custkey,
      |  b.price AS old_price, n.price AS new_price,
      |  b.status AS old_status, n.status AS new_status
      |FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey
      |WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
      |   OR NOT (b.o_custkey IS NOT DISTINCT FROM n.o_custkey)
      |   OR NOT (b.price IS NOT DISTINCT FROM n.price)
      |   OR NOT (b.status IS NOT DISTINCT FROM n.status)
      |ORDER BY o_orderkey""".stripMargin

  def oracle: Map[String, String] = Map(
    "q02_filter" ->
      """SELECT ((sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) + 50) // 100) / 100.0 AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_join" ->
      """SELECT r_name, n_name,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q04_sql_chain" ->
      """WITH monthly_rev AS (
        |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |         round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue, n_orders,
        |       round(revenue / a.avg_rev, 4) AS ratio_to_avg
        |FROM monthly_rev CROSS JOIN (SELECT avg(revenue) AS avg_rev FROM monthly_rev) a
        |ORDER BY month""".stripMargin,

    "q05_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2) AS "F",
        |  round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2) AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_silver_transform" ->
      """SELECT CAST(c_custkey AS BIGINT) AS customer_id,
        |  upper(trim(c_name)) AS customer_name,
        |  c_mktsegment AS segment,
        |  CAST(c_acctbal AS DOUBLE) AS balance,
        |  CAST(c_nationkey AS BIGINT) AS nation_key,
        |  CAST(NULL AS VARCHAR) AS loyalty_tier,
        |  sha256(CAST(CAST(c_custkey AS BIGINT) AS VARCHAR)) AS hash_key,
        |  true AS created_eq
        |FROM customer ORDER BY customer_id""".stripMargin,

    "q38_failure_log" ->
      """SELECT * FROM (
        |  SELECT 'customer_quality' AS pipeline_name,
        |    'greater_than_or_equal_to:0.0' AS validation_rule,
        |    'c_acctbal' AS failed_column, CAST(c_acctbal AS VARCHAR) AS failed_value,
        |    'warn' AS action, sha256(CAST(c_custkey AS VARCHAR)) AS hash_key, true AS has_ts
        |  FROM customer WHERE c_acctbal IS NOT NULL AND NOT coalesce(c_acctbal >= 0, false)
        |  UNION ALL
        |  SELECT 'customer_quality', 'min_length:3', 'c_mktsegment', c_mktsegment, 'warn',
        |    sha256(CAST(c_custkey AS VARCHAR)), true
        |  FROM customer WHERE c_mktsegment IS NOT NULL AND NOT coalesce(length(c_mktsegment) >= 3, false)
        |) ORDER BY failed_column, hash_key""".stripMargin,

    "q07_window" ->
      """SELECT o_orderkey, o_custkey,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS cum_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q09_distinct" ->
      """SELECT o_orderstatus, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_union" ->
      """SELECT 'customer' AS party_type, c_custkey AS party_id, c_name AS party_name FROM customer
        |UNION ALL
        |SELECT 'supplier', s_suppkey, s_name FROM supplier
        |ORDER BY party_type, party_id""".stripMargin,

    "q11_latest_by_key" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q12_validate_counts" ->
      """SELECT * FROM (
        |  SELECT 'c_name' AS failed_column, 'not_null' AS validation_rule, 'warn' AS action,
        |         count(*) AS violations FROM customer WHERE c_name IS NULL
        |  UNION ALL
        |  SELECT 'c_acctbal', 'greater_than_or_equal_to:0.0', 'warn', count(*)
        |  FROM customer WHERE c_acctbal IS NOT NULL AND NOT coalesce(c_acctbal >= 0, false)
        |  UNION ALL
        |  SELECT 'c_acctbal', 'isbetween:[-1000.0,10000.0]', 'warn', count(*)
        |  FROM customer WHERE c_acctbal IS NOT NULL AND NOT coalesce(c_acctbal BETWEEN -1000 AND 10000, false)
        |  UNION ALL
        |  SELECT 'c_mktsegment', 'isin:AUTOMOBILE,BUILDING,FURNITURE,MACHINERY', 'warn', count(*)
        |  FROM customer WHERE c_mktsegment IS NOT NULL
        |    AND NOT coalesce(c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY'), false)
        |  UNION ALL
        |  SELECT 'c_mktsegment', 'min_length:3', 'warn', count(*)
        |  FROM customer WHERE c_mktsegment IS NOT NULL AND NOT coalesce(length(c_mktsegment) >= 3, false)
        |) WHERE violations > 0 ORDER BY failed_column, validation_rule""".stripMargin,

    "q13_validate_drop" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS balance FROM customer
        |WHERE c_name IS NOT NULL AND (c_acctbal IS NULL OR c_acctbal >= 0)
        |ORDER BY c_custkey""".stripMargin,

    "q14_profile" ->
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS column_name, count(*) AS n_rows, count(c_custkey) AS n_nonnull,
        |    count(DISTINCT c_custkey) AS n_distinct, CAST(min(c_custkey) AS VARCHAR) AS min_value,
        |    CAST(max(c_custkey) AS VARCHAR) AS max_value FROM customer
        |  UNION ALL
        |  SELECT 'c_name', count(*), count(c_name), count(DISTINCT c_name),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM customer
        |  UNION ALL
        |  SELECT 'c_acctbal', count(*), count(c_acctbal), count(DISTINCT c_acctbal),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', count(*), count(c_mktsegment), count(DISTINCT c_mktsegment),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', count(*), count(c_nationkey), count(DISTINCT c_nationkey),
        |    CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR) FROM customer
        |) ORDER BY column_name""".stripMargin,

    "q15_merge_upsert" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_custkey % 10 = 0
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_custkey % 10 = 0 THEN 'fix' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q16_dupcheck" ->
      """SELECT l_partkey, l_suppkey, count(*) AS cnt FROM lineitem
        |GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2""".stripMargin,

    "q17_scd2" ->
      """WITH c AS (SELECT c_custkey AS customer_id, c_acctbal AS balance, c_mktsegment AS segment FROM customer)
        |SELECT * FROM (
        |  SELECT customer_id, balance, segment, true AS is_current,
        |    '2024-01-01 00:00:00' AS start_ts, CAST(NULL AS VARCHAR) AS end_ts
        |  FROM c WHERE segment <> 'BUILDING'
        |  UNION ALL
        |  SELECT customer_id, balance, segment, false,
        |    '2024-01-01 00:00:00', '2024-06-01 00:00:00' FROM c WHERE segment = 'BUILDING'
        |  UNION ALL
        |  SELECT customer_id, balance + 100, segment, true,
        |    '2024-06-01 00:00:00', NULL FROM c WHERE segment = 'BUILDING'
        |) ORDER BY customer_id, start_ts""".stripMargin,

    "q18_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q19_antijoin" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q20_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events),
        |x AS (SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM x ORDER BY user_id, event_id""".stripMargin,

    "q21_histogram" ->
      """SELECT bucket, count(*) AS n, round(min(v), 4) AS min_v, round(max(v), 4) AS max_v FROM (
        |  SELECT CASE WHEN o_totalprice < 0 THEN 0
        |              WHEN o_totalprice >= 600000 THEN 21
        |              ELSE CAST(floor((o_totalprice - 0) / 30000.0) AS INT) + 1 END AS bucket,
        |         o_totalprice AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  count(*) AS n,
        |  round(sum(CAST(round("value" * 100) AS BIGINT)) / 100.0, 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q36_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_asof_join" ->
      """WITH ord AS (
        |  SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, round(o.o_totalprice, 2) AS matched_price
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q43_percentiles" ->
      """WITH j AS (
        |  SELECT n_name, CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, count(*) AS n_orders,
        |  ((CAST(round(quantile_cont(c, 0.5) * 100) AS BIGINT) + 50) // 100) / 100.0 AS p50,
        |  ((CAST(round(quantile_cont(c, 0.9) * 100) AS BIGINT) + 50) // 100) / 100.0 AS p90,
        |  ((CAST(round(quantile_cont(c, 0.99) * 100) AS BIGINT) + 50) // 100) / 100.0 AS p99,
        |  ((2 * sum(c) + count(*)) // (2 * count(*))) / 100.0 AS avg_price,
        |  round(sqrt((CAST(sum(c * c) AS DOUBLE)
        |    - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    / CAST(count(*) - 1 AS DOUBLE)) / 100.0, 2) AS sd_price
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q60_topk_sketch" ->
      """SELECT p_type AS item, count(*) AS cnt FROM part
        |GROUP BY 1 ORDER BY cnt DESC, item LIMIT 10""".stripMargin,

    "q62_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('second', ts) AS ts FROM events),
        |v AS (SELECT user_id, ts AS view_ts FROM ev WHERE event_type = 'view'),
        |b AS (SELECT user_id, ts AS buy_ts FROM ev WHERE event_type = 'purchase')
        |SELECT strftime(view_ts, '%Y-%m-%d') AS day,
        |  count(DISTINCT v.user_id) AS converting_users,
        |  count(*) AS n_conversions
        |FROM v JOIN b ON v.user_id = b.user_id
        |  AND buy_ts >= view_ts AND buy_ts <= view_ts + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q63_retention" ->
      """WITH ev AS (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day, day, count(DISTINCT user_id) AS active_users
        |FROM (SELECT DISTINCT user_id, day FROM ev) JOIN cohorts USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q64_argmin_join" ->
      """WITH best AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_cents
        |  FROM lineitem GROUP BY 1, 2),
        |ranked AS (
        |  SELECT l_partkey, l_suppkey, min_cents,
        |    row_number() OVER (PARTITION BY l_partkey ORDER BY min_cents, l_suppkey) AS rn
        |  FROM best)
        |SELECT l_partkey, l_suppkey AS best_supplier, min_cents / 100.0 AS min_price
        |FROM ranked WHERE rn = 1 ORDER BY l_partkey""".stripMargin,

    "q61_asof_native" ->
      """WITH ord AS (
        |  SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, round(o.o_totalprice, 2) AS matched_price
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q65_asof_sql" ->
      """WITH ord AS (
        |  SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, round(o.o_totalprice, 2) AS matched_price
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q66_versioned_merge" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_custkey % 10 = 0
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_custkey % 10 = 0 THEN 'fix' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q67_versioned_delta" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey""".stripMargin,

    // restore(v1) must undo both the v2 append and the v3 delete: the
    // oracle is the untouched base selection
    "q98_versioned_restore" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // the branch round trip's closed form: evens from the fork point,
    // plus the branch's odd-custkey5 append, minus the branch's delete
    "q105_versioned_branch" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE (o_orderkey % 2 = 0 OR (o_orderkey % 2 = 1 AND o_custkey % 5 = 0))
        |  AND NOT (o_orderstatus = 'F' AND o_custkey % 7 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    // branch-vs-main reconciliation from the closed form of the three
    // branch commits (delete %3, custkey bump on surviving %10==1,
    // append %100==1 clones)
    "q106_branch_diff" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
        |br AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 1 THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
        |    o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus
        |  FROM orders WHERE o_orderkey % 100 = 1)
        |SELECT coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change_type,
        |  CASE WHEN b.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL THEN
        |    concat_ws(',',
        |      CASE WHEN NOT (b.o_custkey IS NOT DISTINCT FROM n.o_custkey) THEN 'o_custkey' END,
        |      CASE WHEN NOT (b.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus) THEN 'o_orderstatus' END)
        |  END AS changed_cols,
        |  b.o_custkey AS old_o_custkey, n.o_custkey AS new_o_custkey,
        |  b.o_orderstatus AS old_o_orderstatus, n.o_orderstatus AS new_o_orderstatus
        |FROM base b FULL OUTER JOIN br n ON b.o_orderkey = n.o_orderkey
        |WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR NOT (b.o_custkey IS NOT DISTINCT FROM n.o_custkey)
        |   OR NOT (b.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
        |ORDER BY o_orderkey""".stripMargin,

    // the pure-SQL write statements land on q66's exact closed form
    "q91_sql_writes" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_custkey % 10 = 0
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_custkey % 10 = 0 THEN 'fix' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the derived avg must equal the flat sum/count quotient (spelled
    // out rather than AVG() so both engines divide the same exact
    // integer sum by the same count)
    "q82_matview_avg" ->
      """SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n_orders,
        |  round((sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 1.0
        |         / count(*)) / 100.0, 4) AS avg_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, month""".stripMargin,

    // upsert closed form: fixes win for o_orderkey < 1000, the rest
    // stay base, and the shifted insert keys append on top
    "q81_merge_pruned" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey < 1000
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_orderkey < 1000 THEN 'fix' ELSE 'base' END AS src
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS price, 'new' AS src
        |FROM orders WHERE o_orderkey % 500 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q121_delta_evolve" ->
      """SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS price
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus,
        |  CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS price
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "q122_delta_purge" ->
      """SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
        |WHERE o_custkey % 7 <> 2
        |ORDER BY o_orderkey""".stripMargin,

    // the restore's whole point: the read equals the untouched base
    "q124_delta_restore" ->
      """SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // the change feed's closed form: each commit's changes restated
    // over the raw table — v2's appended keys as inserts, v3's merge
    // as pre/postimage pairs (%10=4) plus inserts (%10=8), v4's
    // delete span (%10=1, untouched by the merge so base values)
    "q125_delta_cdf" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  'insert' AS change_type, CAST(2 AS BIGINT) AS commit_version
        |FROM orders WHERE o_orderkey % 10 = 7
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  'update_preimage', CAST(3 AS BIGINT)
        |FROM orders WHERE o_orderkey % 10 = 4
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'U', 'update_postimage', CAST(3 AS BIGINT)
        |FROM orders WHERE o_orderkey % 10 = 4
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, 'insert', CAST(3 AS BIGINT)
        |FROM orders WHERE o_orderkey % 10 = 8
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, 'delete', CAST(4 AS BIGINT)
        |FROM orders WHERE o_orderkey % 10 = 1
        |ORDER BY commit_version, change_type, o_orderkey""".stripMargin,

    // same closed form as q81 — deliberately: identical upsert
    // semantics through the Delta log's pruned merge
    "q118_delta_merge" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey < 1000
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_orderkey < 1000 THEN 'fix' ELSE 'base' END AS src
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS price, 'new' AS src
        |FROM orders WHERE o_orderkey % 500 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // compaction + retention must be row-identity: the full projection
    "q92_sql_maintenance" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // delete closed form: the surviving snapshot is the complement
    "q89_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE NOT (o_orderkey < 1000) ORDER BY o_orderkey""".stripMargin,

    // the two-level rollup's read-side aggregation reduces to a flat
    // exact NDV per status (q88's HLL variant has no DuckDB oracle)
    "q87_matview_ndv" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS ndv_cust,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // replaceWhere closed form: the o_orderkey<1000 span comes from
    // the re-priced backfill batch, everything else keeps base rows
    "q86_overwrite_where" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey < 1000
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 120 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_orderkey < 1000 THEN 'bf' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // evolved-read closed form: odd keys carry their status, the
    // pre-evolution even-key rows read the new column as NULL
    "q108_evolved_read" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // rebase-then-publish must lose NOTHING: main's base (even keys),
    // main's post-fork append (%4==3) and the branch's append (%4==1)
    // tile the whole key space — the closed form is the full table,
    // and any lost update (either side reverted) breaks the hash
    "q110_branch_rebase" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the checkpointed log must reconstruct the same content as the
    // replayed one: 'F' rows from the post-checkpoint overwrite batch,
    // every other partition from the checkpoint-carried appends
    "q109_delta_checkpoint" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F'
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_orderstatus = 'F' THEN 'ck' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // same closed form as q84: the delta-protocol dynamic overwrite
    // must produce byte-identical content through a different log
    "q107_delta_write" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F'
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 110 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_orderstatus = 'F' THEN 'po' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q117_delta_dv_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
        |WHERE o_orderstatus <> 'F' AND o_custkey % 10 <> 3
        |ORDER BY o_orderkey""".stripMargin,

    // renames/drops are metaData-only, so the closed form is the base
    // projection under the new names plus the post-alter append
    "q133_delta_alter" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS balance FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, round(c_acctbal, 2)
        |  FROM customer WHERE c_custkey % 100 = 0
        |) ORDER BY c_custkey""".stripMargin,

    // the violating batch fails whole, so the closed form is base +
    // valid rows only
    "q132_delta_constraint" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders WHERE o_custkey % 3 IN (0, 1)
        |ORDER BY o_orderkey""".stripMargin,

    // both updates recompute as CASE: predicates are independent
    // (update 2 keys on o_custkey, untouched by update 1) so the
    // sequential composition is the one-pass closed form
    "q131_delta_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'G' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_custkey % 7 = 0 THEN o_custkey * 2 + (o_orderkey % 10)
        |       ELSE o_custkey END AS o_custkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // widened round trip: both halves re-assemble orders, the widened
    // column reads back as BIGINT
    "q138_delta_widened" ->
      """SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // row ids from first principles: per-slice row_number in key order
    // plus the preceding slices' sizes (slice 0 = the backfilled
    // create, slices 1/2 = the appends' fresh ranges)
    "q139_delta_row_ids" ->
      """WITH s0 AS (SELECT o_orderkey,
        |              row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |            FROM orders WHERE o_orderkey % 3 = 0),
        |s1 AS (SELECT o_orderkey,
        |         row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |       FROM orders WHERE o_orderkey % 3 = 1),
        |s2 AS (SELECT o_orderkey,
        |         row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |       FROM orders WHERE o_orderkey % 3 = 2)
        |SELECT o_orderkey, CAST(rid AS BIGINT) AS _row_id FROM s0
        |UNION ALL
        |SELECT o_orderkey,
        |  CAST(rid + (SELECT count(*) FROM s0) AS BIGINT) AS _row_id FROM s1
        |UNION ALL
        |SELECT o_orderkey,
        |  CAST(rid + (SELECT count(*) FROM s0) + (SELECT count(*) FROM s1) AS BIGINT) AS _row_id
        |FROM s2
        |ORDER BY o_orderkey""".stripMargin,

    // merge-stable ids from first principles: the ids are q139's
    // per-slice row_number reconstruction (two %2 slices), UNCHANGED by
    // the merge — only o_custkey moves (the update-only upsert's CASE)
    "q140_delta_merge_ids" ->
      """WITH s0 AS (SELECT o_orderkey, o_custkey,
        |              row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |            FROM orders WHERE o_orderkey % 2 = 0),
        |s1 AS (SELECT o_orderkey, o_custkey,
        |         row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |       FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_orderkey,
        |  CASE WHEN o_custkey % 5 = 0 THEN o_custkey * 100 ELSE o_custkey END AS o_custkey,
        |  CAST(rid AS BIGINT) AS _row_id FROM s0
        |UNION ALL
        |SELECT o_orderkey,
        |  CASE WHEN o_custkey % 5 = 0 THEN o_custkey * 100 ELSE o_custkey END AS o_custkey,
        |  CAST(rid + (SELECT count(*) FROM s0) AS BIGINT) AS _row_id FROM s1
        |ORDER BY o_orderkey""".stripMargin,

    // the change feed from first principles: ids are the two-slice
    // row_number reconstruction; each commit's change rows follow from
    // its disjoint %7 predicate (v2 insert = slice 1, v3 delete, v4
    // update pre/post, v5 merge pre/post) with the id INVARIANT across
    // pre/postimages
    "q141_delta_cdf_ids" ->
      """WITH s0 AS (SELECT o_orderkey, o_custkey,
        |              row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |            FROM orders WHERE o_orderkey % 8 = 0),
        |s1 AS (SELECT o_orderkey, o_custkey,
        |         row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |       FROM orders WHERE o_orderkey % 8 = 1),
        |ids AS (SELECT o_orderkey, o_custkey, rid FROM s0
        |        UNION ALL
        |        SELECT o_orderkey, o_custkey,
        |          rid + (SELECT count(*) FROM s0) AS rid FROM s1)
        |SELECT o_orderkey, o_custkey, 'insert' AS _change_type,
        |  CAST(2 AS BIGINT) AS _commit_version, CAST(rid AS BIGINT) AS _row_id
        |FROM ids WHERE o_orderkey % 8 = 1
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'delete', 3, rid
        |FROM ids WHERE o_orderkey % 7 = 3
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'update_preimage', 4, rid
        |FROM ids WHERE o_orderkey % 7 = 5
        |UNION ALL
        |SELECT o_orderkey, o_custkey + 1000000, 'update_postimage', 4, rid
        |FROM ids WHERE o_orderkey % 7 = 5
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'update_preimage', 5, rid
        |FROM ids WHERE o_orderkey % 7 = 1
        |UNION ALL
        |SELECT o_orderkey, o_custkey * 10, 'update_postimage', 5, rid
        |FROM ids WHERE o_orderkey % 7 = 1
        |ORDER BY o_orderkey, _commit_version, _change_type""".stripMargin,

    // the variant round trip from first principles: the JSON document
    // is built from the row's own columns, so every typed extraction
    // inverts to the base column; the DV delete and the filter are the
    // same %7 / %3 predicates on o_orderkey
    "q142_delta_variant" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority,
        |  CAST(NULL AS VARCHAR) AS absent
        |FROM orders
        |WHERE o_orderkey % 7 <> 2 AND o_orderkey % 3 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // row-tracking round trip: base ∪ shifted append, then the merge's
    // upsert closed form (source keys take the 'X' image, the rest carry)
    "q137_delta_row_tracking" ->
      """WITH t1 AS (
        |  SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus, o_custkey
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT o_orderkey,
        |  CASE WHEN o_custkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_custkey % 3 = 0 THEN o_custkey * 10 ELSE o_custkey END AS o_custkey
        |FROM t1 ORDER BY o_orderkey""".stripMargin,

    // dynamic-overwrite closed form: 'F' rows come from the re-priced
    // overwrite batch, every other partition keeps its base rows
    "q84_partition_overwrite" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F'
        |       THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 110 + 50) // 100) / 100.0
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 END AS price,
        |  CASE WHEN o_orderstatus = 'F' THEN 'po' ELSE 'base' END AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the two append commits re-assemble the full lineitem projection,
    // so the DSv2 read reduces to a flat filtered GROUP BY
    "q83_dsv2_read" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_quantity >= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q71_snapshot_diff" -> snapshotDiffSql,
    "q72_versioned_cdc" -> snapshotDiffSql,

    // the append-only fast path emits the delta as 'added' rows with
    // null old-sides — closed-form from the odd-key delta commit
    "q77_cdc_append_sql" ->
      """SELECT o_orderkey, 'added' AS change_type, CAST(NULL AS VARCHAR) AS changed_cols,
        |  CAST(NULL AS BIGINT) AS old_o_custkey, o_custkey AS new_o_custkey,
        |  CAST(NULL AS VARCHAR) AS old_status, o_orderstatus AS new_status
        |FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey""".stripMargin,

    // the YAML/GRAFT_REFRESH route must land on the same flat GROUP BY
    "q78_matview_yaml" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
        |  max(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q75_incremental_rollup" ->
      """SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
        |  min(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS min_price,
        |  max(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS max_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q48_corr" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(corr(l_discount, l_extendedprice), 4) AS corr_disc_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q51_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q52_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q53_cube" ->
      """SELECT n_name, o_orderstatus, count(*) AS n_orders,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, o_orderstatus)
        |ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q54_range_agg" ->
      """SELECT e.event_id, e.user_id,
        |  count(o.o_orderdate) AS n_orders_30d,
        |  round(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) / 100.0, 2) AS spend_30d
        |FROM events e LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey
        | AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
        | AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts - INTERVAL 30 DAY
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q55_sliding" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type, "value" FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, "value" FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |  count(*) AS n,
        |  round(sum(CAST(round("value" * 100) AS BIGINT)) / 100.0, 2) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q56_scaling" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  round(CAST(cents - min(cents) OVER w AS DOUBLE)
        |    / (max(cents) OVER w - min(cents) OVER w), 6) AS scaled,
        |  round((cents - CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w) / 100.0, 2) AS dev_from_mean
        |FROM o WINDOW w AS (PARTITION BY o_orderstatus)
        |ORDER BY o_orderkey""".stripMargin)
}
