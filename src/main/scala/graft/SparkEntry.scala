package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = base ++
    RelationalQueries.queries ++ TextQueries.queries

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q01: TPC-H Q1-style pricing summary — partial (map-side) aggregation
    // then one shuffle on the two low-cardinality group keys; AQE
    // coalesces post-shuffle partitions at scale.
    "q01_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // quantity is integer-valued — its sum/avg are exact in double
          // at any scale. Money sums go through exact integer units:
          // round(sum(double),2) erodes once sqrt(N)*ulp(total) nears a
          // half-cent (~sf10 for these tables, SURVEY §5). Base price is
          // 2dp -> cents; the discounted product is 4dp -> 1e-4 units,
          // rounded to cents as floor((x+50)/100) in integer math — the
          // pmod term makes Spark's truncating `div` a FLOOR division,
          // matching DuckDB's `//` on negative totals too.
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(expr("cast(round(l_extendedprice * 100) as bigint)")) / 100.0, 2).as("sum_base_price"),
          expr("((sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)) + 50" +
            " - pmod(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)) + 50, 100)) div 100) / 100.0D").as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100) / 100.0 AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) ++ RelationalQueries.oracle ++ TextQueries.oracle
}
