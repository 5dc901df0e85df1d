package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (graft's take on drune's DataQualityManager
  * reporting) — counts / null counts / exact NDV / min / max for every
  * requested column in a SINGLE aggregation pass, then pivoted to one
  * row per column via explode of a struct array (a pure projection on
  * the one-row aggregate — no extra scan, no driver loop).
  */
object Profiler {
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__nonnull"),
        countDistinct(col(c)).as(s"__${c}__ndv"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__total").as("n_rows"),
        col(s"__${c}__nonnull").as("n_nonnull"),
        col(s"__${c}__ndv").as("n_distinct"),
        col(s"__${c}__min").as("min_value"),
        col(s"__${c}__max").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
