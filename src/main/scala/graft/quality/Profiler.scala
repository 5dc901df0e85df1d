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

  /** Sketch-based profile — the 100 TB variant of [[profile]]: exact
    * count-distinct is a full shuffle of every distinct value per
    * column (the `expand` plan multiplies the input by the column
    * count), while HyperLogLog++ and quantile sketches aggregate
    * map-side into KB-sized buffers and merge — one pass, no
    * value-level shuffle, error bounded by `rsd` / `accuracy`.
    * Numeric columns get approximate p50/p90 alongside min/max.
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val numeric = df.schema.fields
      .filter(f => cols.contains(f.name))
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__nonnull"),
        approx_count_distinct(col(c), rsd).as(s"__${c}__ndv"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max")) ++
        (if (numeric(c))
          Seq(percentile_approx(col(c).cast("double"), lit(0.5), lit(accuracy)).as(s"__${c}__p50"),
            percentile_approx(col(c).cast("double"), lit(0.9), lit(accuracy)).as(s"__${c}__p90"))
        else Seq(lit(null).cast("double").as(s"__${c}__p50"),
          lit(null).cast("double").as(s"__${c}__p90")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__total").as("n_rows"),
        col(s"__${c}__nonnull").as("n_nonnull"),
        col(s"__${c}__ndv").as("approx_ndv"),
        col(s"__${c}__min").as("min_value"),
        col(s"__${c}__max").as("max_value"),
        col(s"__${c}__p50").as("approx_p50"),
        col(s"__${c}__p90").as("approx_p90"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
