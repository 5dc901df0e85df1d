package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Plain `spark.read.parquet` keeps the scan a v1/v2 FileSourceScan so
  * Catalyst pushdown (PushedFilters / ReadSchema pruning) applies; at
  * cluster scale the same call on a partitioned table gets partition
  * pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (early
      // driver generations) and TIMESTAMP(MICROS, ntz) (later ones), so
      // the loader adapts to the footer instead of assuming either:
      //  - NANOS: Spark 4 refuses to map ns to its µs TimestampType, so
      //    read nanos as long, then integer-divide (`div`, not double /:
      //    ns epochs exceed double's 53-bit mantissa) down to µs — the
      //    same truncation DuckDB applies comparing ns to µs timestamps.
      //  - MICROS ntz (read back as TIMESTAMP_NTZ): cast to the
      //    session-TZ TimestampType — the session is pinned UTC, so the
      //    wall-clock field values are unchanged and downstream window/
      //    as-of arithmetic and the DuckDB oracle see identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
