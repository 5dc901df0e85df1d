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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // map to its µs TimestampType. Read nanos as long, then integer-
      // divide (`div`, not double /: ns epochs exceed double's 53-bit
      // mantissa) down to µs — same truncation DuckDB applies comparing
      // ns to µs timestamps.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
