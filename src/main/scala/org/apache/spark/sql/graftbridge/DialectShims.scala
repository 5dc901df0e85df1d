package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** SQL-dialect compatibility shims for reference pipeline YAMLs.
  *
  * drune passes column `expression` strings verbatim to whichever
  * engine runs the pipeline, so the shipped examples use duckdb/pandas
  * dialect (reference examples/pipelines/customer/model.yml:61
  * `string_split(...)`). These register native Catalyst builders —
  * codegen'd expressions, not UDFs — for the duckdb spellings Spark
  * lacks, so such YAMLs run unmodified.
  *
  * Caveats, inherent to cross-engine expression strings: Spark array
  * subscripts are 0-based where duckdb's are 1-based, and
  * `string_split` here treats the separator as a regex (single-char
  * separators like '@' behave identically).
  */
object DialectShims {
  def register(spark: SparkSession): Unit =
    // The full graft SQL surface (which includes the duckdb-dialect
    // string_split shim) — pipeline SQL steps and column expressions
    // can call the native kernels directly.
    GraftFunctions.register(spark)
}
