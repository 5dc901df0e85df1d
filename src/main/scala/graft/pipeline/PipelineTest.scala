package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Pipeline test-mode support — graft's equivalent of drune's TestStep
  * + compare_dataframes (reference: engines/spark/steps/tester.py,
  * spark_engine.py:206-230): run a pipeline against fixture input and
  * diff the result against an expected dataset, ignoring volatile
  * control columns.
  */
object PipelineTest {

  val volatileColumns: Seq[String] =
    Seq("updated_at", "created_at", "start_date", "end_date", "log_timestamp")

  final case class Diff(missing: DataFrame, unexpected: DataFrame) {
    def isEmpty: Boolean = missing.isEmpty && unexpected.isEmpty
  }

  /** Symmetric multiset diff (exceptAll both ways), volatile columns
    * dropped. Distributed — no collect; callers check `isEmpty` (two
    * short-circuiting jobs) or inspect the diff frames.
    */
  def compare(actual: DataFrame, expected: DataFrame): Diff = {
    def strip(df: DataFrame) = df.drop(volatileColumns.filter(df.columns.contains): _*)
    val a = strip(actual)
    val e = strip(expected)
    require(a.schema.fields.map(f => (f.name, f.dataType)).sameElements(
      e.schema.fields.map(f => (f.name, f.dataType))),
      s"schema mismatch: ${a.schema.simpleString} vs ${e.schema.simpleString}")
    Diff(missing = e.exceptAll(a), unexpected = a.exceptAll(e))
  }

  /** Run the pipeline spec and assert its output equals `expected`
    * (tester.py execute flow). Throws with the differing rows rendered.
    */
  def assertMatches(spark: org.apache.spark.sql.SparkSession, spec: PipelineSpec, expected: DataFrame): Unit = {
    val actual = Pipeline(spark, spec.copy(sink = None)).run()
    val diff = compare(actual, expected)
    if (!diff.isEmpty) {
      val miss = diff.missing.limit(5).collect().mkString("\n  ")
      val extra = diff.unexpected.limit(5).collect().mkString("\n  ")
      throw new AssertionError(
        s"pipeline ${spec.name} output differs.\nmissing rows:\n  $miss\nunexpected rows:\n  $extra")
    }
  }
}
