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

  /** Test mode (`drune test`, tester.py:10-45): re-point the primary
    * file source at the fixture path from the spec's `test:` section,
    * run the pipeline sink-less, and diff against the expected dataset.
    */
  def runTestMode(spark: org.apache.spark.sql.SparkSession, spec: PipelineSpec): Unit = {
    val ts = spec.test.getOrElse(throw new IllegalArgumentException(
      s"pipeline ${spec.name}: no test: section in the spec"))
    // The fixture can only re-point a FILE primary; silently leaving a
    // table/sql primary in place would run the "test" against live
    // data with the fixture ignored.
    spec.sources.headOption match {
      case Some(_: FileSource) => ()
      case other => throw new IllegalArgumentException(
        s"pipeline ${spec.name}: test mode requires a file primary source, " +
          s"got ${other.map(_.getClass.getSimpleName).getOrElse("none")}")
    }
    val primary = spec.sources.headOption.map(_.name)
    val fixtured = spec.copy(sources = spec.sources.map {
      case f: FileSource if primary.contains(f.name) => f.copy(path = ts.sourcePath)
      case s => s
    })
    val expected = spark.read.format(ts.expectedFormat).load(ts.expectedPath)
    assertMatches(spark, fixtured, expected)
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
