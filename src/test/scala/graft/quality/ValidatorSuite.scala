package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidatorSuite extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alice", 10.0),
    (2L, "bo", -5.0),
    (3L, null, 100.0),
    (4L, "dave", 10.0),
    (4L, "dave2", 2000.0)
  ).toDF("id", "name", "score")

  test("single-pass summary counts every rule violation") {
    val res = Validator.validate(df, "t", Seq(
      ColumnConstraints("name", Seq(Constraint(NotNull, WarnAction), Constraint(MinLength(3), WarnAction))),
      ColumnConstraints("score", Seq(Constraint(Between(0, 1000), WarnAction))),
      ColumnConstraints("id", Seq(Constraint(Unique, WarnAction)))))
    val m = res.summary.collect().map(r =>
      (r.getAs[String]("failed_column"), r.getAs[String]("validation_rule")) -> r.getAs[Long]("violations")).toMap
    assert(m(("name", "not_null")) == 1)
    assert(m(("name", "min_length:3")) == 1) // "bo"; null name passes min_length
    assert(m(("score", "isbetween:[0.0,1000.0]")) == 2) // -5, 2000
    assert(m(("id", "unique")) == 2) // both id=4 rows flagged
  }

  test("drop removes violating rows only; nulls pass non-null rules") {
    val res = Validator.validate(df, "t", Seq(
      ColumnConstraints("score", Seq(Constraint(Gte(0.0), DropAction)))))
    assert(res.valid.count() == 4)
    assert(res.valid.where("id = 2").count() == 0)
  }

  test("set_null nulls the offending value, keeps the row") {
    val res = Validator.validate(df, "t", Seq(
      ColumnConstraints("score", Seq(Constraint(Lte(100.0), SetNullAction)))))
    assert(res.valid.count() == 5)
    assert(res.valid.where("score IS NULL").count() == 1)
  }

  test("failure log carries rule, column, value") {
    val res = Validator.validate(df, "pipe", Seq(
      ColumnConstraints("name", Seq(Constraint(NotNull, WarnAction)))))
    val log = res.failureLog.collect()
    assert(log.length == 1)
    assert(log(0).getAs[String]("pipeline_name") == "pipe")
    assert(log(0).getAs[String]("failed_column") == "name")
  }

  test("duplicate_check table rule finds dup keys") {
    val bad = Validator.checkTable(df, DuplicateCheck(Seq("id")))
    assert(bad.collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("profiler: one-pass stats per column") {
    val p = Profiler.profile(df, Seq("id", "name", "score")).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(p("name").getAs[Long]("n_nonnull") == 4)
    assert(p("id").getAs[Long]("n_distinct") == 4)
    assert(p("score").getAs[String]("min_value") == "-5.0")
  }

  test("sketch profile: approx ndv within rsd bound, quantiles near exact") {
    val wide = spark.range(10000L).toDF("id")
      .withColumn("v", (col("id") % 1000).cast("double"))
      .withColumn("s", concat(lit("cat_"), col("id") % 7))
    val p = Profiler.profileApprox(wide, Seq("id", "v", "s"), rsd = 0.05).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(math.abs(p("id").getAs[Long]("approx_ndv") - 10000L) <= 10000 * 0.15)
    assert(math.abs(p("v").getAs[Long]("approx_ndv") - 1000L) <= 1000 * 0.15)
    assert(p("s").getAs[Long]("approx_ndv") == 7L) // small NDV is exact in HLL++
    val p50 = p("v").getAs[Double]("approx_p50")
    assert(p50 >= 400 && p50 <= 600, s"p50 $p50 far from 499.5")
    assert(p("s").isNullAt(p("s").fieldIndex("approx_p50"))) // non-numeric → null
  }
}
