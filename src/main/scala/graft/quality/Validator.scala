package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

final case class ColumnConstraints(column: String, constraints: Seq[Constraint])

/** Output of a validation pass.
  * `valid` — input minus drop-rule violations, set_null applied.
  * `failureLog` — one row per (row, violated rule) for warn rules
  *   (spark/steps/validator.py log schema).
  * `summary` — violation counts per (column, rule, action), ALL rules.
  */
final case class ValidationResult(valid: DataFrame, failureLog: DataFrame, summary: DataFrame)

final class ValidationException(msg: String) extends RuntimeException(msg)

/** Single-pass rule evaluation.
  *
  * Reference behavior: spark/steps/validator.py:479-573 runs, for EVERY
  * rule, a `filter(~cond)` + `.count()` + a second filtered DF — at k
  * rules that is O(k) full scans of the input. graft compiles all rule
  * predicates into one projection: an array of per-rule structs that is
  * exploded for the log and a conjunction for the drop filter, so the
  * whole rule set costs one scan (plus one shuffle per `unique` column,
  * which genuinely needs cross-row context). At 100 TB this is the
  * difference between 1 pass and 2k passes.
  *
  * Null semantics: nulls pass every rule except `not_null` (and count
  * toward `unique` groups only when non-null) — drune's `~cond` filters
  * silently drop null rows from BOTH failure and success sets
  * (rules.py:10-14 with a null comparison); graft makes the contract
  * explicit instead.
  */
object Validator {

  private def actionName(a: OnFail): String = a match {
    case FailAction => "fail"
    case DropAction => "drop"
    case WarnAction => "warn"
    case SetNullAction => "set_null"
  }

  private def uniqFlag(c: String) = s"__uniq_ok_$c"

  def validate(df: DataFrame, pipelineName: String, specs: Seq[ColumnConstraints]): ValidationResult = {
    val uniqueCols = specs.collect {
      case cc if cc.constraints.exists(_.rule == Unique) => cc.column
    }.distinct
    // Unique needs a per-key count: one shuffle per distinct key column.
    val working = uniqueCols.foldLeft(df) { (d, c) =>
      d.withColumn(uniqFlag(c),
        count(col(c)).over(Window.partitionBy(col(c))) <= 1 || col(c).isNull)
    }

    def ok(column: String, rule: Rule): Column = rule match {
      case Unique  => col(uniqFlag(column))
      case NotNull => col(column).isNotNull
      case r       => col(column).isNull || coalesce(r.passes(col(column)), lit(false))
    }

    val all = for { cc <- specs; k <- cc.constraints } yield (cc.column, k)

    val violStructs = all.map { case (c, k) =>
      struct(
        lit(c).as("failed_column"),
        lit(k.rule.name).as("validation_rule"),
        lit(actionName(k.onFail)).as("action"),
        col(c).cast("string").as("failed_value"),
        ok(c, k.rule).as("ok"))
    }

    // Reference log schema (validator.py:47-58, spark_engine.py:188-197):
    // the consolidated log carries a timestamp and the offending row's
    // hash_key so a warn-log sink can be joined back to bad rows. The
    // reference consolidates ONLY warn-rule failures (validator.py:39
    // filters on_fail == 'warn' before appending to the log list) —
    // drop/fail/set_null violations are acted on, not logged — so the
    // log filters on action; `summary` below still counts every action.
    val violations =
      if (violStructs.isEmpty)
        df.sparkSession.emptyDataFrame
      else {
        val hk = if (df.columns.contains("hash_key")) col("hash_key")
                 else lit(null).cast("string")
        working
          .select(hk.as("__hk"), explode(array(violStructs: _*)).as("v"))
          .where(!col("v.ok"))
          .select(
            lit(pipelineName).as("pipeline_name"),
            col("v.validation_rule"),
            col("v.failed_column"),
            col("v.failed_value"),
            col("v.action"),
            current_timestamp().as("log_timestamp"),
            col("__hk").as("hash_key"))
      }

    val failureLog =
      if (violStructs.isEmpty) violations
      else violations.where(col("action") === "warn")

    val summary =
      if (violStructs.isEmpty) df.sparkSession.emptyDataFrame
      else violations
        .groupBy("failed_column", "validation_rule", "action")
        .agg(count(lit(1)).as("violations"))

    val dropPred = all.collect { case (c, Constraint(r, DropAction)) => ok(c, r) }
      .reduceOption(_ && _).getOrElse(lit(true))

    val setNulled = all.collect { case (c, Constraint(r, SetNullAction)) => (c, r) }
      .foldLeft(working.where(dropPred)) { case (d, (c, r)) =>
        d.withColumn(c, when(ok(c, r), col(c)).otherwise(lit(null).cast(d.schema(c).dataType)))
      }

    val valid = uniqueCols.foldLeft(setNulled)((d, c) => d.drop(uniqFlag(c)))
    ValidationResult(valid, failureLog, summary)
  }

  /** Abort (validator.py 'fail' path) if any fail-action rule has
    * violations. One small action on the pre-aggregated summary.
    */
  def enforce(result: ValidationResult): Unit = {
    if (result.summary.schema.nonEmpty) {
      val fails = result.summary.where(col("action") === "fail").collect()
      if (fails.nonEmpty) {
        val msg = fails.map(r => s"${r.getAs[String]("failed_column")} ${r.getAs[String]("validation_rule")}: ${r.getAs[Long]("violations")} violations").mkString("; ")
        throw new ValidationException(s"validation failed: $msg")
      }
    }
  }

  /** Table-level rules (rules.py DuplicateCheckValidation): returns the
    * offending key groups (empty = pass). Aggregation, not collect —
    * stays distributed.
    */
  def checkTable(df: DataFrame, rule: TableRule): DataFrame = rule match {
    case DuplicateCheck(cols) =>
      df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1)
  }
}
