package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality rules — graft's equivalent of drune's constraint registry
  * (reference: src/drune/engines/spark/quality/rules.py:1-100,
  * core/quality/constraint.py). Each rule compiles to a Catalyst
  * `Column` predicate so the whole rule set evaluates inside one
  * whole-stage-codegen'd scan; drune instead runs TWO filter+count jobs
  * per rule (validator.py:492-494), i.e. 2k scans for k rules.
  */
sealed trait Rule {
  def name: String
  /** Predicate that is TRUE when the value passes. */
  def passes(c: Column): Column
}

case object NotNull extends Rule {
  val name = "not_null"
  def passes(c: Column): Column = c.isNotNull
}
/** rules.py PatternValidation — rlike regex. */
final case class Pattern(regex: String) extends Rule {
  val name = s"pattern:$regex"
  def passes(c: Column): Column = c.rlike(regex)
}
final case class IsIn(values: Seq[Any]) extends Rule {
  val name = s"isin:${values.mkString(",")}"
  def passes(c: Column): Column = c.isin(values: _*)
}
final case class Gte(value: Double) extends Rule {
  val name = s"greater_than_or_equal_to:$value"
  def passes(c: Column): Column = c >= value
}
final case class Lte(value: Double) extends Rule {
  val name = s"less_than_or_equal_to:$value"
  def passes(c: Column): Column = c <= value
}
final case class Between(lo: Double, hi: Double) extends Rule {
  val name = s"isbetween:[$lo,$hi]"
  def passes(c: Column): Column = c.between(lo, hi)
}
final case class MinLength(n: Int) extends Rule {
  val name = s"min_length:$n"
  def passes(c: Column): Column = length(c) >= n
}
/** Uniqueness needs cross-row context — evaluated via a window count in
  * Validator (one shuffle on the column), not per-row.
  */
case object Unique extends Rule {
  val name = "unique"
  def passes(c: Column): Column = lit(true) // handled specially
}

sealed trait OnFail
/** Abort the pipeline when any row violates (validator.py 'fail'). */
case object FailAction extends OnFail
/** Remove violating rows (validator.py 'drop'). */
case object DropAction extends OnFail
/** Keep rows, emit log entries (validator.py 'warn'). */
case object WarnAction extends OnFail
/** Null out the offending value (constraint.py on_fail 'set_null'). */
case object SetNullAction extends OnFail

final case class Constraint(rule: Rule, onFail: OnFail = FailAction)

/** Table-level rules (rules.py DuplicateCheckValidation). */
sealed trait TableRule { def name: String }
final case class DuplicateCheck(columns: Seq[String]) extends TableRule {
  val name = s"duplicate_check:${columns.mkString(",")}"
}
