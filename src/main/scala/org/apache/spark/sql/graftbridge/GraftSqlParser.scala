package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the native as-of join: a delegating parser that
  * recognizes the statement form
  *
  * {{{
  * GRAFT_ASOF(left_rel, right_rel, key, left_time, right_time, p1[, p2...])
  * }}}
  *
  * and plans it straight onto [[AsOfJoinPlan]] (-> AsOfJoinExec), so a
  * pure-SQL user reaches the merge-scan operator without touching the
  * DataFrame API — compose it into larger SQL by capturing the result
  * as a temp view, the same chaining the pipeline Sql step uses. Every
  * other statement passes through to Spark's parser unchanged.
  *
  * Relation arguments resolve through the session catalog (temp views
  * and catalog tables, dotted names allowed); the remaining arguments
  * are bare column names. Semantics, type widening, pruning and the
  * float-key normalization all come from [[AsOfJoinPlan.of]] — this
  * class is syntax only.
  */
class GraftSqlParser(session: org.apache.spark.sql.classic.SparkSession,
                     delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser.AsOfStmt

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case AsOfStmt(l, r, key, lt, rt, payload) =>
      val payloadCols = payload.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      AsOfJoinPlan.of(session.table(l), session.table(r), key, lt, rt, payloadCols)
        .queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = sqlText match {
    case AsOfStmt(_, _, _, _, _, _) => parsePlan(sqlText)
    case _ => delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  /** Anchored statement matcher — deliberately strict (identifiers
    * only) so anything else, including look-alike typos with string
    * literals or expressions, falls through to Spark's parser and
    * fails with its normal diagnostics.
    */
  private val AsOfStmt =
    """(?is)^\s*GRAFT_ASOF\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*,\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s*;?\s*$""".r
}
