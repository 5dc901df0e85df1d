package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Opt-in optimizer rule: bucketize range-only theta joins.
  *
  * An INNER join whose condition is a pure interval test
  * `p >= lo AND p <= hi` carries no equi predicate, so Spark plans a
  * BroadcastNestedLoopJoin — every point row compared against every
  * interval row, O(n·m), the classic cluster-killer at scale. With
  * `spark.graft.rangeJoin.bucketWidth` set (> 0), this rule rewrites
  * the join to the bucketed equivalent of
  * `graft.operators.Relational.intervalJoin`:
  *
  *   - the point side projects `floor(p / width)` as its bucket id;
  *   - the interval side explodes to one row per covered bucket
  *     (`sequence(floor(lo/w), floor(hi/w))`);
  *   - the join becomes bucket-id EQUALITY plus the original exact
  *     range filter — a shuffled/broadcast HASH join.
  *
  * A point matches an interval in exactly ONE bucket (its own), so the
  * rewrite emits each qualifying pair exactly once — result-identical
  * to the nested loop. Candidate volume is O(m·(len/width + 1) + n)
  * instead of n·m comparisons.
  *
  * The rule is a no-op unless the conf is set: a bucket width is a
  * data-dependent choice (≈ the typical interval length), so it is
  * explicit opt-in rather than a guess. Idempotent by construction —
  * the rewritten condition has three conjuncts and no longer matches
  * the two-conjunct pattern.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) and
  * usable imperatively through `spark.experimental.extraOptimizations`.
  */
case class RangeJoinBucketing(spark: SparkSession) extends Rule[LogicalPlan] {

  val confKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = spark.conf.getOption(confKey).map(_.toDouble).getOrElse(0.0)
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        extract(cond, left, right)
          .map { case (p, lo, hi, pointLeft) => rewrite(j, p, lo, hi, pointLeft, width) }
          .getOrElse(j)
    }
  }

  /** Match `p >= lo AND p <= hi` in any orientation: `p` an attribute
    * of one join side, `lo` and `hi` attributes of the other, all
    * numeric. Returns (p, lo, hi, pointSideIsLeft).
    */
  private def extract(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Boolean)] = {
    def attr(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case _ => None
    }
    // normalize a conjunct to ge = (bigger, smaller)
    def ge(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(a, b) => for { x <- attr(a); y <- attr(b) } yield (x, y)
      case LessThanOrEqual(a, b)    => for { x <- attr(a); y <- attr(b) } yield (y, x)
      case _ => None
    }
    def tryPair(c1: Expression, c2: Expression) = (ge(c1), ge(c2)) match {
      // c1: p >= lo, c2: hi >= p
      case (Some((p1, lo)), Some((hi, p2))) if p1.semanticEquals(p2) =>
        val pointLeft = left.outputSet.contains(p1)
        val pointSide = if (pointLeft) left else right
        val ivSide = if (pointLeft) right else left
        val ok = pointSide.outputSet.contains(p1) &&
          ivSide.outputSet.contains(lo) && ivSide.outputSet.contains(hi) &&
          Seq(p1, lo, hi).forall(_.dataType.isInstanceOf[NumericType])
        if (ok) Some((p1, lo, hi, pointLeft)) else None
      case _ => None
    }
    cond match {
      case And(c1, c2) => tryPair(c1, c2).orElse(tryPair(c2, c1))
      case _ => None
    }
  }

  private def rewrite(j: Join, p: Attribute, lo: Attribute, hi: Attribute,
                      pointLeft: Boolean, width: Double): LogicalPlan = {
    def bucketOf(e: Expression): Expression =
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(width, DoubleType))), LongType)
    val pointSide = if (pointLeft) j.left else j.right
    val ivSide = if (pointLeft) j.right else j.left
    val pBucket = Alias(bucketOf(p), "__graft_bucket_p")()
    val pointProj = Project(pointSide.output :+ pBucket, pointSide)
    val ivBucket = AttributeReference("__graft_bucket_iv", LongType)()
    val gen = Generate(
      // Sequence is TimeZoneAware — without an explicit zone the node
      // is unresolved and the optimizer-batch validator rejects it.
      // Step stays INFERRED (stepOpt = None): an explicit +1 step makes
      // sequence() throw on an inverted interval (lo > hi), where the
      // nested-loop plan would simply emit no rows — with the inferred
      // step an inverted interval yields a descending bucket list whose
      // matches the exact range filter then rejects, preserving
      // empty-result semantics instead of crashing.
      Explode(new Sequence(bucketOf(lo), bucketOf(hi), None,
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ivBucket), child = ivSide)
    val eq = EqualTo(pBucket.toAttribute, ivBucket)
    val (newLeft, newRight) = if (pointLeft) (pointProj, gen) else (gen, pointProj)
    Project(j.output, Join(newLeft, newRight, Inner, Some(And(eq, j.condition.get)), j.hint))
  }
}
