package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
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
  * Intervals spanning more than `spark.graft.rangeJoin.maxBuckets`
  * buckets (default 10k — a width far below the interval scale, or one
  * outlier row) take a nested-loop FALLBACK branch instead: exploding
  * them would materialize a per-row bucket array up to Spark's array
  * limit and fail a query the slow plan would have completed. Each
  * interval row lands in exactly one branch (and rows with a NULL
  * bound land in neither — they can match nothing), so the union stays
  * duplicate-free and result-identical.
  *
  * The rule is a no-op unless the conf is set: a bucket width is a
  * data-dependent choice (≈ the typical interval length), so it is
  * explicit opt-in rather than a guess. Idempotent under the
  * fixed-point optimizer batch: the bucketed branch's condition grows
  * a third conjunct (no longer matches the two-conjunct pattern), and
  * the fallback branch is recognized STRUCTURALLY — its interval side
  * is this rule's own span Filter (a floor-based predicate directly on
  * the join input), which the matcher refuses to rewrite again. A
  * cosmetic marker conjunct would not survive BooleanSimplification in
  * the same batch and would loop.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) and
  * usable imperatively through `spark.experimental.extraOptimizations`.
  */
case class RangeJoinBucketing(spark: SparkSession) extends Rule[LogicalPlan] {

  val confKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A malformed conf must produce ONE clear error, not an opaque
    // NumberFormatException from inside the optimizer on every query.
    val width = spark.conf.getOption(confKey).map { v =>
      v.toDoubleOption.getOrElse(throw new IllegalArgumentException(
        s"$confKey must be numeric, got '$v'"))
    }.getOrElse(0.0)
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
    if (isOwnRewrite(left) || isOwnRewrite(right)) None
    else cond match {
      case And(c1, c2) => tryPair(c1, c2).orElse(tryPair(c2, c1))
      case _ => None
    }
  }

  /** Recognize a join side this rule itself produced: the fallback
    * branch's interval side is our span Filter (floor-based predicate),
    * the bucketed branch's is our Generate / bucket projection. The
    * walk follows the whole Project/Filter chain — sibling rules in the
    * same fixed-point batch (ColumnPruning, CombineFilters,
    * PushDownPredicates) freely insert Projects or merge Filters above
    * our nodes, and a top-node-only check would stop recognizing the
    * rewrite and loop. A floor-filtered side someone else built is
    * merely skipped — a false negative costs the optimization, never
    * correctness.
    */
  private def isOwnRewrite(side: LogicalPlan): Boolean = side match {
    case Filter(cond, child) =>
      cond.exists(_.isInstanceOf[Floor]) || isOwnRewrite(child)
    case Project(projectList, child) =>
      projectList.exists(_.name.startsWith("__graft_bucket")) || isOwnRewrite(child)
    case g: Generate =>
      g.generatorOutput.exists(_.name == "__graft_bucket_iv")
    case _ => false
  }

  private def rewrite(j: Join, p: Attribute, lo: Attribute, hi: Attribute,
                      pointLeft: Boolean, width: Double): LogicalPlan = {
    val maxBuckets = spark.conf.getOption("spark.graft.rangeJoin.maxBuckets")
      .flatMap(_.toLongOption).getOrElse(10000L)
    def bucketOf(e: Expression): Expression =
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(width, DoubleType))), LongType)
    val pointSide = if (pointLeft) j.left else j.right
    val ivSide = if (pointLeft) j.right else j.left

    // Branch split on bucket span. NULL spans satisfy neither filter —
    // correct, since a NULL bound can never satisfy the range test.
    val span = Subtract(bucketOf(hi), bucketOf(lo))
    val narrowIv = Filter(And(GreaterThanOrEqual(span, Literal(0L)),
      LessThanOrEqual(span, Literal(maxBuckets))), ivSide)
    val wideIv = Filter(GreaterThan(span, Literal(maxBuckets)), ivSide)

    val pBucket = Alias(bucketOf(p), "__graft_bucket_p")()
    val pointProj = Project(pointSide.output :+ pBucket, pointSide)
    val ivBucket = AttributeReference("__graft_bucket_iv", LongType)()
    val gen = Generate(
      // Sequence is TimeZoneAware — without an explicit zone the node
      // is unresolved and the optimizer-batch validator rejects it.
      // (Inverted intervals — lo > hi — never reach the explode: the
      // narrow filter requires span >= 0, and such rows can match
      // nothing, so dropping them preserves semantics.)
      Explode(new Sequence(bucketOf(lo), bucketOf(hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ivBucket), child = narrowIv)
    val eq = EqualTo(pBucket.toAttribute, ivBucket)
    val (nl, nr) = if (pointLeft) (pointProj, gen) else (gen, pointProj)
    val bucketed =
      Project(j.output, Join(nl, nr, Inner, Some(And(eq, j.condition.get)), j.hint))

    // Oversized intervals keep the nested-loop path; `isOwnRewrite`
    // recognizes the span Filter so this rule never re-matches it.
    val (fl, fr) = if (pointLeft) (pointSide, wideIv) else (wideIv, pointSide)
    val fallback =
      Project(j.output, Join(fl, fr, Inner, Some(j.condition.get), j.hint))

    Union(Seq(bucketed, fallback))
  }
}
