package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for each left row, the most recent right row
  * with `rightTime <= leftTime` for the same key (left-outer: no match
  * -> null payload). Right side must be unique per (key, time) — the
  * same contract as `Relational.asOf`, whose union+window formulation
  * this operator replaces when planned.
  *
  * Physical shape: each side shuffles ONCE on its key and sorts by
  * (key, time) — the distribution/ordering requirements below let
  * EnsureRequirements place (or elide, for pre-bucketed/sorted inputs)
  * the exchanges — then a single streaming merge pass per partition
  * carries the latest right payload forward. Versus the union+window
  * formulation this skips materializing the tag/null-padded union rows
  * and the window machinery, and an already-clustered child needs NO
  * new shuffle (the union always re-shuffles both sides together).
  * Memory per partition is O(1): one carried payload row — there is no
  * buffering, unlike a window frame.
  *
  * Time columns must be non-null (null never satisfies `<=` in the
  * SQL formulations this mirrors; here nulls would sort first and
  * carry garbage — filter them upstream).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val (lk, rk, lt, rt, pay) = (leftKey, rightKey, leftTime, rightTime, payload)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) composite projections for the merge comparison and
      // a key-only pair to validate the carried payload's key.
      val lKeyTime = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rKeyTime = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val lKeyOnly = UnsafeProjection.create(Seq(lk), leftOut)
      val rKeyOnly = UnsafeProjection.create(Seq(rk), rightOut)
      val payloadProj = UnsafeProjection.create(pay, rightOut)
      // codegen'd comparator over the projected (key, time) rows — the
      // interpreted natural ordering costs a boxed compare per merge
      // step, which dominates the whole operator at volume
      val ktOrdering = RowOrdering.create(
        Seq(SortOrder(BoundReference(0, lk.dataType, lk.nullable), Ascending),
          SortOrder(BoundReference(1, lt.dataType, lt.nullable), Ascending)),
        Nil)
      // The input-side payload attrs must be nullable too: a bound
      // reference takes its nullability from the input schema, and a
      // non-nullable double read of the null-payload row would silently
      // produce 0.0 instead of null.
      val outProj = UnsafeProjection.create(output, leftOut ++ pay.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(pay.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var carriedKey: InternalRow = _ // copied
        private var carriedPayload: InternalRow = _ // copied
        private def advanceRightTo(lKT: InternalRow): Unit = {
          // consume every right row with (key, time) <= left's: the
          // LAST consumed is the as-of match candidate for this key
          var continue = true
          while (continue) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next()
            if (rHead != null && ktOrdering.compare(rKeyTime(rHead), lKT) <= 0) {
              carriedKey = rKeyOnly(rHead).copy()
              carriedPayload = payloadProj(rHead).copy()
              rHead = if (rIter.hasNext) rIter.next() else null
            } else continue = false
          }
        }
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          // project the left composite ONCE per row (the projection
          // reuses its buffer; rKeyTime is a distinct instance, so the
          // row stays valid across the whole advance)
          advanceRightTo(lKeyTime(lRow))
          val matches = carriedKey != null && carriedKey == lKeyOnly(lRow)
          outProj(joined(lRow, if (matches) carriedPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinPlan]] — injected by
  * [[GraftExtensions]] and (idempotently) by the `AsOfJoinPlan.of`
  * facade for sessions built without the extensions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, pay) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {

  /** Build the joined DataFrame. `payload` columns come from `right`;
    * output = all left columns ++ payload (nullable).
    */
  def of(left: org.apache.spark.sql.DataFrame,
         right: org.apache.spark.sql.DataFrame,
         key: String,
         leftTime: String,
         rightTime: String,
         payload: Seq[String]): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy

    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))

    // The merge comparator runs ONE ordering over both sides' (key,
    // time) projections, so mismatched types coerce to the WIDER type
    // — the same coercion the union+window formulation gets from its
    // union (narrowing the right to the left's type would truncate,
    // e.g. TIMESTAMP right against DATE left, and silently diverge
    // from asOf). The left's cast columns ride as shadow columns and
    // are dropped from the final output; the right side is also PRUNED
    // to (key, time, payload) here — no optimizer rule knows this node,
    // so unused right columns would otherwise ride its whole
    // shuffle+sort. The fresh select also re-aliases the right side so
    // a self-join cannot share expression ids across the two children.
    import org.apache.spark.sql.functions.col
    def wider(a: org.apache.spark.sql.types.DataType,
              b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
      if (a == b) a
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion.findWiderTypeForTwo(a, b)
        .getOrElse(throw new IllegalArgumentException(
          s"as-of columns have incompatible types: $a vs $b"))
    val l0 = left.queryExecution.analyzed
    val r0 = right.queryExecution.analyzed
    val keyT = wider(resolve(l0, key).dataType, resolve(r0, key).dataType)
    val timeT = wider(resolve(l0, leftTime).dataType, resolve(r0, rightTime).dataType)
    // Float/double keys match by raw UnsafeRow bytes in the exec and
    // hash-partition on the raw value, so -0.0 and 0.0 would neither
    // co-partition nor compare equal (UnsafeRowWriter canonicalizes NaN
    // but NOT negative zero — Spark's own joins insert
    // NormalizeFloatingNumbers for this; no rule knows this node, so
    // normalize at the source projection instead).
    val keyNeedsNorm = keyT == org.apache.spark.sql.types.DoubleType ||
      keyT == org.apache.spark.sql.types.FloatType
    def normKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (keyNeedsNorm)
        org.apache.spark.sql.functions.when(c === 0, org.apache.spark.sql.functions.lit(0))
          .otherwise(c)
      else c
    val leftNeedsCast = keyT != resolve(l0, key).dataType ||
      timeT != resolve(l0, leftTime).dataType || keyNeedsNorm

    // Shadow cast columns on the left ONLY when widening is actually
    // needed: the exec declares its output ordering on its key/time
    // attributes, and dropping shadows would discard that ordering
    // from the common (type-matched) case where downstream operators
    // can elide their sorts.
    val lPrepared =
      if (leftNeedsCast)
        left.withColumn("__asof_k", normKey(col(key).cast(keyT)).cast(keyT))
          .withColumn("__asof_t", col(leftTime).cast(timeT))
      else left
    val (lKeyName, lTimeName) =
      if (leftNeedsCast) ("__asof_k", "__asof_t") else (key, leftTime)
    val rPruned = right.select(
      (Seq(normKey(col(key).cast(keyT)).cast(keyT).as(key),
        col(rightTime).cast(timeT).as(rightTime)) ++
        payload.map(c => col(c).as(c))): _*)
    val lPlan = lPrepared.queryExecution.analyzed
    val rPlan = rPruned.queryExecution.analyzed
    val joined = org.apache.spark.sql.classic.Dataset.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      resolve(lPlan, lKeyName), resolve(rPlan, key),
      resolve(lPlan, lTimeName), resolve(rPlan, rightTime),
      payload.map(resolve(rPlan, _))))
    if (leftNeedsCast) joined.drop("__asof_k", "__asof_t") else joined
  }
}
