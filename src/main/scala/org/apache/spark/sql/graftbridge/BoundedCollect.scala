package org.apache.spark.sql.graftbridge

import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard per-group element cap.
  *
  * The LSH pair generators collect each bucket's member ids and then
  * DISCARD buckets larger than `maxBucket` (a degenerate bucket — the
  * empty document, boilerplate templates — would explode the pair
  * count). Plain `collect_list` builds the FULL member array in the
  * aggregation buffer before the size filter can discard it: one
  * million-member bucket materializes a million-element array per
  * executor — the OOM the guard exists to prevent. The alternative
  * (pre-counting bucket sizes and anti-joining oversized keys away)
  * is memory-safe but costs a second pass over the banded stream.
  *
  * This aggregate keeps AT MOST `limit + 1` elements per group: groups
  * whose true size exceeds the limit surface with exactly `limit + 1`
  * elements, which the standard `size(ids) <= limit` post-filter
  * drops — byte-for-byte the same output as the pre-count guard, in
  * ONE pass with O(limit) memory per group. (Which particular
  * elements occupy a capped buffer is partition-order-dependent, but
  * capped groups are discarded wholesale, so the result is
  * deterministic.) Runs on the same ObjectHashAggregate path as
  * `collect_list` itself.
  */
case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(limit > 0, s"limit must be positive, got $limit")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)

  override def prettyName: String = "bounded_collect_list"
}
