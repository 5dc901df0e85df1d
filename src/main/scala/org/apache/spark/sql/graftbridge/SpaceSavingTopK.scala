package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Space-saving heavy-hitters summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * native aggregate — the 100 TB answer to "top-k most frequent
  * values" when the domain is too large for an exact
  * `groupBy(value).count()` to be cheap: the buffer holds AT MOST
  * `capacity` counters per group regardless of how many distinct
  * values stream through, one pass, mergeable across partitions on the
  * same ObjectHashAggregate path as `collect_list`.
  *
  * Guarantees (per classic space-saving):
  *  - a tracked value's `cnt` never UNDERcounts its true in-summary
  *    frequency: true <= cnt <= true + err, with err <= n/capacity;
  *  - every value with true frequency > n/capacity is tracked;
  *  - when the group's distinct count never exceeds `capacity`, every
  *    count is EXACT (err = 0) and the summary is deterministic — the
  *    mode q60 exercises against a DuckDB oracle; the approximate
  *    regime is pinned by bound tests in ScalaTest.
  *
  * Returns the full summary `array<struct<item, cnt, err>>` (unsorted);
  * rank in the query — `explode` + `ORDER BY cnt DESC LIMIT k` — so
  * tie-breaking stays declarative and engine-portable.
  *
  * Merge is combine-then-trim (Agarwal et al., "Mergeable summaries"):
  * matching items sum counts and errors, then only the top-`capacity`
  * counters survive — preserving the space-saving error bound over the
  * union of the merged streams.
  *
  * SQL surface (via [[GraftExtensions]] / [[GraftFunctions]]):
  * `space_saving_topk(expr, capacity)`.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buffer]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  import SpaceSavingTopK.{Buffer, Entry}

  override def createAggregationBuffer(): Buffer = new Buffer(capacity)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(InternalRow.copyValue(v), 1L, 0L)
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    other.items.forEach { (item, e) => buffer.combine(item, e.count, e.err) }
    buffer.trim()
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    val rows = new Array[Any](buffer.items.size)
    var i = 0
    buffer.items.forEach { (item, e) =>
      rows(i) = new GenericInternalRow(Array[Any](item, e.count, e.err)); i += 1
    }
    new GenericArrayData(rows)
  }

  private lazy val entryProj =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType, LongType))

  override def serialize(buffer: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.items.size)
    buffer.items.forEach { (item, e) =>
      val row = entryProj(new GenericInternalRow(Array[Any](item, e.count, e.err)))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = new Buffer(capacity)
    val n = in.readInt()
    val row = new UnsafeRow(3)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bs = new Array[Byte](len)
      in.readFully(bs)
      row.pointTo(bs, len)
      buffer.combine(InternalRow.copyValue(row.get(0, child.dataType)),
        row.getLong(1), row.getLong(2))
      i += 1
    }
    buffer
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)

  override def prettyName: String = "space_saving_topk"
}

object SpaceSavingTopK {

  final class Entry(var count: Long, var err: Long)

  /** Counter set + lazy min-heap. Counts only grow, so a heap entry is
    * a LOWER bound on its item's current count: the true minimum is
    * found by popping until an entry matches its live count, re-pushing
    * stale ones. Each item has at most one live heap entry (increments
    * never push), so the heap stays O(capacity).
    */
  final class Buffer(capacity: Int) {
    val items = new java.util.HashMap[Any, Entry]()
    private val heap =
      mutable.PriorityQueue.empty[(Long, Any)](Ordering.by((t: (Long, Any)) => -t._1))

    /** Stream update: count one occurrence (or a batch of `c`). */
    def add(item: Any, c: Long, e: Long): Unit = {
      val existing = items.get(item)
      if (existing != null) { existing.count += c; existing.err += e }
      else if (items.size < capacity) {
        items.put(item, new Entry(c, e))
        heap.enqueue((c, item))
      } else {
        // evict the true minimum (space-saving step): the newcomer
        // inherits the evicted count as its overestimation error.
        var done = false
        while (!done) {
          val (cnt, it) = heap.dequeue()
          val live = items.get(it)
          if (live == null) () // already evicted via trim()
          else if (live.count != cnt) heap.enqueue((live.count, it))
          else {
            items.remove(it)
            items.put(item, new Entry(live.count + c, live.count + e))
            heap.enqueue((live.count + c, item))
            done = true
          }
        }
      }
    }

    /** Merge-side update: sum with a matching counter or insert
      * directly (possibly overflowing capacity until [[trim]]).
      */
    def combine(item: Any, c: Long, e: Long): Unit = {
      val existing = items.get(item)
      if (existing != null) { existing.count += c; existing.err += e }
      else { items.put(item, new Entry(c, e)); heap.enqueue((c, item)) }
    }

    /** Keep only the top-`capacity` counters by count (combine-then-
      * trim merge). Rebuilds the heap: dropped items' stale entries
      * would otherwise accumulate across merges.
      */
    def trim(): Unit = if (items.size > capacity) {
      val all = new java.util.ArrayList[java.util.Map.Entry[Any, Entry]](items.entrySet())
      all.sort((a, b) => java.lang.Long.compare(b.getValue.count, a.getValue.count))
      items.clear()
      heap.clear()
      var i = 0
      while (i < capacity) {
        val kv = all.get(i)
        items.put(kv.getKey, kv.getValue)
        heap.enqueue((kv.getValue.count, kv.getKey))
        i += 1
      }
    }
  }
}
