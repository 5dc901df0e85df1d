package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

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

  import SpaceSavingTopK.Buffer

  override def createAggregationBuffer(): Buffer = new Buffer(capacity)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    // No per-row copy: the buffer copies the value only when it
    // actually inserts (hits on tracked items dominate in the
    // heavy-hitter regime this aggregate exists for).
    val v = child.eval(input)
    if (v != null) buffer.addStreaming(v, () => InternalRow.copyValue(v))
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    other.foreachEntry { (item, c, e) => buffer.combine(item, c, e) }
    buffer.trim()
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    val rows = new Array[Any](buffer.size)
    var i = 0
    buffer.foreachEntry { (item, c, e) =>
      rows(i) = new GenericInternalRow(Array[Any](item, c, e)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: Buffer): Array[Byte] = {
    // fresh projection per call — UnsafeProjection is not thread-safe
    // and this expression instance is shared across tasks in local
    // mode (same pattern as Spark's own Collect.serialize)
    val entryProj =
      UnsafeProjection.create(Array[DataType](child.dataType, LongType, LongType))
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreachEntry { (item, c, e) =>
      val row = entryProj(new GenericInternalRow(Array[Any](item, c, e)))
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

  /** Counter set over primitive parallel arrays + an INDEXED binary
    * min-heap of slots keyed by count: increment and evict are
    * O(log capacity) with ZERO allocation in the steady state (the
    * first implementation's boxed lazy heap allocated tuples on every
    * miss — a GC storm at 100M rows that made the sketch slower than
    * the exact aggregation it exists to beat).
    *
    * Counts only grow, so an increment sifts its slot DOWN (toward the
    * leaves) and an eviction replaces the root slot's item in place
    * and sifts down — no decrease-key, no stale entries.
    */
  final class Buffer(capacity: Int) {
    private[graftbridge] val slotOf = new java.util.HashMap[Any, Integer]()
    private val itemArr = new Array[Any](capacity)
    private val countArr = new Array[Long](capacity)
    private val errArr = new Array[Long](capacity)
    private val heapArr = new Array[Int](capacity) // heap position -> slot
    private val posArr = new Array[Int](capacity)  // slot -> heap position
    private var n = 0

    def size: Int = n

    @inline private def less(a: Int, b: Int): Boolean = countArr(a) < countArr(b)

    private def swap(i: Int, j: Int): Unit = {
      val si = heapArr(i); val sj = heapArr(j)
      heapArr(i) = sj; heapArr(j) = si
      posArr(sj) = i; posArr(si) = j
    }

    private def siftDown(pos0: Int): Unit = {
      var pos = pos0
      var continue = true
      while (continue) {
        val l = 2 * pos + 1; val r = l + 1
        var m = pos
        if (l < n && less(heapArr(l), heapArr(m))) m = l
        if (r < n && less(heapArr(r), heapArr(m))) m = r
        if (m == pos) continue = false
        else { swap(pos, m); pos = m }
      }
    }

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0 && less(heapArr(pos), heapArr((pos - 1) / 2))) {
        swap(pos, (pos - 1) / 2); pos = (pos - 1) / 2
      }
    }

    private def insertSlot(item: Any, c: Long, e: Long): Unit = {
      val slot = n
      itemArr(slot) = item; countArr(slot) = c; errArr(slot) = e
      heapArr(slot) = slot; posArr(slot) = slot
      n += 1
      slotOf.put(item, slot)
      siftUp(posArr(slot))
    }

    /** Stream update: one occurrence of `item`; `copy` materializes an
      * owned copy only when the value is actually retained.
      */
    def addStreaming(item: Any, copy: () => Any): Unit = {
      val slot = slotOf.get(item)
      if (slot != null) {
        countArr(slot) += 1L
        siftDown(posArr(slot))
      } else if (n < capacity) {
        insertSlot(copy(), 1L, 0L)
      } else {
        // space-saving eviction: replace the min-count item in place;
        // the newcomer inherits the evicted count as its error bound.
        val victim = heapArr(0)
        slotOf.remove(itemArr(victim))
        val base = countArr(victim)
        itemArr(victim) = copy()
        countArr(victim) = base + 1L
        errArr(victim) = base
        slotOf.put(itemArr(victim), victim)
        siftDown(0)
      }
    }

    /** Merge-side update: sum with a matching counter or insert
      * directly (possibly beyond capacity until [[trim]]; the arrays
      * are sized lazily for the merge overflow).
      */
    private var overflow: java.util.HashMap[Any, Array[Long]] = _

    def combine(item: Any, c: Long, e: Long): Unit = {
      val slot = slotOf.get(item)
      if (slot != null) {
        countArr(slot) += c; errArr(slot) += e
        siftDown(posArr(slot))
      } else if (n < capacity) insertSlot(item, c, e)
      else {
        if (overflow == null) overflow = new java.util.HashMap[Any, Array[Long]]()
        val prev = overflow.get(item)
        if (prev != null) { prev(0) += c; prev(1) += e }
        else overflow.put(item, Array(c, e))
      }
    }

    /** Combine-then-trim: fold the merge overflow back in, keeping
      * only the top-`capacity` counters by count.
      */
    def trim(): Unit = if (overflow != null) {
      val of = overflow; overflow = null
      of.forEach { (item, ce) =>
        // evict the current min whenever the overflow item outranks it
        if (ce(0) > countArr(heapArr(0))) {
          val victim = heapArr(0)
          slotOf.remove(itemArr(victim))
          itemArr(victim) = item
          countArr(victim) = ce(0)
          errArr(victim) = ce(1)
          slotOf.put(item, victim)
          siftDown(0)
        }
      }
    }

    def foreachEntry(f: (Any, Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(itemArr(i), countArr(i), errArr(i)); i += 1 }
    }
  }
}
