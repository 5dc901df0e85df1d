package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, FloatDotProduct, LongArrayMatchCount, SortedLongArrayIntersectCount}

/** Column facade over graft's native vector expressions
  * (org.apache.spark.sql.graftbridge.FloatDotProduct — codegen'd
  * primitive loops instead of interpreted higher-order functions).
  */
object VectorFunctions {

  /** Codegen'd dot product of two `array<float>` columns (double). */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2normF(a: Column): Column = sqrt(dotF(a, a))

  /** Codegen'd cosine similarity for `array<float>` columns. */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / nullif(l2normF(a) * l2normF(b), lit(0.0))

  /** Codegen'd count of positions where two `array<long>` columns agree
    * (MinHash signature-agreement kernel).
    */
  def matchCountL(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayMatchCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd merge-scan intersection size of two SORTED ascending
    * `array<long>` columns (exact-Jaccard verify kernel).
    */
  def sortedIntersectCountL(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongArrayIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One-pass MinHash signature (array<long>) of a string column — a
    * pure projection; see graftbridge.MinHashSig.
    */
  def minhashSig(text: Column, numHashes: Int, shingleK: Int, seed: Long): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.MinHashSig(ColumnBridge.expression(text), numHashes, shingleK, seed))

  /** One-pass 64-bit SimHash of a string column — a pure projection;
    * see graftbridge.SimHash64.
    */
  def simhash64(text: Column, shingleK: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.SimHash64(ColumnBridge.expression(text), shingleK))

  /** One-pass sorted distinct shingle-hash array (array<long>) of a
    * string column — a pure projection; see graftbridge.ShingleSet.
    */
  def shingleSet(text: Column, shingleK: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.ShingleSet(ColumnBridge.expression(text), shingleK))

  /** Packed hyperplane-LSH bucket id (long) of an `array<float>`
    * column against a plane matrix carried on the expression (ships in
    * the task binary, not the plan) — see graftbridge.HyperplaneBits.
    */
  def hyperplaneBits(vec: Column, planes: Array[Array[Float]]): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.HyperplaneBits(ColumnBridge.expression(vec), planes))

  /** Nearest-centroid list id (int) by cosine, ties to the larger id —
    * the IVF coarse assignment; see graftbridge.NearestCentroid.
    */
  def nearestCentroid(vec: Column, ids: Array[Int], cents: Array[Array[Float]]): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.NearestCentroid(ColumnBridge.expression(vec), ids, cents))

  /** Best-first `nprobe` nearest centroid list ids (array<int>) — the
    * IVF probe expansion; see graftbridge.NearestCentroids.
    */
  def nearestCentroids(vec: Column, ids: Array[Int], cents: Array[Array[Float]],
                       nprobe: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.NearestCentroids(
        ColumnBridge.expression(vec), ids, cents, nprobe))

  /** collect_list capped at limit+1 elements per group — the bounded
    * bucket-member collector; see graftbridge.BoundedCollectList.
    */
  def boundedCollectList(c: Column, limit: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.BoundedCollectList(ColumnBridge.expression(c), limit)
        .toAggregateExpression())

  /** Space-saving heavy-hitters summary: at most `capacity` counters
    * per group, one pass, `array<struct<item,cnt,err>>`; see
    * graftbridge.SpaceSavingTopK.
    */
  def spaceSavingTopK(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.SpaceSavingTopK(ColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
