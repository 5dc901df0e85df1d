package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Shared shingle-hash iteration for the one-pass signature
  * expressions: visit the xxhash64 (seed 42, Spark's SQL default) of
  * every k-char shingle of `text`, matching
  * `xxhash64(substr(text, i, k))` exactly.
  *
  * ASCII fast path: when numBytes == numChars the char windows are
  * byte windows, hashed in place over the UTF8String's buffer — zero
  * allocation per shingle. Multi-byte text falls back to per-window
  * UTF8String.substringSQL (same result, one small allocation per
  * window). Texts shorter than k hash their substr-truncated prefix,
  * mirroring `substr`'s clamping, so results equal the exploded
  * formulation on every input.
  */
private[graftbridge] object ShingleHashing {
  final val SqlXxhashSeed = 42L

  @inline def forEachShingleHash(s: UTF8String, k: Int)(f: Long => Unit): Unit = {
    val numBytes = s.numBytes()
    val numChars = s.numChars()
    val n = math.max(numChars - (k - 1), 1)
    if (numBytes == numChars) {
      val base = s.getBaseObject
      val offset = s.getBaseOffset
      var i = 0
      while (i < n) {
        val len = math.min(k, numBytes - i)
        f(XXH64.hashUnsafeBytes(base, offset + i, math.max(len, 0), SqlXxhashSeed))
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val sub = s.substringSQL(i + 1, k)
        f(XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes(), SqlXxhashSeed))
        i += 1
      }
    }
  }
}

/** One-pass MinHash signature of a string — `numHashes` permutation
  * minima over the k-shingle xxhash64 stream, identical to the
  * explode + `min` aggregation formulation (Dedup.minhashSignatures)
  * but as a PURE PROJECTION: no exploded (id, hash) rows, no shuffle,
  * no aggregation hash map. At 100 TB this turns signature computation
  * from a full shuffle stage into a map-only pass that fuses with the
  * scan.
  *
  * The permutation family is (a·h' + b) mod P over the 31-bit prime
  * field P = 2147483629 (h' = h folded into [0, P)), with a ∈ [1, P),
  * b ∈ [0, P) drawn deterministically from `seed` — the same universal
  * family Spark ML's MinHashLSH uses. a spanning the FULL field makes
  * the map wrap ~a·h'/P times (well mixed); an earlier variant with
  * a < 2^29 over a 61-bit field wrapped at most once, which made the
  * "permutations" rotation-like and heavily correlated — signature
  * estimates overshot true Jaccard by up to +0.4 (caught by
  * GroundTruthSuite's all-pairs reference). Coefficients are kept in a
  * per-instance table, resolved once per task.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleK: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val coeffs: (Array[Long], Array[Long]) = MinHashSig.coefficients(numHashes, seed)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], numHashes, shingleK, coeffs._1, coeffs._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The heavy loop lives in a static helper; codegen inlines the call
    // so the expression stays inside whole-stage codegen (no
    // interpreted fallback, no row boxing).
    val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val aRef = ctx.addReferenceObj("minhashA", coeffs._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffs._2, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.compute($c, $numHashes, $shingleK, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Largest prime below 2^31: a, h' < 2^31 keeps a·h' + b < 2^63
    * (no overflow) while a still spans the whole field.
    */
  final val Prime = 2147483629L

  /** Same deterministic family as Dedup.permCoeffs (identical Random
    * consumption order: a then b per index).
    */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      a(j) = rnd.nextInt((Prime - 1).toInt).toLong + 1
      b(j) = rnd.nextInt(Prime.toInt).toLong
      j += 1
    }
    (a, b)
  }

  def compute(s: UTF8String, numHashes: Int, k: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    ShingleHashing.forEachShingleHash(s, k) { h =>
      // Fold the 64-bit shingle hash into the field: mask to 31 bits,
      // then reduce mod P (collision prob per in-doc pair ~2^-31 —
      // negligible next to the 1/numHashes estimator noise).
      val hq = (h & 0x7FFFFFFFL) % Prime
      var j = 0
      while (j < numHashes) {
        // Operands are < 2^31 and non-negative, so the product fits a
        // long and plain % is already the positive remainder.
        val v = (a(j) * hq + b(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** One-pass 64-bit SimHash of a string: signed per-bit counters over
  * the k-shingle xxhash64 stream (repeats add weight — weighted
  * SimHash), reassembled into the sign vector. Identical results to
  * the explode + 64 conditional-sum aggregation, as a pure projection.
  */
case class SimHash64(child: Expression, shingleK: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c, $shingleK);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct k-shingle xxhash64 array of a string, in ONE
  * projection pass — bit-identical to
  * `sort_array(collect_set(h))` over the exploded shingle stream
  * (equivalence ScalaTested), but with no exploded rows and no
  * aggregation shuffle: the shingle count is known from the string
  * length, so the hashes fill a pre-sized primitive buffer that is
  * sorted and deduped in place. This is the exact-Jaccard verifier's
  * set-build stage; as an explode + collect_set aggregation it was the
  * dominant q32 cost (~20M exploded rows at sf0.1 for ~5k docs).
  */
case class ShingleSet(child: Expression, shingleK: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleSet.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c, $shingleK);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val n = math.max(s.numChars() - (k - 1), 1)
    val buf = new Array[Long](n)
    var i = 0
    ShingleHashing.forEachShingleHash(s, k) { h => buf(i) = h; i += 1 }
    java.util.Arrays.sort(buf)
    var w = 0
    var r = 0
    while (r < n) {
      if (r == 0 || buf(r) != buf(r - 1)) { buf(w) = buf(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == n) buf else java.util.Arrays.copyOf(buf, w))
  }
}

object SimHash64 {
  def compute(s: UTF8String, k: Int): Long = {
    val counts = new Array[Int](64)
    ShingleHashing.forEachShingleHash(s, k) { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }
}
