package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for "one vector against a small trained matrix" —
  * hyperplane LSH sign bits and IVF nearest-centroid assignment.
  *
  * The previous formulation baked the matrix into the plan as nested
  * `array(lit(...))` columns: at nlist (or planes) × dim in the
  * thousands that is tens of thousands of Literal NODES — analyzer
  * cost, plan bloat, and a generated method big enough to fall out of
  * whole-stage codegen. Here the matrix is ONE compact field on the
  * expression: it ships to executors inside the task binary (which
  * Spark itself broadcasts — one copy per executor, not per task) and
  * the kernel is a tight primitive loop invoked from codegen via a
  * reference object, so plan size and codegen cost are independent of
  * nlist × dim.
  *
  * Arithmetic parity: every similarity below is computed EXACTLY the
  * way the Column formulation composed it from [[FloatDotProduct]] —
  * double accumulation left-to-right over `min(len)` elements,
  * `cos = dot / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with a zero
  * denominator yielding null (the `nullif` contract) — so operators
  * that switched to these kernels reproduce their oracle hashes
  * bit-for-bit (q44/q70/q73/q76/q79/q85).
  */
object MatrixKernels {

  /** Left-to-right double accumulation over min(len) — bit-identical
    * to [[FloatDotProduct]].
    */
  def dot(x: ArrayData, y: Array[Float]): Double = {
    val n = math.min(x.numElements(), y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  private def selfDot(y: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < y.length) { s += y(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  /** Row norms precomputed once per matrix (the Column form recomputed
    * sqrt(dot(c,c)) per row per record; same values, fewer flops).
    */
  def norms(m: Array[Array[Float]]): Array[Double] = m.map(r => math.sqrt(selfDot(r)))

  /** Sign bits of `vec` against each plane: bit i set iff
    * dot(vec, planes(i)) >= 0 — the packed LSH bucket id.
    */
  def hyperplaneBits(vec: ArrayData, planes: Array[Array[Float]]): Long = {
    var bits = 0L
    var i = 0
    while (i < planes.length) {
      if (dot(vec, planes(i)) >= 0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  private def vecSelfDot(x: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * x.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Cosines of `vec` against every matrix row; Double.NaN encodes the
    * null of a zero denominator (nullif contract).
    */
  def cosines(vec: ArrayData, m: Array[Array[Float]], rowNorms: Array[Double]): Array[Double] = {
    val vNorm = math.sqrt(vecSelfDot(vec))
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val denom = vNorm * rowNorms(j)
      out(j) = if (denom == 0.0) Double.NaN else dot(vec, m(j)) / denom
      j += 1
    }
    out
  }

  /** struct(sim, id) ordering of the Column formulation: null sim
    * (NaN-encoded) sorts below any real sim; real sims compare as
    * doubles; ties break by id. Returns true iff (simA, idA) >
    * (simB, idB). NOTE: because NaN is the null-encoding, a genuine
    * NaN cosine (NaN/Inf in the input vector) also ranks BELOW all
    * real sims here, where Spark's double ordering in the old Column
    * form ranked data-NaN above all reals. Deliberate: a vector with
    * non-finite components has no meaningful cosine and should never
    * win an argmax; callers feeding non-finite embeddings get the
    * lowest rank, not the highest.
    */
  private def gt(simA: Double, idA: Int, simB: Double, idB: Int): Boolean = {
    val aNull = simA.isNaN
    val bNull = simB.isNaN
    if (aNull != bNull) bNull // non-null beats null
    else if (!aNull && simA != simB) simA > simB
    else idA > idB
  }

  /** argmax over (cosine, listId) — `array_max(array(struct(sim, lid)))
    * .getField("list_id")` of the Column formulation: ties go to the
    * larger list id; null sims lose to any real sim.
    */
  def nearestCentroid(vec: ArrayData, ids: Array[Int], m: Array[Array[Float]],
                      rowNorms: Array[Double]): Int = {
    val sims = cosines(vec, m, rowNorms)
    var best = 0
    var j = 1
    while (j < sims.length) {
      if (gt(sims(j), ids(j), sims(best), ids(best))) best = j
      j += 1
    }
    ids(best)
  }

  /** Best-first `nprobe` list ids — the Column formulation's
    * `reverse(array_sort(structs))` sliced: descending (sim, id) with
    * null sims last.
    */
  def nearestCentroids(vec: ArrayData, ids: Array[Int], m: Array[Array[Float]],
                       rowNorms: Array[Double], nprobe: Int): ArrayData = {
    val sims = cosines(vec, m, rowNorms)
    val idx = Array.range(0, sims.length)
    // insertion sort by descending (sim, id) — nlist is small and the
    // comparator must be exactly `gt`
    var i = 1
    while (i < idx.length) {
      val v = idx(i)
      var j = i - 1
      while (j >= 0 && gt(sims(v), ids(v), sims(idx(j)), ids(idx(j)))) {
        idx(j + 1) = idx(j); j -= 1
      }
      idx(j + 1) = v
      i += 1
    }
    val k = math.min(nprobe, idx.length)
    val out = new Array[Int](k)
    var p = 0
    while (p < k) { out(p) = ids(idx(p)); p += 1 }
    new GenericArrayData(out)
  }
}

object PqKernels {

  /** Dot of `vec`'s subspace j (elements [j·dsub, (j+1)·dsub) ∩ len)
    * against a dsub-float centroid — FloatDotProduct arithmetic on the
    * slice.
    */
  private def subDot(vec: ArrayData, from: Int, cent: Array[Float]): Double = {
    val end = math.min(vec.numElements(), from + cent.length)
    var s = 0.0
    var i = from
    while (i < end) { s += vec.getFloat(i).toDouble * cent(i - from).toDouble; i += 1 }
    s
  }

  /** PQ codes: per subspace the argmax of `dot(sub, cent) − ‖cent‖²/2`
    * (float-divided half-norm widened to double — the Column form's
    * `dotF − lit(normsq/2.0f)` coercion), ties to the LARGER code.
    */
  def encode(vec: ArrayData, cents: Array[Array[Array[Float]]],
             normsq: Array[Array[Float]], dsub: Int): ArrayData = {
    val m = cents.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestC = 0
      var best = subDot(vec, j * dsub, cents(j)(0)) - (normsq(j)(0) / 2.0f).toDouble
      var c = 1
      while (c < cents(j).length) {
        val score = subDot(vec, j * dsub, cents(j)(c)) - (normsq(j)(c) / 2.0f).toDouble
        // ascending c: an equal score always moves to the larger code,
        // and Double.compare ranks NaN above reals — both exactly the
        // struct-ordering argmax the literal formulation used
        if (java.lang.Double.compare(score, best) >= 0) { best = score; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Probe-side ADC lookup table: lut[j][c] = dot(sub_j, cent(j)(c)). */
  def lut(vec: ArrayData, cents: Array[Array[Array[Float]]], dsub: Int): ArrayData = {
    val m = cents.length
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val ks = cents(j).length
      val row = new Array[Double](ks)
      var c = 0
      while (c < ks) { row(c) = subDot(vec, j * dsub, cents(j)(c)); c += 1 }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Σⱼ lut[j][codes[j]] — the ADC approximate dot (double, summed
    * left-to-right like the element_at reduce). Codes are expected to
    * come from [[PqEncode]] with the same codebook; a corrupt /
    * out-of-range code poisons the sum to NaN (the old non-ANSI
    * element_at form yielded null there) instead of throwing
    * mid-task.
    */
  def adcDot(lut: ArrayData, codes: ArrayData): Double = {
    val m = math.min(lut.numElements(), codes.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      s += (if (c < 0 || c >= row.numElements()) Double.NaN else row.getDouble(c))
      j += 1
    }
    s
  }

  /** Σⱼ ‖cent(j, codes[j])‖² in FLOAT precision — the Column form
    * summed element_at(float array) lookups with float `+`.
    */
  def codeNormSq(codes: ArrayData, normsq: Array[Array[Float]]): Float = {
    val m = math.min(normsq.length, codes.numElements())
    var s = 0.0f
    var j = 0
    while (j < m) { s += normsq(j)(codes.getInt(j)); j += 1 }
    s
  }
}

/** Value-based equality for kernel expressions carrying `Array`
  * fields. A case class compares `Array` fields by REFERENCE, so two
  * separately-built but identical kernels would defeat
  * `semanticEquals` and common-subexpression elimination — a latent
  * double-eval when a caller composes the same kernel twice. Every
  * matrix-carrying expression below mixes this in and lists its
  * fields (children + arrays + scalars) via [[eqFields]];
  * `java.util.Objects.deepEquals` / `Arrays.deepHashCode` give the
  * arrays deep value semantics.
  */
trait KernelArrayEquality { self: Expression with Product =>
  /** All semantically-significant fields, in constructor order. */
  protected def eqFields: Seq[Any]

  override def equals(other: Any): Boolean = other match {
    case that: KernelArrayEquality if that.getClass == getClass =>
      val a = eqFields
      val b = that.eqFields
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        java.util.Objects.deepEquals(x.asInstanceOf[AnyRef], y.asInstanceOf[AnyRef])
      }
    case _ => false
  }

  // Cached: expression hashCode is HOT in Catalyst (ExpressionSet,
  // attribute maps, canonicalization, the CSE pass this equality
  // enables), and deepHashCode walks the whole embedded codebook —
  // megabytes for real PQ/IVF matrices — so recomputing per call
  // would tax every plan transform of the IVF-PQ queries.
  @transient private lazy val cachedKernelHash: Int = {
    val parts: Array[AnyRef] =
      (getClass.getName +: eqFields.map(_.asInstanceOf[AnyRef])).toArray
    java.util.Arrays.deepHashCode(parts)
  }

  override def hashCode(): Int = cachedKernelHash
}

/** PQ encode: the m nearest-centroid codes of a float vector — the
  * at-ingest projection that turns a dim×4-byte vector into m bytes.
  * The codebook rides the expression (task binary), not the plan:
  * m × ksub × dsub literals at real codebook sizes were an
  * analyzer/codegen wall.
  */
case class PqEncode(child: Expression, cents: Array[Array[Array[Float]]],
                    normsq: Array[Array[Float]], dsub: Int)
  extends UnaryExpression with ExpectsInputTypes with KernelArrayEquality {

  override protected def eqFields: Seq[Any] = Seq(child, cents, normsq, dsub)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cents, normsq, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = ctx.addReferenceObj("cents", cents, "float[][][]")
    val n = ctx.addReferenceObj("normsq", normsq, "float[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.encode($c, $m, $n, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Probe-side ADC lookup table (array<array<double>>). */
case class PqLut(child: Expression, cents: Array[Array[Array[Float]]], dsub: Int)
  extends UnaryExpression with ExpectsInputTypes with KernelArrayEquality {

  override protected def eqFields: Seq[Any] = Seq(child, cents, dsub)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], cents, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = ctx.addReferenceObj("cents", cents, "float[][][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.lut($c, $m, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC approximate dot: Σⱼ lut[j][codes[j]]. */
case class PqAdcDot(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqKernels.adcDot(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (l, c) => s"${ev.value} = $cls.adcDot($l, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σⱼ ‖cent(j, codes[j])‖² (float) — the ADC norm lookup. */
case class PqCodeNormSq(child: Expression, normsq: Array[Array[Float]])
  extends UnaryExpression with ExpectsInputTypes with KernelArrayEquality {

  override protected def eqFields: Seq[Any] = Seq(child, normsq)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = FloatType
  override def prettyName: String = "pq_code_normsq"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.codeNormSq(input.asInstanceOf[ArrayData], normsq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val n = ctx.addReferenceObj("normsq", normsq, "float[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.codeNormSq($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed hyperplane LSH bucket id of a float vector (bit i =
  * sign of the i-th projection). Null input → null (the embedding
  * column is non-null in every graft pipeline; the old Column form's
  * bucket-0-on-null was an accident of `when`'s otherwise).
  */
case class HyperplaneBits(child: Expression, planes: Array[Array[Float]])
  extends UnaryExpression with ExpectsInputTypes with KernelArrayEquality {

  override protected def eqFields: Seq[Any] = Seq(child, planes)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override protected def nullSafeEval(input: Any): Any =
    MatrixKernels.hyperplaneBits(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MatrixKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hyperplaneBits($c, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF coarse assignment: the list id of the nearest centroid by
  * cosine (ties → larger id, zero-norm rows rank below all).
  */
case class NearestCentroid(child: Expression, ids: Array[Int], cents: Array[Array[Float]])
  extends UnaryExpression with ExpectsInputTypes with KernelArrayEquality {

  override protected def eqFields: Seq[Any] = Seq(child, ids, cents)

  require(ids.length == cents.length && ids.nonEmpty,
    s"centroid ids (${ids.length}) and rows (${cents.length}) must align and be non-empty")

  @transient private lazy val rowNorms = MatrixKernels.norms(cents)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    MatrixKernels.nearestCentroid(input.asInstanceOf[ArrayData], ids, cents, rowNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MatrixKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    val m = ctx.addReferenceObj("cents", cents, "float[][]")
    val n = ctx.addReferenceObj("norms", rowNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.nearestCentroid($c, $idsRef, $m, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid list ids, best-first — the IVF probe
  * expansion.
  */
case class NearestCentroids(child: Expression, ids: Array[Int],
                            cents: Array[Array[Float]], nprobe: Int)
  extends UnaryExpression with ExpectsInputTypes with KernelArrayEquality {

  override protected def eqFields: Seq[Any] = Seq(child, ids, cents, nprobe)

  require(ids.length == cents.length && ids.nonEmpty,
    s"centroid ids (${ids.length}) and rows (${cents.length}) must align and be non-empty")
  require(nprobe > 0, s"nprobe must be positive, got $nprobe")

  @transient private lazy val rowNorms = MatrixKernels.norms(cents)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any =
    MatrixKernels.nearestCentroids(input.asInstanceOf[ArrayData], ids, cents, rowNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MatrixKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    val m = ctx.addReferenceObj("cents", cents, "float[][]")
    val n = ctx.addReferenceObj("norms", rowNorms, "double[]")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $cls.nearestCentroids($c, $idsRef, $m, $n, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
