package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}

/** Column facade over Spark's own Bloom-filter expressions — the
  * machinery behind runtime (injected) bloom join filtering, exposed
  * here for an EXPLICIT set-membership pattern: aggregate a long-hash
  * column into one serialized filter (binary, driver-bounded by
  * numBits/8), then test membership with the codegen'd probe. At
  * 100 TB this replaces broadcasting an exact hash SET (8 bytes/key)
  * with ~`-ln(fpp)/ln²2` bits/key (e.g. 10 bits at 1% fpp) — the
  * trade is one-sided error: no false negatives ever, false positives
  * at the configured rate.
  */
object BloomFunctions {

  /** Aggregate `hashCol` (LongType) into a serialized Bloom filter
    * sized for `expectedItems` at roughly `fpp`.
    *
    * Spark's BloomFilterAggregate SILENTLY clamps both arguments to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `.maxNumBits`
    * (defaults ~4M items / 67M bits) — a 10^8-item request would quietly
    * degrade to a far higher false-positive rate than asked for. A
    * one-sided-error caller with an exact confirm stage survives that,
    * but a drop-candidate caller would over-flag clean rows, so the
    * clamp is refused loudly here: raise both confs (they are plain
    * session confs) when the sizing is intentional.
    */
  def bloomAgg(hashCol: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    val bits = numBits(expectedItems, fpp)
    require(expectedItems <= maxItems && bits <= maxBits,
      s"bloomAgg($expectedItems items, fpp=$fpp → $bits bits) exceeds the session's " +
        s"runtime-bloom-filter caps (maxNumItems=$maxItems, maxNumBits=$maxBits) and " +
        "Spark would SILENTLY clamp it to a higher false-positive rate — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits to cover " +
        "the requested sizing, or shard the filter (Curation.decontaminateBloom " +
        "sharded mode) so each shard fits the caps")
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(hashCol),
        Literal(expectedItems), Literal(bits))
        .toAggregateExpression())
  }

  /** Codegen'd membership probe of `hashCol` against a bloom built by
    * [[bloomAgg]] (pass the serialized bytes as a literal column).
    */
  def mightContain(bloomBytes: Column, hashCol: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloomBytes), ColumnBridge.expression(hashCol)))

  /** Optimal bit count: m = -n·ln(p)/ln²2. */
  def numBits(expectedItems: Long, fpp: Double): Long =
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)

  /** SHARDED membership probe: `blobs(i)` is shard i's serialized
    * filter (null = empty shard → never matches), `shardCol` selects
    * the shard per row, `hashCol` probes it. ONE expression carrying
    * all k blobs as plan state — Spark's own BloomFilterMightContain
    * requires a FOLDABLE filter, so a per-shard dispatch used to be a
    * k-deep CASE chain (plan and codegen size O(k), ~1024-deep at the
    * shard bound); this keeps the plan O(1) in k and deserializes each
    * blob once per executor, not once per probe.
    */
  def shardedMightContain(blobs: Seq[Array[Byte]],
                          shardCol: Column, hashCol: Column): Column =
    ColumnBridge.column(ShardedBloomMightContain(blobs,
      ColumnBridge.expression(shardCol), ColumnBridge.expression(hashCol)))
}

/** [[BloomFunctions.shardedMightContain]]'s expression: whole-stage
  * codegen probe against an array of pre-deserialized Bloom filters
  * (a reference object in generated code, exactly how Spark's own
  * BloomFilterMightContain holds its single filter). Returns false on
  * null shard/hash — membership of nothing is false, the filter
  * semantics every caller wants.
  */
case class ShardedBloomMightContain(blobs: Seq[Array[Byte]],
                                    left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "sharded_bloom_might_contain"

  @transient private lazy val filters: Array[org.apache.spark.util.sketch.BloomFilter] =
    blobs.map(b =>
      if (b == null) null
      else org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b))).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    val h = right.eval(input)
    if (s == null || h == null) false
    else {
      val i = s.asInstanceOf[Long]
      if (i < 0 || i >= filters.length) false
      else {
        val f = filters(i.toInt)
        f != null && f.mightContainLong(h.asInstanceOf[Long])
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val fRef = ctx.addReferenceObj("shardFilters", filters,
      "org.apache.spark.util.sketch.BloomFilter[]")
    val sGen = left.genCode(ctx)
    val hGen = right.genCode(ctx)
    val f = ctx.freshName("filter")
    ev.copy(isNull = FalseLiteral, code =
      code"""
        |${sGen.code}
        |${hGen.code}
        |boolean ${ev.value} = false;
        |if (!${sGen.isNull} && !${hGen.isNull} &&
        |    ${sGen.value} >= 0 && ${sGen.value} < ${filters.length}L) {
        |  org.apache.spark.util.sketch.BloomFilter $f = $fRef[(int) ${sGen.value}];
        |  if ($f != null) ${ev.value} = $f.mightContainLong(${hGen.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  // Case-class equality over Seq[Array[Byte]] compares the arrays by
  // REFERENCE, so two semantically identical probes never compared
  // equal — defeating canonicalization, semanticEquals, and plan /
  // subexpression reuse. Compare (and hash) the blob bytes deeply.
  override def equals(other: Any): Boolean = other match {
    case s: ShardedBloomMightContain =>
      left == s.left && right == s.right &&
        blobs.length == s.blobs.length &&
        blobs.iterator.zip(s.blobs.iterator).forall { case (a, b) =>
          java.util.Arrays.equals(a, b)
        }
    case _ => false
  }
  override def hashCode(): Int = {
    var h = 31 * left.hashCode() + right.hashCode()
    blobs.foreach(b => h = 31 * h + java.util.Arrays.hashCode(b))
    h
  }
}
