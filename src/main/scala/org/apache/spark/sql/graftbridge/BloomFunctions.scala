package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
    */
  def bloomAgg(hashCol: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(hashCol),
        Literal(expectedItems), Literal(numBits(expectedItems, fpp)))
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
}
