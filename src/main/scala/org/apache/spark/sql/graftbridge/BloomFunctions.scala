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
}
