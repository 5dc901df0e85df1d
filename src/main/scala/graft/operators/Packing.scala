package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate then chop" step that turns a
  * curated corpus into fixed-length training sequences: documents are
  * laid end-to-end in deterministic id order and every `seqLen`-token
  * window becomes one training sequence (bin). Each document is
  * assigned the bin containing its FIRST token plus its offset inside
  * that bin, which is exactly what a downstream tokenizer/packer needs
  * to materialize the binary shards. (The reference has no packing
  * surface — this extends the LLM-pipeline family.)
  *
  * The global running token count is a DISTRIBUTED PREFIX SUM, not a
  * single-partition window: a `Window.orderBy(id)` with no partition
  * key funnels the whole corpus through one task — the classic
  * 100 TB-killer. Instead: range-repartition by id (contiguous id
  * ranges per partition, sorted within), one pass for per-partition
  * token totals (P longs to the driver — a bounded probe set), prefix
  * offsets broadcast back, then one streaming pass per partition adds
  * its offset to a local running sum. Both passes read the persisted
  * partitioning, so partition indices are stable; the result is
  * byte-identical for ANY partition count (PackingSuite pins P=1 vs
  * P=7).
  */
object Packing {

  /** Assign each document its training-sequence bin and in-bin offset.
    * Output: (idCol, n_tokens, bin, bin_offset) — `bin` is the
    * seqLen-token window containing the document's first token.
    *
    * @param numPartitions explicit range-partition count; 0 = let the
    *   session's shuffle-partition setting decide.
    * @param lengthCol an optional per-doc length expression replacing
    *   the default whitespace token count — packing by a LEARNED
    *   tokenizer's lengths is `lengthCol =
    *   BpeTrainer.tokenCount(col(textCol), merges)` (q130's shape);
    *   the expression evaluates in the same sizing scan.
    */
  def sequencePack(
      docs: DataFrame,
      seqLen: Long,
      numPartitions: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text",
      lengthCol: Column = null): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._

    val lenExpr =
      if (lengthCol != null) lengthCol else TextAnalysis.tokenCount(col(textCol))
    // Spread: the sizing expression (a learned tokenizer's count in
    // q130's shape) is the scan's whole cost — dense when the caller
    // passes a learned-length expression, byte-floored for the default
    // whitespace count (see [[Spread]])
    val sized = (if (lengthCol != null) Spread(docs) else Spread.medium(docs))
      .select(col(idCol).cast("long").as("id"),
      lenExpr.cast("long").as("n_tokens"))
    val ranged = (if (numPartitions > 0) sized.repartitionByRange(numPartitions, col("id"))
                  else sized.repartitionByRange(col("id")))
      .sortWithinPartitions("id")
      .persist()
    ranged.count() // materialize: pins the sampled range boundaries so
                   // both passes see the SAME partitioning

    // pass 1: per-partition token totals (empty partitions absent from
    // the agg → default 0). P longs on the driver — bounded.
    val nParts = ranged.rdd.getNumPartitions
    val partSums = new Array[Long](nParts)
    ranged.groupBy(spark_partition_id().as("pid"))
      .agg(sum("n_tokens").as("t")).as[(Int, Long)].collect()
      .foreach { case (pid, t) => partSums(pid) = t }
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(p) = tokens before partition p
    val bc = spark.sparkContext.broadcast(offsets)

    // pass 2: streaming local cumsum + broadcast prefix offset. The
    // rows inside a cached partition are the sortWithinPartitions
    // order, so the running sum is the global id-order prefix sum.
    val packed = ranged.select(col("id").as("_1"), col("n_tokens").as("_2"))
      .as[(Long, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = bc.value(pid)
      it.map { case (id, t) =>
        val start = cum
        cum += t
        (id, t, start / seqLen, start % seqLen)
      }
    }.toDF(idCol, "n_tokens", "bin", "bin_offset")

    Dedup.materializeAndRelease(packed, ranged)
  }
}
