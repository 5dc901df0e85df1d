package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language model for QUALITY FILTERING — the
  * CCNet-style "score documents under a reference LM" step
  * (Wenzek et al. 2020, arXiv:1911.00359 score with a KenLM; this is
  * the count-LM variant whose math is exact integers, so the whole
  * train + score pipeline sits under the DuckDB oracle).
  *
  * Model: bigram conditional estimates over the same `[a-z]{2,20}`
  * whitespace word alphabet as [[BpeTrainer]]. For each (w1, w2):
  * `c12` = corpus occurrence count, `c1` = Σ_w2 c12 (the left-context
  * margin), `p = c12/c1`, and `p_micro = round(c12·10⁶/c1)` — an
  * INTEGER micro-probability, so downstream per-document sums are
  * exact and accumulation-order-free (a double sum would be
  * engine-divergent; the integer trick is the q01 cents pattern).
  *
  * 100 TB shape: training is two hash aggregations over the exploded
  * bigram stream (map-side partial both times) + one margin join —
  * never a self-join of text. `minCount` prunes the hapax tail, which
  * is what makes the scoring-side LM broadcastable (CCNet prunes its
  * KenLM the same way); scoring is one scan of the corpus exploded to
  * bigrams, one join against the (pruned, broadcastable) LM, one
  * re-aggregation by document.
  */
object NgramLm {

  /** Kept word array of a text column (the trainer alphabet). */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w.rlike("^[a-z]{2,20}$"))

  /** Adjacent word pairs of a MATERIALIZED word-array column as
    * `struct(w1, w2)` — guarded: a 0/1-word doc yields an empty array
    * (`sequence(1,0)` is DESCENDING in Spark, never empty).
    *
    * `ws` MUST be a bound attribute (a column materialized by a
    * previous projection), never the [[words]] expression inline: this
    * expression references `ws` ~2n times (size + two element_at per
    * bigram), and Spark does NOT common-subexpression-eliminate inside
    * transform lambdas — an inline words(text) would re-run the
    * split + per-word regex filter once PER REFERENCE, turning the
    * explode O(words²·regex) per document (measured 28 s for an
    * 870-row LM at sf1; 1–2 s with the projection boundary).
    */
  private def bigramsOfWs(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Train the bigram LM: `(w1, w2, c12, c1, p, p_micro)`. `minCount`
    * drops bigrams with `c12 < minCount` AFTER the margin `c1` is
    * fixed over the full table, so surviving rows keep true
    * conditional estimates.
    */
  def trainBigrams(docs: DataFrame, textCol: String = "text",
                   minCount: Long = 1L): DataFrame = {
    // margins via a window over the AGGREGATED bigram table (vocab²-
    // bounded): a groupBy-then-self-join would re-run the corpus
    // explode for the margin branch — two full text scans instead of
    // one (plan-pinned in PlanAuditSuite). The w1 partition is bounded
    // by vocabulary fan-out, never corpus volume.
    val w1win = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    Spread.medium(docs).select(words(col(textCol)).as("__ws")) // projection boundary: see bigramsOfWs
      .select(explode(bigramsOfWs(col("__ws"))).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum("c12").over(w1win))
      .where(col("c12") >= minCount)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        round(col("c12").cast("double") / col("c1").cast("double"), 6).as("p"),
        round(col("c12").cast("double") * 1000000.0d / col("c1").cast("double"), 0)
          .cast("long").as("p_micro"))
  }

  /** Score every document under a trained LM: `(idCol, n_bigrams,
    * n_found, sum_p_micro)` — found = bigrams present in the LM,
    * `sum_p_micro` their exact integer micro-probability mass. The
    * OOV rate and mean bigram probability both derive from these
    * three exact columns; documents with no in-alphabet bigrams score
    * (0, 0, 0). Each bigram OCCURRENCE counts (join multiplicity),
    * matching the LM's own occurrence counting.
    */
  def scoreDocs(docs: DataFrame, lm: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    // ONE pass over the exploded bigram stream: flag each occurrence
    // with a LEFT join against the (pruned, broadcastable) LM, then
    // total + found + mass in a single per-doc aggregation — the
    // two-aggregation alternative scans the corpus text twice. The id
    // spine re-join only reads the id column (column-pruned scan).
    val flagged = Spread.medium(docs)
      .select(col(idCol), words(col(textCol)).as("__ws")) // boundary: see bigramsOfWs
      .select(col(idCol), explode(bigramsOfWs(col("__ws"))).as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))
      .join(lm.select("w1", "w2", "p_micro"), Seq("w1", "w2"), "left")
    val agg = flagged.groupBy(idCol).agg(
      count(lit(1)).as("n_bigrams"),
      count(col("p_micro")).as("n_found"),
      sum("p_micro").as("sum_p_micro"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        coalesce(col("sum_p_micro"), lit(0L)).as("sum_p_micro"))
  }

  /** CCNet-style QUALITY BUCKETING (arXiv:1911.00359 §4: the corpus
    * splits into head/middle/tail thirds by LM score; training data
    * recipes then sample the buckets at different rates). Input is
    * [[scoreDocs]]'s output; the per-document score is the exact
    * integer `sum_p_micro * 1000 div n_bigrams` (mean bigram
    * micro-probability ×1000, floor division — 0 for bigram-less
    * docs), so both the score and the bucket assignment are
    * engine-portable.
    *
    * Cutoffs are the ceil(N/3)-th and ceil(2N/3)-th LARGEST scores,
    * derived from the score HISTOGRAM: one hash aggregation to
    * (score, count), one running-sum window over the histogram —
    * bounded by |distinct scores|, never a per-document global window
    * (the q128 vocab-bounded-window discipline) — and two scalar
    * cutoff collects. Score ties share a bucket (a tie straddling a
    * boundary lands whole in the higher bucket), which keeps the
    * assignment a pure projection against two literal cutoffs instead
    * of a global row_number.
    */
  def bucketByScore(scored: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def scoreCol = when(col("n_bigrams") === 0L, lit(0L))
      .otherwise(expr("sum_p_micro * 1000 div n_bigrams")).as("score")
    // materialize (id, score) once for the CUTOFF math (the histogram
    // pass and the count otherwise each re-run the upstream scoring
    // join), then RELEASE the checkpoint blocks before returning — the
    // result below projects from `scored` directly, so nothing stays
    // pinned in the block manager (Dataset.unpersist is a no-op for
    // checkpoint blocks; see Dedup.releaseCheckpoint)
    val s = scored.select(col(idCol), scoreCol).localCheckpoint(true)
    val hist = s.groupBy("score").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.select(col("score"), sum("c").over(w).as("cum"))
    val n = s.count()
    if (n == 0L) {
      graft.operators.Dedup.releaseCheckpoint(s)
      return scored.select(col(idCol), scoreCol,
        lit(null).cast("string").as("bucket"))
    }
    val k1 = (n + 2) / 3
    val k2 = (2 * n + 2) / 3
    // max(score | cum >= k) IS the k-th largest score: cum(s) counts
    // docs scoring >= s, so {s : cum >= k} is exactly the scores at or
    // below the k-th largest — two bounded scalar collects
    def cutoff(k: Long): Long =
      cum.where(col("cum") >= k).agg(max("score")).collect()(0).getLong(0)
    val c1 = cutoff(k1)
    val c2 = cutoff(k2)
    graft.operators.Dedup.releaseCheckpoint(s)
    scored.select(col(idCol), scoreCol)
      .select(col(idCol), col("score"),
        when(col("score") >= c1, lit("head"))
          .when(col("score") >= c2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
