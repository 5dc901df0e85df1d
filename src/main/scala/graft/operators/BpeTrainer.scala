package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016, arXiv:1508.07909 — the classic word-frequency formulation):
  * greedy merge steps where each step promotes the corpus's most
  * frequent adjacent symbol pair to a new symbol.
  *
  * Exact + engine-portable by construction:
  *  - pair frequencies are INTEGER sums over the word-frequency table
  *    (positional adjacent pairs, the reference algorithm's counts);
  *  - the winner is (count DESC, pair ASC) — a binary-collation total
  *    order both Spark and DuckDB share, so ties break identically;
  *  - every symbol is ONE character: merge `i` mints the private-use
  *    codepoint U+E000+i, which turns "apply a merge" into a literal
  *    left-to-right non-overlapping `replace` — exactly the reference
  *    algorithm's in-word merge walk, and exactly what SQL `replace`
  *    does, so a DuckDB recomputation hash-matches (q126's oracle).
  *
  * 100 TB shape: the corpus text is scanned ONCE into the
  * word-frequency table (the classic BPE state — its size is the
  * corpus VOCABULARY, millions of rows at web scale, not the corpus).
  * Each merge step is then one hash aggregation over that persisted
  * table: the step-`i` symbol sequences are derived by folding the
  * `i` accumulated single-char replaces into the projection (fused by
  * whole-stage codegen), so no per-step materialization, no growing
  * cache, and the only driver traffic is ONE (pair, count) row per
  * step. Corpus text is never rescanned after the prep — Scratch14
  * probes that per-step cost tracks vocabulary size, not corpus size.
  */
object BpeTrainer {

  /** One greedy merge: `token` is the merged text (base characters,
    * fully expanded), `freq` its adjacent-pair count when chosen, and
    * `pair` the exact two-symbol form it replaced (symbols are single
    * chars — earlier merges' minted codepoints included), which is
    * what [[tokenize]] replays.
    */
  final case class Merge(step: Int, token: String, freq: Long, pair: String)

  /** The word-frequency table — BPE's training state: one corpus scan,
    * whitespace split, keeping plain `[a-z]{2,20}` word forms (the
    * regex is the portability contract with the oracle; byte-level
    * alphabets would need per-byte symbols instead). Output:
    * `(seq string, cnt bigint)` where `seq` starts as the word itself
    * — every character one symbol.
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    Spread(docs).select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]{2,20}$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w").as("seq"), col("cnt"))

  /** First private-use codepoint; merge step `i` (1-based) mints
    * `(SymBase + i - 1).toChar`. 0xE000..0xF8FF gives 6400 merges —
    * past that the trainer refuses rather than colliding with real
    * text (which the `[a-z]` word filter excludes anyway).
    */
  private[operators] val SymBase = 0xE000

  /** Train `steps` greedy merges. Stops early when no pair remains
    * (every surviving word fully merged to one symbol).
    */
  def train(spark: SparkSession, docs: DataFrame, steps: Int,
            textCol: String = "text"): Seq[Merge] = {
    require(steps >= 1 && steps <= 6400,
      s"BPE merge steps must be in [1, 6400]: $steps")
    val base = wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      base.count() // materialize: the ONLY corpus-text scan
      val merges = Seq.newBuilder[Merge]
      // accumulated (pair -> minted symbol) replaces; expansion of a
      // minted symbol back to base characters for the Merge record
      var reps = List.empty[(String, String)] // newest first
      val expansion = scala.collection.mutable.Map.empty[Char, String]
      var step = 1
      var exhausted = false
      while (step <= steps && !exhausted) {
        // fold the accumulated merges into the projection (oldest
        // first — each replace's output feeds the next, the same
        // order the merges were learned)
        val seqCol = reps.reverse.foldLeft(col("seq")) {
          case (c, (p, z)) => replace(c, lit(p), lit(z))
        }.as("seq")
        val best = base.select(seqCol, col("cnt"))
          .where(length(col("seq")) >= 2) // sequence(1,0) is DESCENDING, never empty
          .select(explode(expr(
            "transform(sequence(1, length(seq) - 1), p -> substring(seq, p, 2))"))
            .as("pair"), col("cnt"))
          .groupBy("pair").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val pair = best(0).getString(0)
          val freq = best(0).getLong(1)
          val z = (SymBase + step - 1).toChar
          val token = pair.flatMap(ch => expansion.getOrElse(ch, ch.toString))
          expansion(z) = token
          reps = (pair -> z.toString) :: reps
          merges += Merge(step, token, freq, pair)
          step += 1
        }
      }
      merges.result()
    } finally base.unpersist(blocking = false)
  }

  /** [[train]] as a DataFrame `(step int, token string, freq bigint)`
    * — the q126 result shape (and what a vocab catalog would persist).
    */
  def trainDF(spark: SparkSession, docs: DataFrame, steps: Int,
              textCol: String = "text"): DataFrame = {
    import spark.implicits._
    train(spark, docs, steps, textCol)
      .map(m => (m.step, m.token, m.freq)).toDF("step", "token", "freq")
  }

  /** Per-text BPE TOKEN COUNT under learned merges — the token-budget
    * input a trained tokenizer implies: whitespace words in the
    * trainer's `[a-z]{2,20}` alphabet fold through the merge replaces
    * (each surviving symbol = one token) and sum; other word forms
    * contribute nothing (they're outside the trained alphabet, the
    * same contract as [[wordCounts]]). A pure projection — the
    * corpus-wide encode is ONE scan, merges fused into whole-stage
    * codegen, no join against a vocab table.
    */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    aggregate(
      transform(
        filter(split(text, "\\s+"), w => w.rlike("^[a-z]{2,20}$")),
        w => length(merges.foldLeft(w) { (c, m) =>
          replace(c, lit(m.pair), lit((SymBase + m.step - 1).toChar.toString))
        }).cast("long")),
      lit(0L), (acc, n) => acc + n)

  /** The matching word count (how many words the encode covered). */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), w => w.rlike("^[a-z]{2,20}$"))).cast("long")

  /** Tokenize a word column with learned merges: fold the replaces in
    * training order (the exact training walk), then expand each
    * surviving symbol back to its token text. Output `array<string>`
    * whose concatenation is the input word — a pure projection,
    * usable inside any scan.
    */
  def tokenize(word: Column, merges: Seq[Merge]): Column = {
    val reps = merges.map(m => (m, (SymBase + m.step - 1).toChar.toString))
    val folded = reps.foldLeft(word) { case (c, (m, z)) =>
      replace(c, lit(m.pair), lit(z))
    }
    val expMap = map(reps.flatMap { case (m, z) =>
      Seq(lit(z), lit(m.token)) }: _*)
    filter(
      transform(split(folded, ""),
        ch => coalesce(element_at(expMap, ch), ch)),
      t => length(t) > 0) // split("") may emit boundary empties
  }
}
