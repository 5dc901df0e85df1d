package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-style (SentencePiece-flavored, Kudo 2018, arXiv:1804.10959)
  * subword tokenizer: a FIXED piece vocabulary scored from the corpus,
  * applied by greedy longest-match segmentation.
  *
  * The classic unigram trainer's EM loop is float math; what this
  * implementation keeps exact (and therefore DuckDB-oracle-able, the
  * same discipline that made BPE training exact in
  * [[BpeTrainer]]) is the deterministic variant:
  *  - candidate pieces are every substring of length 2..maxLen of the
  *    corpus's word forms, weighted by exact INTEGER word counts;
  *  - the vocabulary is the top-K pieces by (weight DESC, piece ASC) —
  *    a binary-collation total order Spark and DuckDB share;
  *  - segmentation is greedy longest-match left-to-right over the
  *    piece set, single-character fallback (every char is implicitly
  *    in the vocab at length 1) — Viterbi under unit piece costs
  *    degenerates to exactly this walk for counting purposes.
  *
  * Word alphabet is [[BpeTrainer.wordCounts]]'s `[a-z]{2,20}` contract
  * (the engine-portability boundary with the oracle).
  *
  * 100 TB shape: training scans the corpus ONCE into the word-frequency
  * table (vocabulary-sized state, like BPE's), explodes it to weighted
  * substrings (≤ maxLen·|word| pieces per DISTINCT word form, never per
  * occurrence), and one hash aggregation + TakeOrdered yields the
  * vocabulary; the only driver traffic is the top-K rows (bounded
  * collect, like the BPE winner). Scoring is a PURE PROJECTION: the
  * piece set inlines as per-length literal arrays and the greedy walk
  * runs as native `aggregate`/`transform` higher-order expressions —
  * one corpus scan, zero joins, zero windows, no UDF.
  */
object UnigramTokenizer {

  /** A vocabulary piece and its exact substring weight (sum of the
    * containing words' counts, one per occurrence position).
    */
  final case class Piece(piece: String, weight: Long)

  /** Train the top-`topK` piece vocabulary on `docs`. One corpus scan
    * (the word-frequency table), one substring explode over DISTINCT
    * word forms, one hash agg + TakeOrdered(topK).
    */
  def trainPieces(spark: SparkSession, docs: DataFrame, topK: Int,
                  maxLen: Int = 6, textCol: String = "text"): Seq[Piece] = {
    require(topK >= 1 && topK <= 100000,
      s"unigram piece vocab size must be in [1, 100000]: $topK")
    require(maxLen >= 2 && maxLen <= 20,
      s"unigram maxLen must be in [2, 20]: $maxLen")
    val wf = BpeTrainer.wordCounts(docs, textCol) // (seq, cnt): distinct word forms
    wf.select(
        explode(filter(flatten(transform(
          sequence(lit(1), length(col("seq"))),
          i => transform(sequence(lit(2), lit(maxLen)),
            l => when(i + l - lit(1) <= length(col("seq")),
              substr(col("seq"), i, l))))),
          p => p.isNotNull)).as("piece"),
        col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("weight"))
      .orderBy(col("weight").desc, col("piece").asc)
      .limit(topK) // plans as TakeOrdered; driver traffic = topK rows
      .collect().map(r => Piece(r.getString(0), r.getLong(1))).toSeq
  }

  /** Greedy longest-match piece count of one word under the inlined
    * vocabulary: a single left-to-right `aggregate` over the character
    * positions; at each unconsumed position the longest piece length
    * whose literal array contains the substring wins, else one
    * character is consumed as a fallback piece.
    */
  private def greedyCount(word: Column, byLen: Map[Int, Seq[String]]): Column = {
    val lens = byLen.keys.toSeq.sorted.reverse // longest-match-first
    aggregate(
      sequence(lit(1), length(word)),
      struct(lit(0).as("n"), lit(1).as("next")),
      (acc, i) => {
        val matchLen = coalesce(lens.map { l =>
          when(array_contains(array(byLen(l).map(lit): _*),
            substr(word, i, lit(l))), lit(l))
        } :+ lit(1): _*)
        when(i < acc.getField("next"), acc)
          .otherwise(struct((acc.getField("n") + lit(1)).as("n"),
            (i + matchLen).as("next")))
      },
      acc => acc.getField("n"))
  }

  /** Per-text greedy piece count under a trained vocabulary — one
    * projection over the whitespace words in the trainer's alphabet
    * (non-matching word forms contribute nothing, [[BpeTrainer]]'s
    * contract); usable inside any scan.
    */
  def tokenCount(text: Column, pieces: Seq[Piece]): Column = {
    val byLen = pieces.map(_.piece).groupBy(_.length)
    aggregate(
      filter(split(text, "\\s+"), w => w.rlike("^[a-z]{2,20}$")),
      lit(0L),
      (acc, w) => acc + greedyCount(w, byLen).cast("long"))
  }

  /** The matching word count (how many words the segmentation covered). */
  def wordCount(text: Column): Column = BpeTrainer.wordCount(text)

  /** Corpus-wide greedy piece counts: `(idCol, n_words, n_pieces)`.
    * The greedy walk runs once per DISTINCT word form and joins back
    * to the per-(doc, word) occurrence counts — Zipf makes distinct
    * word forms a small fraction of occurrences, so this beats the
    * pure one-scan [[tokenCount]] projection 3.2× at sf1 (13.7 → 4.3 s
    * forced, identical totals) and widens with corpus size: the walk's
    * cost saturates at the vocabulary while occurrences keep growing.
    * Costs one keyed shuffle; the per-(doc, word) pre-aggregation
    * bounds hot-word fan-in, and docs with no in-alphabet words keep a
    * (0, 0) row via the id-spine left join (the [[NgramLm.scoreDocs]]
    * shape). [[tokenCount]] stays the right tool INSIDE a wider
    * projection (e.g. pack-by-length), where a join cannot reach.
    */
  def scoreDocs(docs: DataFrame, pieces: Seq[Piece],
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val byLen = pieces.map(_.piece).groupBy(_.length)
    val perDocWord = docs
      .select(col(idCol), explode(NgramLm.words(col(textCol))).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
    val seg = perDocWord.select("w").distinct()
      .select(col("w"), greedyCount(col("w"), byLen).cast("long").as("np"))
    val agg = perDocWord.join(seg, Seq("w"))
      .groupBy(idCol).agg(sum("c").as("n_words"),
        sum(col("c") * col("np")).as("n_pieces"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }
}
