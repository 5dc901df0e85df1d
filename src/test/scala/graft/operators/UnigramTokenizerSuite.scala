package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram tokenizer pinned against a naive driver-side reference
  * (exact substring weighting + greedy longest-match walk), plus the
  * engine-portability contracts q134's DuckDB oracle relies on:
  * integer piece weights, (weight DESC, piece ASC) tie-break, and the
  * single-character fallback.
  */
class UnigramTokenizerSuite extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: substring weights over the word-frequency
    * table, top-K vocab, greedy longest-match count.
    */
  private def referencePieces(texts: Seq[String], topK: Int,
                              maxLen: Int = 6): Seq[UnigramTokenizer.Piece] = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split("\\s+").foreach { w =>
      if (w.matches("[a-z]{2,20}")) wc(w) = wc.getOrElse(w, 0L) + 1
    })
    val weights = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (i <- 0 until w.length; l <- 2 to maxLen if i + l <= w.length) {
        val p = w.substring(i, i + l)
        weights(p) = weights.getOrElse(p, 0L) + c
      }
    }
    weights.toSeq.sortBy { case (p, wt) => (-wt, p) }.take(topK)
      .map { case (p, wt) => UnigramTokenizer.Piece(p, wt) }
  }

  private def referenceCount(word: String, vocab: Set[String], maxLen: Int = 6): Int = {
    var i = 0; var n = 0
    while (i < word.length) {
      val l = (maxLen.min(word.length - i) to 2 by -1)
        .find(l => vocab.contains(word.substring(i, i + l))).getOrElse(1)
      i += l; n += 1
    }
    n
  }

  test("trainPieces equals the reference substring weights and tie-break") {
    val texts = Seq(
      "the lower lowest low low lowering",
      "newer newest new news the the the",
      "sing singing singer ring rings")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = UnigramTokenizer.trainPieces(spark, docs, topK = 12)
    val want = referencePieces(texts, topK = 12)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("greedy longest-match: longer piece wins, fallback chars count one each") {
    // vocab: "sing" (len 4) and "in" (len 2) — greedy over "singing"
    // must take sing | in | g = 3, never s|in|g|in|g
    val pieces = Seq(UnigramTokenizer.Piece("sing", 10L), UnigramTokenizer.Piece("in", 9L))
    val df = Seq((1L, "singing"), (2L, "sing"), (3L, "xyz"), (4L, "insingin"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        UnigramTokenizer.tokenCount(col("text"), pieces).as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // singing = sing|in|g = 3; sing = 1; xyz = x|y|z = 3 (all fallback);
    // insingin = in|sing|in = 3
    assert(got == Seq(1L -> 3L, 2L -> 1L, 3L -> 3L, 4L -> 3L), got)
  }

  test("tokenCount equals the reference walk corpus-wide; alphabet filter holds") {
    val texts = Seq(
      "the lower lowest low low lowering",
      "newer newest new news the the the",
      "Sing SING 123 a toolongwordthatgoeson!", // outside [a-z]{2,20}: all skipped
      "sing singing singer ring rings",
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pieces = UnigramTokenizer.trainPieces(spark, docs, topK = 8)
    val vocab = pieces.map(_.piece).toSet
    val want = texts.zipWithIndex.map { case (t, i) =>
      val words = t.split("\\s+").filter(_.matches("[a-z]{2,20}"))
      (i.toLong, words.length.toLong,
        words.map(w => referenceCount(w, vocab).toLong).sum)
    }
    val got = docs.select(col("doc_id"),
        UnigramTokenizer.wordCount(col("text")).as("n_words"),
        UnigramTokenizer.tokenCount(col("text"), pieces).as("n_pieces"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got(2)._2 == 0L && got(2)._3 == 0L, "non-alphabet doc contributes nothing")
    assert(got(4)._2 == 0L && got(4)._3 == 0L, "empty doc is zero, not null")
    // the distinct-word + join scorer (q134's production shape) agrees
    // with the pure-projection walk row for row
    val viaJoin = UnigramTokenizer.scoreDocs(docs, pieces)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(viaJoin == want, s"\nviaJoin: $viaJoin\nwant: $want")
  }

  test("piece weights count every occurrence position, weighted by word frequency") {
    // "aaaa" x3: substring "aa" occurs at 3 positions -> weight 9;
    // "aaa" at 2 positions -> 6; "aaaa" at 1 -> 3
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val got = UnigramTokenizer.trainPieces(spark, docs, topK = 3)
    assert(got == Seq(UnigramTokenizer.Piece("aa", 9L),
      UnigramTokenizer.Piece("aaa", 6L), UnigramTokenizer.Piece("aaaa", 3L)), got)
  }

  // ----- EM refinement (fixed-point micro-nat costs — oracle-hashed
  // as q136 since round 17; greedy q134 remains the simpler sibling)

  private val emTexts = Seq(
    "the lower lowest low low lowering",
    "newer newest new news the the the",
    "sing singing singer ring rings",
    "ringer lowering newlow singlow")

  test("EM: loss is non-increasing across iterations and usage conserves coverage") {
    val docs = emTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = UnigramTokenizer.trainPiecesEm(docs, topK = 12, iters = 4)
    assert(r.losses.size == 4)
    assert(r.losses.forall(_ > 0L))
    // CONSERVATION bound first — it doubles as the monotonicity slack
    val wantChars = emTexts.flatMap(_.split("\\s+"))
      .filter(_.matches("[a-z]{2,20}")).map(_.length.toLong).sum
    // hard EM: each iteration's corpus NLL <= the previous, up to the
    // fixed-point quantization (each chosen piece's micro-nat cost is
    // rounded within ±0.5, and piece occurrences are bounded by corpus
    // characters — so wantChars micro-nats is a safe absolute slack)
    r.losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + wantChars, s"loss increased: ${r.losses}")
    }
    // CONSERVATION: every character of every word occurrence is covered
    // by exactly one chosen piece, so sum(usage * |piece|) must equal
    // sum(cnt * |word|) over the corpus alphabet words
    val gotChars = r.pieces.map(p => p.weight * p.piece.length).sum
    assert(gotChars == wantChars, s"coverage: $gotChars vs $wantChars")
    // the usage table is exact-integer deterministic state
    assert(r.pieces == r.pieces.sortBy(p => (-p.weight, p.piece)))
  }

  test("EM: a corpus with no alphabet words trains an empty vocab at loss 0") {
    val docs = Seq((1L, "123 !!! ALLCAPS"), (2L, "")).toDF("doc_id", "text")
    val r = UnigramTokenizer.trainPiecesEm(docs, topK = 5, iters = 2)
    assert(r.pieces.isEmpty && r.losses == Seq(0L, 0L), r)
  }

  test("EM: deterministic across runs (identical pieces, usage and losses)") {
    val docs = emTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = UnigramTokenizer.trainPiecesEm(docs, topK = 10, iters = 3)
    val b = UnigramTokenizer.trainPiecesEm(docs, topK = 10, iters = 3)
    assert(a.pieces == b.pieces)
    assert(a.losses == b.losses)
  }

  test("EM: the E-step plan is a pure projection — no UDF, no shuffle, costs as one literal") {
    // the scale contract: Viterbi DP per distinct word form runs as
    // native HOF expressions inside a Project (one scan, zero
    // exchanges, no Scala UDF); a refactor that sneaks in a UDF or a
    // join would pass correctness and 10x the E-step
    val wf = Seq(("lowering", 3L), ("singer", 2L)).toDF("seq", "cnt")
    // micro-nat fixed-point costs, the production shape
    val costMap = typedlit(Map(
      "low" -> 500000L, "ing" -> 700000L, "er" -> 900000L, "s" -> 2000000L,
      "e" -> 2000000L, "n" -> 2000000L, "g" -> 2000000L, "i" -> 2000000L,
      "o" -> 2000000L, "w" -> 2000000L, "l" -> 2000000L, "r" -> 2000000L))
    val seg = wf
      .select(col("seq"), col("cnt"),
        UnigramTokenizer.viterbiForward(col("seq"), costMap, 6).as("fwd"))
      .select(col("cnt"),
        element_at(col("fwd").getField("costs"), length(col("seq")) + 1).as("cost"),
        UnigramTokenizer.viterbiBacktrace(col("seq"), col("fwd")).as("pieces"))
    val plan = seg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
    // and the DP itself is right: lowering = low|er|ing (2.1e6
    // micro-nats), singer = s|ing|er (3.6e6) — exact integer sums
    val rows = seg.orderBy(col("cnt").desc).collect()
    assert(rows(0).getSeq[String](2).sorted == Seq("er", "ing", "low"), rows(0))
    assert(rows(0).getLong(1) == 2100000L, rows(0))
    assert(rows(1).getSeq[String](2).sorted == Seq("er", "ing", "s"), rows(1))
    assert(rows(1).getLong(1) == 3600000L, rows(1))
  }

  test("EM: a periodic corpus converges to the period piece at near-zero loss") {
    // "abababab" (8 chars, maxLen 6 forbids the whole word): the seed
    // costs make Viterbi pick abab|abab on iteration 1 (2 pieces beat
    // 4 "ab"s under substring-weight costs), the M-step then gives
    // "abab" probability 1, and the loss collapses to ~0 — the
    // likelihood-driven compression greedy longest-match cannot do
    val docs = Seq((1L, ("abababab " * 50).trim)).toDF("doc_id", "text")
    val r = UnigramTokenizer.trainPiecesEm(docs, topK = 6, iters = 3)
    assert(r.pieces == Seq(UnigramTokenizer.Piece("abab", 100L)),
      s"EM must converge to the period piece alone: ${r.pieces}")
    // p("abab") = 1 → cost round(-ln(1)*1e6) = 0 → loss EXACTLY 0
    assert(r.losses.last == 0L,
      s"converged corpus NLL must be exactly 0: ${r.losses}")
    // 400 corpus chars bound the quantization slack (see the
    // monotonicity test above)
    r.losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 400L, s"loss increased: ${r.losses}")
    }
  }
}
