package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-based bigram LM pinned against a naive driver reference, plus
  * the scoring-side contracts q129's oracle relies on: occurrence
  * multiplicity, exact integer micro-prob sums, zero rows for
  * bigram-less documents, and the margin-before-prune ordering.
  */
class NgramLmSuite extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the cat food"),
    (3L, "THE 123"),          // nothing in-alphabet → no bigrams
    (4L, "solo"),             // one word → no bigrams
    (5L, "the cat sat"))
  private def docs = texts.toDF("doc_id", "text")

  private def refBigrams: Map[(String, String), Long] = {
    val b = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { case (_, t) =>
      val ws = t.split("\\s+").filter(_.matches("[a-z]{2,20}"))
      ws.sliding(2).filter(_.length == 2).foreach { p =>
        b((p(0), p(1))) = b.getOrElse((p(0), p(1)), 0L) + 1 }
    }
    b.toMap
  }

  test("trainBigrams equals the reference counts; margins fix before the prune") {
    val lm = NgramLm.trainBigrams(docs, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    val ref = refBigrams
    assert(lm.keySet == ref.keySet)
    val margins = ref.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    lm.foreach { case ((w1, w2), (c12, c1, p, pm)) =>
      assert(c12 == ref((w1, w2)), s"($w1,$w2)")
      assert(c1 == margins(w1), s"margin of $w1")
      assert(math.abs(p - c12.toDouble / c1) < 1e-6)
      assert(pm == math.round(c12 * 1000000.0 / c1))
    }
    // prune keeps true conditionals: ('the','cat') has c12=3 of c1=5
    val pruned = NgramLm.trainBigrams(docs, minCount = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(pruned.keySet == ref.filter(_._2 >= 2).keySet)
    assert(pruned(("the", "cat")) == margins("the"),
      "the margin must be computed over the FULL table, not the pruned one")
  }

  test("scoreDocs: occurrence multiplicity, OOV split, bigram-less docs score zero") {
    val lm = NgramLm.trainBigrams(docs, minCount = 2L)
    val got = NgramLm.scoreDocs(docs, lm).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = got.map(g => g._1 -> g).toMap
    // prune keeps (the,cat) c12=4 and (cat,sat) c12=2 only.
    // doc 1: bigrams (the,cat)(cat,sat)(sat,on)(on,the)(the,mat) —
    // two survive the prune → 2 found of 5
    assert(byId(1L)._2 == 5L && byId(1L)._3 == 2L, byId(1L).toString)
    // doc 2: (the,cat) twice → multiplicity counts both occurrences
    assert(byId(2L)._2 == 5L && byId(2L)._3 == 2L,
      s"occurrence multiplicity lost: ${byId(2L)}")
    // docs 3/4: no in-alphabet bigrams at all
    assert(byId(3L) == (3L, 0L, 0L, 0L) && byId(4L) == (4L, 0L, 0L, 0L))
    // exactness: the sums are integer combinations of the LM entries
    // (margin 'the'=5 → p_micro(the,cat)=800000; 'cat'=4 → (cat,sat)=500000)
    val theCat = lm.where($"w1" === "the" && $"w2" === "cat")
      .select($"p_micro").head().getLong(0)
    val catSat = lm.where($"w1" === "cat" && $"w2" === "sat")
      .select($"p_micro").head().getLong(0)
    assert(theCat == 800000L && catSat == 500000L)
    assert(byId(1L)._4 == theCat + catSat && byId(2L)._4 == 2L * theCat)
    assert(byId(5L)._4 == theCat + catSat) // "the cat sat"
  }

  test("bucketByScore: exact thirds by k-th largest score, ties share a bucket") {
    // scores by construction: 9 docs with distinct scores → 3/3/3
    val scored = (1L to 9L).map(i => (i, 10L, 10L, i * 10L))
      .toDF("doc_id", "n_bigrams", "n_found", "sum_p_micro")
    val got = NgramLm.bucketByScore(scored)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    // score = sum_p_micro * 1000 div 10 = i * 1000
    assert(got.map(_._2) == (1L to 9L).map(_ * 1000L))
    assert(got.map(_._3) == Seq("tail", "tail", "tail",
      "middle", "middle", "middle", "head", "head", "head"), got)

    // ties straddling a boundary land WHOLE in the higher bucket:
    // 6 docs scoring {30,30,30,30,20,10} → k1=2, k2=4, and BOTH the
    // 2nd and 4th largest scores are 30 — head absorbs the whole tie
    // (middle is swallowed), the two below-tie docs are tail
    val tied = Seq((1L, 30L), (2L, 30L), (3L, 30L), (4L, 30L), (5L, 20L), (6L, 10L))
      .map { case (i, s) => (i, 1L, 1L, s) }
      .toDF("doc_id", "n_bigrams", "n_found", "sum_p_micro")
    val gt = NgramLm.bucketByScore(tied)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(gt.map(_._3) == Seq("head", "head", "head", "head", "tail", "tail"), gt)

    // bigram-less docs score 0 and land in tail when others score higher
    val z = Seq((1L, 0L, 0L, 0L), (2L, 2L, 2L, 100L), (3L, 2L, 2L, 200L))
      .toDF("doc_id", "n_bigrams", "n_found", "sum_p_micro")
    val gz = NgramLm.bucketByScore(z)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(gz == Seq((1L, 0L, "tail"), (2L, 50000L, "middle"), (3L, 100000L, "head")), gz)
  }
}
