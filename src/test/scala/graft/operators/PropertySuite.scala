package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Property-based checks: operator semantics vs a naive in-memory
  * reference over randomized inputs (scalacheck), plus empty-input
  * hardening — a distributed operator must agree with the obvious
  * sequential definition on ANY input, not just the fixtures.
  */
class PropertySuite extends SparkSpec {
  import spark.implicits._

  /** Run a scalacheck property with a fixed seed (deterministic CI). */
  private def check(p: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val smallKeys = Gen.chooseNum(0L, 6L)

  test("property: upsert == naive map overlay") {
    val rows = Gen.listOfN(20, Gen.zip(smallKeys, Gen.alphaStr.map(_.take(4))))
    check(Prop.forAll(rows, rows) { (base, src) =>
      // de-dup keys within each side first (upsert's contract: unique keys)
      val b = base.toMap.toSeq
      val s = src.toMap.toSeq
      val want = (b.toMap ++ s.toMap).toSet
      val got = Relational.upsert(b.toDF("k", "v"), s.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
      got == want
    })
  }

  test("property: saltedJoin == plain join on random multisets") {
    val rows = Gen.listOfN(30, smallKeys)
    check(Prop.forAll(rows, Gen.listOfN(8, smallKeys)) { (l, r) =>
      val left = l.map(k => (k, s"l$k")).toDF("k", "lv")
      val right = r.distinct.map(k => (k, s"r$k")).toDF("k", "rv")
      val plain = left.join(right, Seq("k")).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).sorted.toSeq
      val salted = Relational.saltedJoin(left, right, Seq("k"), 4).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).sorted.toSeq
      salted == plain
    })
  }

  test("property: tokenBudget keeps exactly the maximal prefix per group") {
    val docs = Gen.listOfN(12, Gen.zip(Gen.chooseNum(1L, 50L), Gen.chooseNum(1, 9)))
    check(Prop.forAll(docs) { ds =>
      // unique ids; text with n tokens
      val rows = ds.zipWithIndex.map { case ((_, n), i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "), "xx")
      }
      val budget = 10L
      val want = rows.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, cum), (id, text, _)) =>
        (id, cum + text.split(" ").length)
      }.drop(1).takeWhile(_._2 <= budget).map(_._1).toSet
      val got = Curation.tokenBudget(rows.toDF("doc_id", "text", "lang"), budget)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      got == want
    })
  }

  test("property: exact dedup keeps one minimal keeper per normalized text") {
    val texts = Gen.listOfN(15, Gen.oneOf("a b", "A  b", " a B ", "c", "d e f"))
    check(Prop.forAll(texts) { ts =>
      val rows = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val norm = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ")
      val want = rows.groupBy(r => norm(r._2)).values.map(_.map(_._1).min).toSet
      val got = Dedup.exact(rows.toDF("doc_id", "text"))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      got == want
    })
  }

  test("empty inputs: operators return empty results, not errors") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(docs).count() == 0)
    assert(Dedup.minhashLsh(docs).count() == 0)
    assert(Dedup.simhashPairs(docs).count() == 0)
    assert(Curation.curate(docs.withColumn("lang", lit("en"))).count() == 0)
    assert(Curation.chunkDedup(docs).count() == 0)
    assert(TextAnalysis.repetitionSignals(docs).count() == 0)
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.knnBrute(emb, emb).count() == 0)
    assert(Similarity.embeddingNearDup(emb, dim = 4).count() == 0)
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.nearDupGroups(pairs).count() == 0)
    // round-4 operators
    assert(TextAnalysis.bm25(docs, Seq("spark")).count() == 0)
    assert(TextAnalysis.charEntropy(docs).count() == 0)
    assert(Curation.languageMix(docs.withColumn("lang", lit("en")), Seq("en")).count() == 0)
    val noPts = Seq.empty[(Long, Double)].toDF("p_id", "v")
    val noIvs = Seq.empty[(Long, Double, Double)].toDF("iv_id", "lo", "hi")
    assert(Relational.intervalJoin(noPts, "v", noIvs, "lo", "hi", 10.0).count() == 0)
  }

  test("property: native as-of == union+window as-of on random inputs") {
    // rights unique per (key, time) — both formulations' documented
    // contract (ties among equal (k,t) right rows are otherwise
    // formulation-dependent)
    val lefts = Gen.listOfN(15, Gen.zip(smallKeys, Gen.chooseNum(0L, 40L)))
    val rights = Gen.listOfN(10, Gen.zip(smallKeys, Gen.chooseNum(0L, 40L)))
    check(Prop.forAll(lefts, rights) { (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = r.distinct.map { case (k, t) => (k, t, s"p$k-$t") }
        .toDF("k", "rt", "p")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "p").collect()
          .map(x => (x.getLong(0), Option(x.getString(1)))).sorted.toSeq
      rows(Relational.asOfNative(left, right, "k", "t", "rt", Seq("p"))) ==
        rows(Relational.asOf(left, right, "k", "t", "rt", Seq("p")))
    })
  }

  test("property: space-saving sketch == exact counts when distinct <= capacity") {
    val values = Gen.listOfN(60, Gen.chooseNum(0, 11))
    check(Prop.forAll(values) { vs =>
      val df = vs.map(_.toString).toDF("v").repartition(3)
      val got = df.agg(graft.functions.VectorFunctions.spaceSavingTopK(col("v"), 16).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.cnt"), col("e.err"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = vs.groupBy(_.toString).view.mapValues(_.size.toLong).toMap
      got.view.mapValues(_._1).toMap == want && got.values.forall(_._2 == 0L)
    })
  }

  test("null/degenerate text rows drop cleanly from the text operators") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "spark data engine spark")).toDF("doc_id", "text")
    // null/empty/whitespace docs contribute no tokens or chars — only
    // doc 4 survives each operator, with no NPE or negative counts.
    val bm = TextAnalysis.bm25(docs, Seq("spark")).collect()
    assert(bm.map(_.getAs[Long]("id")).toSeq == Seq(4L))
    val ent = TextAnalysis.charEntropy(docs).collect()
    assert(ent.map(_.getAs[Long]("id")).toSeq == Seq(4L))
    assert(ent.head.getAs[Double]("entropy_bits") > 0)
    val rep = TextAnalysis.repetitionSignals(docs).collect()
    assert(rep.length == 4) // projection-level op keeps all rows
    assert(rep.forall(r => r.getAs[Long]("n_tokens") >= 0))
  }
}
