package graft.operators

import graft.SparkSpec
import graft.pipeline.VersionedTable
import org.apache.spark.sql.functions._

/** Incremental (delta-vs-store) dedup: exact equivalence to the batch
  * operator, survivor semantics, the O(delta) store append, and the
  * exact-fingerprint variant's contract.
  */
class IncrementalDedupSuite extends SparkSpec {
  import spark.implicits._

  /** Seeded template corpus (GroundTruthSuite's recipe): 30 templates
    * × 5 lightly-mutated copies. Ids t*5+i; copies of one template are
    * mutual near-dups, templates are mutually unrelated.
    */
  private lazy val corpusAll: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(321)
    val words = Vector("data", "spark", "engine", "query", "scale", "table", "join",
      "batch", "stream", "vector", "index", "shard", "merge", "scan", "cache")
    def sentence() = Seq.fill(8 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString(" ")
    val templates = Seq.fill(30)(Seq.fill(6)(sentence()).mkString(". "))
    templates.zipWithIndex.flatMap { case (tpl, t) =>
      (0 until 5).map { i =>
        val text = if (i == 0) tpl
          else tpl.split(" ").map(w =>
            if (rnd.nextInt(12) == 0) words(rnd.nextInt(words.size)) else w).mkString(" ")
        ((t * 5 + i).toLong, text)
      }
    }
  }

  // Delta = copies 0 and 1 of each template: plenty of delta-vs-corpus
  // pairs AND delta-internal pairs; ids disjoint from the corpus split.
  private lazy val corpus = corpusAll.filter(_._1 % 5 >= 2).toDF("doc_id", "text")
  private lazy val delta = corpusAll.filter(_._1 % 5 <= 1).toDF("doc_id", "text")

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  test("dedupeDelta pairs == batch minhashLsh pairs restricted to delta-touching") {
    val root = tmpRoot("incdedup_eq")
    IncrementalDedup.initStore(spark, corpus, root)
    val res = IncrementalDedup.dedupeDelta(spark, delta, root, append = false)

    val full = Dedup.minhashLsh(corpusAll.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter { case (a, b, _) => a % 5 <= 1 || b % 5 <= 1 }
    val got = res.pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(expected.nonEmpty, "test corpus must produce delta-touching pairs")
    assert(got === expected)
    // both kinds of pair must actually occur for this test to mean much
    val srcs = res.pairs.select("src").distinct().as[String].collect().toSet
    assert(srcs === Set("corpus", "delta"))
  }

  test("survivors = delta minus matched; store append is O(delta) and versioned") {
    val root = tmpRoot("incdedup_surv")
    val v1 = IncrementalDedup.initStore(spark, corpus, root)
    assert(v1 === 1L)
    val res = IncrementalDedup.dedupeDelta(spark, delta, root)
    assert(res.version === 2L)

    // survivor rule recomputed from the emitted pairs: a delta doc
    // survives iff it is no verified pair's delta_id — i.e. it matches
    // no corpus doc and no lower-id delta doc.
    val matchedDelta = res.pairs.collect().flatMap { r =>
      val (a, b, src) = (r.getLong(0), r.getLong(1), r.getString(3))
      if (src == "corpus") Seq(a, b).filter(_ % 5 <= 1) else Seq(b)
    }.toSet
    val expectedSurvivors = delta.as[(Long, String)].collect().map(_._1).toSet -- matchedDelta
    val gotSurvivors = res.survivors.select("doc_id").as[Long].collect().toSet
    assert(gotSurvivors === expectedSurvivors)

    // the appended version holds EXACTLY the survivor signatures, and
    // the store read-back is corpus + survivors
    val appended = VersionedTable.changesSince(spark, root, v1)
    assert(appended.select("id").as[Long].collect().toSet === expectedSurvivors)
    val store = VersionedTable.read(spark, root)
    assert(store.count() === corpus.count() + expectedSurvivors.size)

    // a re-ingest of the admitted docs under fresh ids is fully deduped
    // against the updated store: zero survivors, nothing appended
    val reIngest = res.survivors.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val res2 = IncrementalDedup.dedupeDelta(spark, reIngest, root)
    assert(res2.survivors.count() === 0L)
    assert(VersionedTable.read(spark, root).count() === store.count())
  }

  test("exact store: anti-join survivors, O(delta) append, changesSince contract") {
    val root = tmpRoot("incdedup_exact")
    val corpusX = Seq((1L, "aaa bbb"), (2L, "ccc ddd"), (3L, "aaa  bbb")).toDF("doc_id", "text")
    val deltaX = Seq(
      (100L, "AAA bbb"),   // normalizes to a corpus fingerprint — dropped
      (101L, "eee fff"),   // fresh, keeper of its delta group
      (102L, "eee  FFF"),  // same normalized text as 101 — dropped (higher id)
      (103L, "ccc ddd"),   // corpus dup — dropped
      (104L, "ggg hhh")    // fresh
    ).toDF("doc_id", "text")

    val v1 = IncrementalDedup.initExactStore(spark, corpusX, root)
    assert(v1 === 1L)
    val res = IncrementalDedup.exactDelta(spark, deltaX, root)
    assert(res.version === 2L)
    assert(res.survivors.select("keeper_id").as[Long].collect().toSet === Set(101L, 104L))

    // changesSince(v1) answers "which docs did this batch admit"
    val admitted = VersionedTable.changesSince(spark, root, v1)
    assert(admitted.select("keeper_id").as[Long].collect().toSet === Set(101L, 104L))

    // second identical batch admits nothing (idempotent re-run)
    val res2 = IncrementalDedup.exactDelta(spark,
      deltaX.select((col("doc_id") + 1000L).as("doc_id"), col("text")), root)
    assert(res2.survivors.count() === 0L)
  }

  test("store params: pinned at init, loudly required for deltas") {
    val root = tmpRoot("incdedup_params")
    val custom = IncrementalDedup.SigParams(numHashes = 64, shingleK = 4, seed = 7L)
    IncrementalDedup.initStore(spark, corpus, root, params = custom)
    assert(IncrementalDedup.storeParams(spark, root) === Some(custom))
    // delta banding derives geometry from the PINNED family (64 hashes,
    // 8 bands × 8 rows) — just has to run green end-to-end
    val res = IncrementalDedup.dedupeDelta(spark, delta.limit(10), root, bands = 8, append = false)
    assert(res.version === -1L)

    val bare = tmpRoot("incdedup_noparams")
    val e = intercept[IllegalStateException] {
      IncrementalDedup.dedupeDelta(spark, delta, bare)
    }
    assert(e.getMessage.contains("_sig_params"))
  }
}
