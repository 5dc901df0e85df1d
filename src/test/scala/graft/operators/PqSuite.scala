package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Product quantization (ProductQuantizer) — determinism, the
  * exact-mode equivalence, and recall floors for the compressed path
  * behind q73.
  */
class PqSuite extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val n = emb.count()
  private lazy val cb = ProductQuantizer.train(emb, dim = 64, m = 8, ksub = 16, iters = 2)
  private lazy val coarse = Similarity.ivfCentroids(emb, nlist = 8, iters = 2)
  private lazy val probes = emb.where(col("vec_id") < 10)

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
      .groupBy(_._1).map { case (p, rs) => p -> rs.sortBy(_._3).map(_._2).toSeq }

  test("training is deterministic and codebooks round-trip through a DataFrame") {
    val again = ProductQuantizer.train(emb, dim = 64, m = 8, ksub = 16, iters = 2)
    assert(cb.cents.flatten.map(_.toSeq) == again.cents.flatten.map(_.toSeq))
    val back = ProductQuantizer.codebookFromDF(
      ProductQuantizer.codebookToDF(spark, cb))
    assert(back.dim == 64 && back.m == 8 && back.ksub == 16)
    assert(back.cents.flatten.map(_.toSeq) == cb.cents.flatten.map(_.toSeq))
  }

  test("codes are m ints in [0, ksub) — the m-byte storage contract") {
    val codes = emb.select(ProductQuantizer.encodeExpr(col("embedding"), cb).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // quantization must actually use the codebook spread, not collapse
    // to a handful of cells
    assert(codes.flatten.distinct.length > 8)
  }

  test("exact mode (nprobe=nlist, rerank=n) reproduces brute-force top-k exactly") {
    // With every list probed and every candidate re-ranked, the ADC
    // stage prunes nothing — the result must EQUAL brute force, which
    // pins the whole pipeline's plumbing (ids, joins, tie-breaks).
    val brute = topk(Similarity.knnBrute(emb, probes, k = 10))
    val got = topk(ProductQuantizer.ivfPqAnn(emb, probes, coarse, cb,
      k = 10, nprobe = 8, rerank = n.toInt))
    assert(got == brute)
  }

  test("persisted list-partitioned codes search identically to the inline path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_codes").toString + "/codes"
    ProductQuantizer.encodeCorpus(emb, coarse, cb)
      .write.partitionBy("list_id").parquet(dir)
    val inline = topk(ProductQuantizer.ivfPqAnn(emb, probes, coarse, cb,
      k = 10, nprobe = 4, rerank = 80))
    val viaDisk = topk(ProductQuantizer.ivfPqAnnCoded(spark.read.parquet(dir),
      emb.select(col("vec_id"), col("embedding").as("vec")),
      probes, coarse, cb, k = 10, nprobe = 4, rerank = 80))
    assert(viaDisk == inline)
  }

  test("compressed mode holds a recall floor at a 32x smaller scan") {
    // Measured decomposition on this (synthetic, near-uniform — the
    // hard case for PQ) corpus: coarse-only recall at nprobe=4 is
    // 0.93; ADC pruning at rerank=40 drops to ~0.63, rerank=80
    // recovers ~0.87 — the rerank knob, not codebook size, is the
    // cheap recall lever (80 point-reads/probe vs a 2× bigger
    // codebook). q73 ships these settings.
    val brute = topk(Similarity.knnBrute(emb, probes, k = 10))
    val got = topk(ProductQuantizer.ivfPqAnn(emb, probes, coarse, cb,
      k = 10, nprobe = 4, rerank = 80))
    val recalls = brute.map { case (p, want) =>
      (got.getOrElse(p, Seq.empty).toSet & want.toSet).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.75, s"mean recall@10 $mean below floor (per-probe: $recalls)")
  }
}
