package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Clustering operator contracts: fixed-quantizer determinism,
  * assignment vs a from-first-principles brute force, Lloyd training
  * convergence, and the balanced sample's rate semantics.
  */
class ClusteringSuite extends SparkSpec {

  private lazy val emb = graft.Tables.load(spark, sfDir, "embeddings")

  test("fixedCentroids: k lowest ids in order, deterministic across calls") {
    val a = Clustering.fixedCentroids(emb, k = 4)
    val b = Clustering.fixedCentroids(emb, k = 4)
    assert(a.map(_._1) == Seq(0, 1, 2, 3))
    assert(a.zip(b).forall { case ((ia, va), (ib, vb)) => ia == ib && va.sameElements(vb) })
    val lowest = emb.orderBy("vec_id").limit(4).select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    assert(a.map(_._2).zip(lowest).forall { case (x, y) => x.sameElements(y) })
  }

  test("assign matches brute-force cosine argmax (ties to larger id)") {
    val cents = Clustering.fixedCentroids(emb, k = 8)
    val got = emb.select(col("vec_id"),
        Clustering.assign(col("embedding"), cents).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) Double.NaN else d / den
    }
    vecs.foreach { case (id, v) =>
      // max by (sim, cid): NaN loses to reals; ties go to the larger cid
      val best = cents.map { case (cid, c) => (cos(v, c), cid) }
        .reduceLeft { (x, y) =>
          val (sx, ix) = x; val (sy, iy) = y
          val xn = sx.isNaN; val yn = sy.isNaN
          if (xn != yn) { if (xn) y else x }
          else if (!xn && sx != sy) { if (sy > sx) y else x }
          else { if (iy > ix) y else x }
        }._2
      assert(got(id) == best, s"vec $id: kernel ${got(id)} vs brute $best")
    }
  }

  test("clusterStats covers the corpus exactly once") {
    val cents = Clustering.fixedCentroids(emb, k = 8)
    val stats = Clustering.clusterStats(emb, cents).collect()
    assert(stats.map(_.getLong(1)).sum == emb.count())
    assert(stats.map(_.getInt(0)).toSet.subsetOf((0 until 8).toSet))
  }

  test("train: Lloyd rounds are deterministic and do not increase distortion") {
    val c0 = Clustering.train(emb, k = 4, iters = 0)
    val c2 = Clustering.train(emb, k = 4, iters = 2)
    val c2b = Clustering.train(emb, k = 4, iters = 2)
    assert(c2.zip(c2b).forall { case ((ia, va), (ib, vb)) => ia == ib && va.sameElements(vb) })
    def distortion(cents: Seq[(Int, Array[Float])]): Double = {
      val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0).toArray)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 0.0 else d / den
      }
      vecs.map(v => 1.0 - cents.map(c => cos(v, c._2)).max).sum
    }
    assert(distortion(c2) <= distortion(c0) + 1e-9,
      "two Lloyd rounds must not increase total cosine distortion")
  }

  test("balancedSample: small clusters keep everything, large ones thin, output is deterministic") {
    val cents = Clustering.fixedCentroids(emb, k = 8)
    val sizes = Clustering.clusterStats(emb, cents).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cap = 8L
    val sample = Clustering.balancedSample(emb, cents, perCluster = cap)
    val kept = sample.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    sizes.foreach { case (c, n) =>
      if (n <= cap) assert(kept.getOrElse(c, 0L) == n, s"cluster $c (n=$n <= cap) must keep all")
      else assert(kept.getOrElse(c, 0L) < n, s"cluster $c (n=$n > cap) must thin")
    }
    // bucket column present and within the hash range; re-run identical
    val rows = sample.orderBy("vec_id").collect()
    assert(rows.forall(r => r.getLong(r.fieldIndex("bucket")) >= 0 &&
      r.getLong(r.fieldIndex("bucket")) < 100))
    val rows2 = Clustering.balancedSample(emb, cents, perCluster = cap)
      .orderBy("vec_id").collect()
    assert(rows.map(_.toString).sameElements(rows2.map(_.toString)))
  }

  test("semDedup: survivors = exactly the vectors with no lower-id same-cluster neighbor over threshold") {
    val cents = Clustering.fixedCentroids(emb, k = 8)
    val thr = 0.30
    val survivors = Clustering.semDedup(emb, cents, threshold = thr)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // brute force from first principles
    val assigned = emb.select(col("vec_id"),
        Clustering.assign(col("embedding"), cents).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos4(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) Double.NaN
      else BigDecimal(d / den).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCluster = assigned.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted)
    val expectDropped = byCluster.values.flatMap { ids =>
      ids.filter(y => ids.exists(x => x < y && cos4(vecs(x), vecs(y)) >= thr))
    }.toSet
    vecs.keys.foreach { id =>
      if (expectDropped(id)) assert(!survivors.contains(id), s"vec $id must be dropped")
      else assert(survivors.get(id).contains(assigned(id)), s"vec $id must survive with its cluster")
    }
    // a threshold above cosine's range keeps the whole corpus
    assert(Clustering.semDedup(emb, cents, threshold = 1.01).count() == emb.count())
  }
}
