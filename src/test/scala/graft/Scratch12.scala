package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe: near-dup superlinearity IS pair-volume growth.
  *
  * The sf1 bench construction replicates the corpus 10× (distinct ids,
  * duplicated text), so every original duplicate CLUSTER of size k
  * becomes size 10k and its pair count grows ~100× while the corpus
  * grows 10× — the worst sf1/sf0.1 wall ratios sit exactly in the
  * near-dup family (q31 8.7×, q46 6.8× at round 12). This probe pins
  * the explanation the way round 4 did for q32: a replication-factor
  * sweep R ∈ {1,2,4,8} over the same base corpus, recording
  * (corpus size, OUTPUT pair/group volume, wall) for
  *
  *   - SimHash banding + hamming verify (q31's operator), and
  *   - MinHash-LSH → union-find grouping (q46's chain).
  *
  * The claim under test: wall tracks the verified-PAIR volume (~R²),
  * NOT corpus² — i.e. wall/pairs stays flat-or-falling as R grows
  * while pairs/doc grows ~R. A future SimHash banding regression
  * (e.g. a band key that stops pruning) would show up here as
  * wall growing ABOVE the pair-volume line, which "expected
  * superlinearity" could no longer hide.
  *
  * Timings min-of-1 on a shared VM — read the SLOPE, not the values.
  */
object Scratch12 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    base.persist(); base.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    println("R\tdocs\tsimhash_pairs\tsimhash_s\ts_per_kpair\tgroups\tgroup_s")
    for (r <- Seq(1, 2, 4, 8)) {
      val corpus = (0 until r).map(i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .persist()
      val n = corpus.count()
      val (pairs, tSim) = timed(
        graft.operators.Dedup.simhashPairs(corpus, maxHamming = 8).count())
      val (groups, tGrp) = timed(
        graft.operators.Dedup.nearDupGroups(
          graft.operators.Dedup.minhashLsh(corpus, threshold = 0.8))
          .select(countDistinct("group_id")).head().getLong(0))
      corpus.unpersist(true)
      println(f"$r\t$n\t$pairs\t$tSim%.2f\t${tSim / (pairs / 1000.0)}%.4f\t$groups\t$tGrp%.2f")
    }
    base.unpersist(true)
    spark.stop()
  }
}
