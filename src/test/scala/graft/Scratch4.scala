package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup}

/** Round-6 scale probe (dev scratchpad, like Scratch/Scratch2/Scratch3):
  * incremental dedup cost model. The claim worth money at 100 TB is
  * that admitting a fixed-size ingest batch against an ever-growing
  * corpus costs O(delta text + corpus SIGNATURES), not O(corpus text):
  * the batch operator re-normalizes/shingles/hashes every corpus byte,
  * the incremental operator re-reads only the stored ~1 KB/doc
  * signatures. So as the corpus grows R×, batch recompute time should
  * grow ~R× while delta time grows only with the (much smaller)
  * signature scan.
  *
  * Probe: corpus = documents replicated R× (text perturbed per copy so
  * replicas are not exact dups), delta = fixed 2k docs. Measures, per R:
  * store init (one-off, O(corpus text)), dedupeDelta wall time, and the
  * batch-equivalent minhashLsh(corpus ∪ delta) wall time.
  */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scratch4] $name: $s%.2f s -> $r"); (r, s)
    }

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val nDocs = docs.count()
    println(s"[scratch4] base documents: $nDocs")

    // fixed small delta: 1-in-25 docs re-ingested under fresh ids —
    // near-dups of corpus copy 0 (an ingest batch overlapping the
    // corpus). A FIXED delta against a GROWING corpus is the scenario
    // the incremental operator exists for.
    val delta = docs.where(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
    val nDelta = delta.count()
    println(s"[scratch4] fixed delta: $nDelta docs")

    for (r <- Seq(1, 8, 32)) {
      // replica i gets an id offset and a per-copy text perturbation so
      // copies are near (not exact) dups and buckets stay realistic
      val corpus = (0 until r).map { i =>
        docs.select((col("doc_id") + i.toLong * 10000000L).as("doc_id"),
          concat(col("text"), lit(s" corpus variant tag $i")).as("text"))
      }.reduce(_ unionByName _)
      val root = java.nio.file.Files.createTempDirectory(s"scratch4_r$r").toString + "/store"

      val (_, tInit) = time(s"r=$r initStore (one-off corpus pass)") {
        IncrementalDedup.initStore(spark, corpus, root)
      }
      val (_, tDelta) = time(s"r=$r dedupeDelta (incremental)") {
        val res = IncrementalDedup.dedupeDelta(spark, delta, root)
        val n = (res.pairs.count(), res.survivors.count())
        Dedup.releaseCheckpoint(res.pairs, res.survivors)
        n
      }
      val (_, tBatch) = time(s"r=$r batch minhashLsh(corpus ∪ delta) recompute") {
        val pairs = Dedup.minhashLsh(corpus.unionByName(delta))
        val n = pairs.count()
        Dedup.releaseCheckpoint(pairs)
        n
      }
      println(f"[scratch4] r=$r summary: corpus=${nDocs * r} init=$tInit%.2f s " +
        f"delta=$tDelta%.2f s batch=$tBatch%.2f s speedup=${tBatch / tDelta}%.1fx")
    }
    spark.stop()
  }
}
