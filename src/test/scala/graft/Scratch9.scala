package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}

/** Round-10 probe: where do q95/q93's all-pairs exact-mode seconds go?
  * Steady-state (2nd-run) piecewise timing of the jaccardVerify
  * internals at sf0.001 (500 docs / 367 kept).
  */
object Scratch9 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // full warm-up pass: compiles every kernel involved
    SparkEntry.queries("q95_curate_neardup_exact")(spark, dir).count()
    spark.catalog.clearCache()
    println("== warm ==")
    val banded = docs.select(lit(0).as("band"), lit(0L).as("key"), col("doc_id").as("id"))
    val pairs = time("bucketPairs count") {
      val p = Dedup.bucketPairs(banded, Seq("band", "key"), "id", 1 << 20)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val candIds = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    time("candIds count")(candIds.count())
    val candDocs = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
    val sets = candDocs.select(col("doc_id").as("id"),
      graft.functions.VectorFunctions.shingleSet(
        TextAnalysis.normalize(col("text")), 5).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets count")(sets.count())
    val verified = pairs
      .join(broadcast(sets.select(col("id").as("id_a"), col("sh").as("sh_a"))), Seq("id_a"))
      .join(broadcast(sets.select(col("id").as("id_b"), col("sh").as("sh_b"))), Seq("id_b"))
      .withColumn("inter",
        graft.functions.VectorFunctions.sortedIntersectCountL(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .where(col("jaccard") >= 0.7)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    time("verified count")(verified.count())
    time("verified localCheckpoint")(verified.localCheckpoint(true))
    pairs.unpersist(true); sets.unpersist(true)
    time("full q93 warm")(SparkEntry.queries("q93_jaccard_exact")(spark, dir).count())
    time("full q95 warm")(SparkEntry.queries("q95_curate_neardup_exact")(spark, dir).count())
    time("full q30 warm (LSH reference)")(SparkEntry.queries("q30_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}
