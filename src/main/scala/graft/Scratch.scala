package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev scratchpad for stage-level timing (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }

    // q32 chain exactly as the bench runs it (fresh JVM, local[cpus]).
    time("q32 full chain") {
      val candidates = Dedup.minhashLsh(docs, threshold = 0.5)
      Dedup.jaccardVerify(docs, candidates, threshold = 0.7)
        .orderBy("id_a", "id_b").count()
    }
    // Decomposition of the exploded-shingle verify.
    val cands = time("minhashLsh 0.5")(Dedup.minhashLsh(docs, threshold = 0.5))
    time("candidates count")(cands.count())
    val candIds = cands.select(col("id_a").as("doc_id"))
      .unionByName(cands.select(col("id_b").as("doc_id"))).distinct()
    val candDocs = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
    val sh = Dedup.explodedShingles(candDocs, "doc_id", "text", 5)
      .dropDuplicates("id", "h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("distinct shingle stream")(sh.count())
    val withA = broadcast(cands).join(sh.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("h"))
    time("pair x shingle stream")(withA.count())
    val inter = withA.join(sh.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    time("intersection counts")(inter.count())
    sh.unpersist()
    spark.stop()
  }
}
