package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev scratchpad for stage-level timing (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }

    // q32 stage decomposition
    val cands = Dedup.minhashLsh(docs, threshold = 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidates est>=0.5")(cands.count())
    val candIds = cands.select(col("id_a").as("doc_id"))
      .unionByName(cands.select(col("id_b").as("doc_id"))).distinct()
    time("candidate docs")(candIds.count())
    val candDocs = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
    val sh = Dedup.explodedShingles(candDocs, "doc_id", "text", 5)
      .groupBy(col("id")).agg(collect_set(col("h")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle sets")(sh.count())
    val joined = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .where(col("jaccard") >= 0.7)
    time("verify join+intersect")(joined.count())
    time("full jaccardVerify")(Dedup.jaccardVerify(docs, cands, threshold = 0.7).count())
    spark.stop()
  }
}
