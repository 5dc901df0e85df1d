package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 probe: FORCED-materialization sweep over the text/LLM
  * operator family. The round's big find (the O(words²) lambda
  * re-evaluation) hid behind the bench's `count()` driver for months:
  * Catalyst eliminates a unique-key left join — and any pure
  * projection — under a bare count, so an operator's bench number can
  * measure a fraction of its real output cost. This sweep times each
  * query BOTH ways at the bench's own scale:
  *
  *   count  — the bench's driver (whatever Catalyst keeps)
  *   forced — bit_xor(xxhash64(struct(every output column))): every
  *            column of every row must materialize
  *
  * A large forced/count ratio is not itself a bug (projection-heavy
  * operators legitimately do their work only when asked for output) —
  * the sweep's value is the ABSOLUTE forced column: any entry far
  * above its family's baseline is a hidden per-row cost worth a plan
  * audit. Ratios near 1 mean the bench number already reflects real
  * work.
  */
object Scratch16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm

    // the HOF/text-heavy family (projection-dominated operators whose
    // cost a count() can under-report); store/commit-protocol queries
    // are excluded — their cost is the commits, which count() executes
    val targets = Seq(
      "q24_tokencount", "q25_textquality", "q26_langid", "q27_fingerprint",
      "q28_ngrams", "q37_tfidf", "q41_repetition", "q47_sample",
      "q49_token_budget", "q57_bm25", "q58_entropy", "q59_lang_mix",
      "q90_boilerplate", "q101_seq_pack", "q104_gopher", "q112_chunk_overlap",
      "q114_vocab", "q115_contamination_score", "q116_shard_assign",
      "q126_bpe", "q127_bpe_encode", "q128_ngram_lm", "q129_lm_score",
      "q130_bpe_pack", "q134_unigram", "q135_ccnet_buckets")

    def once(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    println("[s16] query, count_s, forced_s, ratio")
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val tCount = once(fn(spark, dir).count())
      val tForced = once {
        val df = fn(spark, dir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect() // xor: no ANSI long overflow
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"[s16] $name%-26s ${tCount}%7.2f ${tForced}%7.2f ${tForced / math.max(tCount, 0.001)}%6.1fx")
    }
    spark.stop()
  }
}
