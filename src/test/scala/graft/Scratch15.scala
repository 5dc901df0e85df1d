package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 probe: q97_incremental_neardup_exact timing anatomy. The
  * round-14 verdict measured q97 at 4.1 s controlled vs 2.7 s in
  * round 13 with UNTOUCHED code (IncrementalDedup last changed round
  * 13; the round-14 VersionedTable diff touched commitOverwriteWhere
  * only — not commitDelta/commit, which q97's init path uses). q97's
  * working set is CONSTANT by construction (doc_id < 512 cap,
  * append=false → no store commit in the delta flow), so real growth
  * is impossible; this probe separates fixed JVM/first-run cost from
  * steady-state cost.
  *
  * Phases per repetition (fresh store root each time, same sf dir the
  * bench uses):
  *   init  — initStore: one signature pass over the capped corpus +
  *           one VersionedTable.commit (the only store commit q97 pays)
  *   delta — dedupeDeltaExact: snapshot pin + delta signatures +
  *           constant-band pair gen + exact-Jaccard verify + survivor
  *           anti-join
  *   drive — pairs.orderBy.count (forces the q97 result)
  *
  * Read the SHAPE: if rep 1 dwarfs warm reps and warm reps are flat,
  * the 2.7→4.1 s drift is first-run JIT/classloading + VM noise, not
  * a creeping commit-path cost.
  */
object Scratch15 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("S15_REPS", "5").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm

    def t[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }

    val docs = Tables.load(spark, dir, "documents").where(col("doc_id") < 512)
    docs.count() // pull the parquet footer read out of rep 1

    for (rep <- 1 to reps) {
      val root = java.nio.file.Files.createTempDirectory("s15").toString + "/t"
      val (_, ti) = t(operators.IncrementalDedup.initStore(
        spark, docs.where(pmod(col("doc_id"), lit(10)) =!= 0), root))
      val (res, td) = t(operators.IncrementalDedup.dedupeDeltaExact(
        spark, docs.where(pmod(col("doc_id"), lit(10)) === 0), root, docs))
      val ((n, _), tp) = t((res.pairs.select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b").count(), ()))
      println(f"[s15] rep $rep: init $ti%.2f s, delta $td%.2f s, " +
        f"drive $tp%.2f s, total ${ti + td + tp}%.2f s ($n pairs)")
    }
    spark.stop()
  }
}
