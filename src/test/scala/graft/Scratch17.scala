package graft

import org.apache.spark.sql.functions._

/** Round-16 probe: is q32's bench cost (2.25 s r15 → 2.47 s r16, after
  * a +0.21 s r14→r15 step the verdict said to watch) code drift or VM
  * noise? Runs the exact q32 body 4× in one JVM at sf0.1 and prints
  * each wall time — a real regression shows in EVERY run; warm-state /
  * ambient-load noise shows as spread. (No code in the q32 path has
  * changed since r13.)
  */
class Scratch17 extends SparkSpec {

  test("q32 isolated wall times at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir + "/documents.parquet").exists)
    val q = SparkEntry.queries("q32_ngram_jaccard")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH17 run$i: $sec%.2f s ($n pairs)")
    }
  }
}
