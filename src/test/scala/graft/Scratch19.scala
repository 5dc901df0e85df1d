package graft

/** Round-16 probe: q109_delta_checkpoint read 3.73 s in the morning
  * sf0.1 bench and 6.01 s in the closing one — was that the
  * always-present domainMetadata checkpoint column (one extra collect
  * job per fold/snapshot, fixed by dropping the column on domain-less
  * tables) or ambient load? 4 isolated runs at sf0.1 after the fix.
  */
class Scratch19 extends SparkSpec {
  test("q109 isolated wall times at sf0.1 (post column-drop fix)") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir + "/lineitem.parquet").exists)
    val q = SparkEntry.queries("q109_delta_checkpoint")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"SCRATCH19 run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
  }
}
