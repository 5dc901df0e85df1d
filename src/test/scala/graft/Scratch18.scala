package graft

import graft.sources.{DeltaRead, DeltaWrite}

/** Round-16 probe: what does the `<v>.crc` version-checksum sidecar
  * (written at every commit publish since r16) cost at commit-count
  * scale? 60 appends into one table; per-commit wall time printed in
  * 20-commit buckets, plus the post-run snapshot() latency (which now
  * also validates the head crc). The checksum work per commit is one
  * driver-side JSON parse of the commit's own content, map folds over
  * the pre-commit snapshot (driver memory), and ONE extra small-file
  * CAS publish — if the probe shows bucket times tracking the usual
  * slow log-replay growth rather than a constant jump, the crc
  * machinery is in the noise (SURVEY §8 records the numbers).
  */
class Scratch18 extends SparkSpec {
  import spark.implicits._

  test("crc write overhead at commit-count scale") {
    val root = java.nio.file.Files.createTempDirectory("graft_crc_scale").toString + "/t"
    val buckets = scala.collection.mutable.ArrayBuffer.empty[Double]
    var t0 = System.nanoTime()
    for (i <- 1 to 60) {
      DeltaWrite.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), root)
      if (i % 20 == 0) {
        buckets += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
      }
    }
    println(f"SCRATCH18 commit buckets of 20: ${buckets.map(b => f"$b%.2f").mkString(", ")} s")
    val logDir = new java.io.File(root, "_delta_log")
    val crcs = logDir.list().count(_.matches("""\d{20}\.crc"""))
    println(s"SCRATCH18 crc sidecars present: $crcs / 60 commits")
    assert(crcs == 60, "every commit publish must have written its checksum")
    val s0 = System.nanoTime()
    val snap = DeltaRead.snapshot(spark, root)
    println(f"SCRATCH18 snapshot+validate: ${(System.nanoTime() - s0) / 1e9}%.3f s " +
      s"(files=${snap.files.size})")
    assert(snap.files.size == 60)
  }
}
