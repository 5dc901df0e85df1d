package graft

import graft.sources.{DeltaRead, DeltaWrite}

/** Round-17 probe: what does row-tracking stamping
  * ([[DeltaWrite]]'s stampRowTracking at every publish) cost at
  * commit-count scale? Two 60-append runs into fresh tables — one
  * plain, one with delta.enableRowTracking=true — per-commit wall in
  * 20-commit buckets. The stamp is one JSON parse of the commit's own
  * content plus a domain line append (O(commit actions), no table
  * scan); on NON-tracking tables the cost is one `contains` string
  * probe. If the tracked buckets match the plain buckets within the
  * usual replay-growth noise, the stamping is in the noise (SURVEY §8
  * records the numbers).
  */
class Scratch20 extends SparkSpec {
  import spark.implicits._

  private def run(root: String, track: Boolean): Seq[Double] = {
    DeltaWrite.append(spark, Seq((0L, "seed")).toDF("id", "v").coalesce(1), root)
    if (track)
      DeltaWrite.setProperties(spark, root, Map("delta.enableRowTracking" -> "true"))
    val buckets = scala.collection.mutable.ArrayBuffer.empty[Double]
    var t0 = System.nanoTime()
    for (i <- 1 to 60) {
      DeltaWrite.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), root)
      if (i % 20 == 0) {
        buckets += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
      }
    }
    buckets.toSeq
  }

  test("row-tracking stamp overhead at commit-count scale") {
    val plainRoot = java.nio.file.Files.createTempDirectory("graft_rt_plain").toString + "/t"
    val trackRoot = java.nio.file.Files.createTempDirectory("graft_rt_track").toString + "/t"
    // plain FIRST so JVM warm-state favors neither... actually it
    // favors the tracked run — a tracked-slower result is then real
    val plain = run(plainRoot, track = false)
    val tracked = run(trackRoot, track = true)
    println(f"SCRATCH20 plain   buckets of 20: ${plain.map(b => f"$b%.2f").mkString(", ")} s")
    println(f"SCRATCH20 tracked buckets of 20: ${tracked.map(b => f"$b%.2f").mkString(", ")} s")
    // correctness ride-along: 61 single-row commits → ids 0..60, hwm 60
    val s = DeltaRead.snapshot(spark, trackRoot)
    assert(s.files.size == 61 && s.rowIds.size == 61)
    val ids = DeltaRead.readWithRowIds(spark, trackRoot)
      .select(org.apache.spark.sql.functions.col("_row_id"))
      .as[Long].collect().sorted
    assert(ids.toSeq == (0L to 60L), s"ids must be the dense range: ${ids.take(5).toSeq}…")
  }
}
