package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.VersionedTable

/** MANUAL perf probe (not part of `sbt test`): manifest-protocol
  * driver costs at high version/file counts — the round-10 verdict's
  * re-queued item 2/8. Run with
  * `sbt "Test/runMain graft.ManifestScaleProbe [versions] [hiveParts]"`
  * (defaults 1000 / 50). Results are recorded in SURVEY §8.
  *
  * What it measures, at version-count checkpoints while appending:
  *  - commit latency (manifest CAS + sidecar write) — should be flat
  *    in version count
  *  - currentSnapshot (manifest listing + one read) — flat-ish
  *    (listing is O(V) names but one RPC locally)
  *  - DSv2 scan build + a filtered count over the snapshot — O(live
  *    dirs) sidecar reads, NOT O(versions)
  *  - history — O(V) manifest reads of O(entries) each (the one
  *    deliberately linear-in-V audit call)
  *  - a stats-pruned DELETE whose condition touches nothing —
  *    pure sidecar classification cost over all live dirs
  * Then a hive-partitioned snapshot with `hiveParts` partition dirs
  * per commit: scan build resolves leaves from ONE sidecar per data
  * dir (vs a recursive listStatus walk per partition dir before).
  */
object ManifestScaleProbe {
  private def ms[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val nVersions = args.lift(0).map(_.toInt).getOrElse(1000)
    val hiveParts = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_scaleprobe").toString
    val flat = s"$base/flat"

    // ---- flat table: one tiny file per commit, nVersions commits ----
    val checkpoints = Set(nVersions / 10, nVersions / 3, nVersions)
    var lastTen = List.empty[Double]
    (1 to nVersions).foreach { i =>
      // compactAfter=MaxValue: the default (16) auto-compacts and
      // BOUNDS live-dir count by design — here we deliberately stress
      // the unbounded worst case the verdict asked about.
      val (_, t) = ms(VersionedTable.commitDelta(spark, flat, "parquet",
        Seq((i.toLong, s"row$i")).toDF("id", "payload").coalesce(1),
        compactAfter = Int.MaxValue))
      lastTen = (t :: lastTen).take(10)
      if (checkpoints(i)) {
        val (_, tSnap) = ms(VersionedTable.currentSnapshot(spark, flat))
        val (_, tScan) = ms {
          spark.read.format("graft").load(flat).where(col("id") === i.toLong).count()
        }
        val (h, tHist) = ms(VersionedTable.history(spark, flat))
        val (_, tDel) = ms(VersionedTable.commitDelete(spark, flat, "id = -1"))
        println(f"FLAT v=$i%5d commit_ms=${lastTen.sum / lastTen.size}%8.1f " +
          f"snapshot_ms=$tSnap%7.1f scan_count_ms=$tScan%8.1f " +
          f"history_ms=$tHist%8.1f (${h.size} versions) noop_delete_ms=$tDel%8.1f")
      }
    }

    // ---- hive table: hiveParts partition dirs per commit, 20 commits ----
    val hive = s"$base/hive"
    (1 to 20).foreach { c =>
      VersionedTable.commitDelta(spark, hive, "parquet",
        spark.range(hiveParts).select(
          (col("id") + c * 10000).as("id"), (col("id") % hiveParts).as("p"))
          .repartition(4), partitionBy = Seq("p"), compactAfter = Int.MaxValue)
    }
    val v = VersionedTable.currentSnapshot(spark, hive).get.version
    val ((files, partCols), tResolve) =
      ms(VersionedTable.snapshotFilesPartitioned(spark, hive, v))
    val (_, tHiveScan) = ms {
      spark.read.format("graft").load(hive).where(col("p") === 3).count()
    }
    println(f"HIVE dirs=20x$hiveParts leaves=${files.size} partCols=$partCols " +
      f"resolve_ms=$tResolve%8.1f scan_count_ms=$tHiveScan%8.1f")
    spark.stop()
  }
}
