package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VersionedTable

/** Round-9 scale probe: the pruned mutation commits at 10M rows.
  *
  * (1) PARTITION OVERWRITE — a 10M-row table hive-partitioned into 64
  *     `p=<n>` leaves; overwrite ONE partition's rows through
  *     commitPartitionOverwrite vs the round-8 anti-join full rewrite.
  *     The claim: 63 leaves carry over as partition-subtree refs (zero
  *     data I/O — counted from the manifest) and the wall tracks the
  *     source, not the table.
  *
  * (2) OVERWRITE WHERE — the same table committed as 64 range-clustered
  *     flat files; replace a 1/64 key span through commitOverwriteWhere
  *     vs the full-rewrite path. The claim: ~63 files carry by
  *     reference and the wall tracks the touched span.
  *
  * Timings are min-of-2 on a shared VM; counts are exact.
  */
object Scratch8 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val parts = 64
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    def rows = spark.range(n).select(col("id").as("k"),
      (col("id") % parts).as("p"),
      concat(lit("payload-"), col("id")).as("v"))

    // ---- (1) partition overwrite
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft_s8a").toString + "/t"
      val (_, buildS) = timed {
        VersionedTable.commit(spark, root, "parquet", _ => rows, partitionBy = Seq("p"))
      }
      println(f"PO BUILD: $n rows across $parts hive leaves in $buildS%.2f s")
      val src = rows.where(col("p") === 7).withColumn("v", lit("replaced"))
      val (_, prunedS) = timed {
        VersionedTable.commitPartitionOverwrite(spark, root, "parquet", src, Seq("p"))
      }
      val snap = VersionedTable.currentSnapshot(spark, root).get
      val refs = snap.dataDirs.count(e => e.contains("/") && e.split('/').last.contains('='))
      println(f"PO PRUNED: $prunedS%.2f s, $refs partition refs carried + " +
        s"${snap.dataDirs.length - refs} new dir(s)")
      // round-8 shape: anti-join + full rewrite through commit()
      val (_, fullS) = timed {
        VersionedTable.commit(spark, root, "parquet", {
          case Some(b) => b.where(col("p") =!= 7)
            .unionByName(src, allowMissingColumns = true)
          case None => src
        }, partitionBy = Seq("p"), commitKind = "merge")
      }
      println(f"PO FULL-REWRITE: $fullS%.2f s (ratio ${fullS / prunedS}%.1fx)")
      val cnt = VersionedTable.read(spark, root).where(col("v") === "replaced").count()
      println(s"PO CHECK: ${cnt} replaced rows (expect ${n / parts})")
    }

    // ---- (2) overwrite where on a range-clustered flat layout
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft_s8b").toString + "/t"
      val (_, buildS) = timed {
        VersionedTable.commit(spark, root, "parquet",
          _ => rows.repartitionByRange(parts, col("k")).sortWithinPartitions("k"))
      }
      println(f"OW BUILD: $n rows as $parts range-clustered files in $buildS%.2f s")
      val span = n / parts
      val src = spark.range(span).select(col("id").as("k"), (col("id") % parts).as("p"),
        lit("backfill").as("v"))
      val (_, prunedS) = timed {
        VersionedTable.commitOverwriteWhere(spark, root, "parquet", src, s"k < $span")
      }
      val snap = VersionedTable.currentSnapshot(spark, root).get
      val refs = snap.dataDirs.count(_.contains("/"))
      println(f"OW PRUNED: $prunedS%.2f s, $refs file refs carried + " +
        s"${snap.dataDirs.length - refs} new dir(s)")
      val (_, fullS) = timed {
        VersionedTable.commit(spark, root, "parquet", {
          case Some(b) => b.where(s"NOT (k < $span)")
            .unionByName(src.where(s"k < $span"), allowMissingColumns = true)
          case None => src
        }, commitKind = "merge")
      }
      println(f"OW FULL-REWRITE: $fullS%.2f s (ratio ${fullS / prunedS}%.1fx)")
      val cnt = VersionedTable.read(spark, root).where(col("v") === "backfill").count()
      println(s"OW CHECK: ${cnt} backfilled rows (expect $span)")
    }

    spark.stop()
  }
}
