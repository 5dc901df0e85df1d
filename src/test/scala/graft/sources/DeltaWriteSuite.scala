package graft.sources

import graft.SparkSpec
import graft.pipeline.{Append, MergeUpsert, Overwrite, OverwritePartition, OverwriteWhere, SinkSpec, Writer}
import org.apache.spark.sql.functions._

/** Native Delta writer: log-protocol commits round-tripped through
  * graft's own reader (the only Delta client in this container —
  * DeltaReadSuite pins that reader against hand-crafted
  * PROTOCOL.md-shaped logs, so agreement with it IS protocol
  * conformance here). Covers create/append/overwrite/dynamic
  * partition overwrite, time travel across writes, schema guards,
  * metaData id carry-through, hive-escaped partition values,
  * concurrent-writer serialization, and the Writer merge-mode
  * composition.
  */
class DeltaWriteSuite extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_deltaw").toString + "/t"

  test("create + append + overwrite round-trip with time travel") {
    val root = tmp()
    val v0 = DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    assert(v0 == 0L)
    val v1 = DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    assert(v1 == 1L)
    assert(DeltaRead.read(spark, root).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // overwrite drops the old files from the snapshot...
    val v2 = DeltaWrite.overwrite(spark, Seq((9L, "z")).toDF("id", "v"), root)
    assert(v2 == 2L)
    assert(DeltaRead.read(spark, root).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    // ...but time travel still reads them (remove != delete)
    assert(DeltaRead.read(spark, root, Some(1L)).count() == 3)
    assert(DeltaRead.versions(spark, root) == Seq(0L, 1L, 2L))
  }

  test("append realigns column order and refuses schema drift") {
    val root = tmp()
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    // reordered columns land correctly by name
    DeltaWrite.append(spark, Seq(("b", 2L)).toDF("v", "id"), root)
    assert(DeltaRead.read(spark, root).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    val extra = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((3L, "c", true)).toDF("id", "v", "flag"), root)
    }
    assert(extra.getMessage.contains("extra: [flag]"))
    val typed = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq(("3", "c")).toDF("id", "v"), root)
    }
    assert(typed.getMessage.contains("type mismatch"))
  }

  test("schema-changing overwrite re-emits metaData carrying the table id") {
    val root = tmp()
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val id0 = DeltaRead.snapshot(spark, root).metaId
    assert(id0 != null)
    DeltaWrite.overwrite(spark, Seq((1L, "a", 0.5)).toDF("id", "v", "score"), root)
    val snap = DeltaRead.snapshot(spark, root)
    assert(snap.metaId == id0)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(DeltaRead.read(spark, root).columns.toSeq == Seq("id", "v", "score"))
  }

  test("partitioned writes: values from the log, hive escapes, pruning-capable plan") {
    val root = tmp()
    // ':' and ' ' force hive escaping in the dir name; the log must
    // carry the RAW value and the encoded path must decode to disk
    val df = Seq((1L, "a:x", 10.0), (2L, "b y", 20.0), (3L, "a:x", 30.0))
      .toDF("id", "grp", "x")
    DeltaWrite.append(spark, df, root, partitionBy = Seq("grp"))
    val snap = DeltaRead.snapshot(spark, root)
    assert(snap.partitionColumns == Seq("grp"))
    assert(snap.files.values.map(_("grp")).toSet == Set("a:x", "b y"))
    val back = DeltaRead.read(spark, root)
    assert(back.orderBy("id").select("id", "grp", "x").as[(Long, String, Double)]
      .collect().toSeq == Seq((1L, "a:x", 10.0), (2L, "b y", 20.0), (3L, "a:x", 30.0)))
    // every add carried a size -> the log-planned ManifestFileIndex
    // scan (one native scan, partition pruning) must be in play
    assert(snap.sizes.values.forall(_ > 0))
    val plan = back.where($"grp" === "a:x").queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"expected one log-planned scan, got:\n$plan")
    // appends inherit the table's layout; a conflicting request refuses
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, df, root, partitionBy = Seq("id"))
    }
    assert(e.getMessage.contains("partitioned by"))
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val root = tmp()
    DeltaWrite.append(spark,
      Seq((1L, "p1", "base"), (2L, "p2", "base"), (3L, "p3", "base"))
        .toDF("id", "grp", "src"),
      root, partitionBy = Seq("grp"))
    val before = DeltaRead.snapshot(spark, root)
    DeltaWrite.overwritePartitions(spark,
      Seq((20L, "p2", "new")).toDF("id", "grp", "src"), root, Seq("grp"))
    val after = DeltaRead.snapshot(spark, root)
    // p1/p3 files carried over untouched (same physical files)
    val keep = before.files.collect { case (p, pv) if pv("grp") != "p2" => p }.toSet
    assert(keep.subsetOf(after.files.keySet))
    assert(DeltaRead.read(spark, root).orderBy("id")
      .select("id", "grp", "src").as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "p1", "base"), (3L, "p3", "base"), (20L, "p2", "new")))
  }

  test("concurrent appenders serialize through the log CAS — both commits land") {
    val root = tmp()
    DeltaWrite.append(spark, Seq((0L, "seed")).toDF("id", "v"), root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            DeltaWrite.append(spark, Seq((i.toLong, s"w$i")).toDF("id", "v"), root)
        })
      }
      val versions = futures.map(_.get()).sorted
      assert(versions == Seq(1L, 2L, 3L, 4L), s"got $versions")
    } finally pool.shutdown()
    assert(DeltaRead.read(spark, root).count() == 5)
    assert(DeltaRead.read(spark, root).agg(sum("id")).as[Long].head() == 10L)
  }

  test("Writer sink composition: upsert and replaceWhere on a delta path") {
    val root = tmp()
    val base = Seq(("k1", 1L, "old"), ("k2", 2L, "old")).toDF("hash_key", "n", "src")
    Writer.write(spark, base, SinkSpec(root, format = "delta", mode = Append))
    val up = Seq(("k2", 20L, "new"), ("k3", 30L, "new")).toDF("hash_key", "n", "src")
    Writer.write(spark, up, SinkSpec(root, format = "delta", mode = MergeUpsert))
    assert(DeltaRead.read(spark, root).orderBy("hash_key")
      .select("hash_key", "n", "src").as[(String, Long, String)].collect().toSeq ==
      Seq(("k1", 1L, "old"), ("k2", 20L, "new"), ("k3", 30L, "new")))
    Writer.write(spark, Seq(("k1", 100L, "rw")).toDF("hash_key", "n", "src"),
      SinkSpec(root, format = "delta", mode = OverwriteWhere("hash_key = 'k1'")))
    assert(DeltaRead.read(spark, root).orderBy("hash_key")
      .select("hash_key", "n").as[(String, Long)].collect().toSeq ==
      Seq(("k1", 100L), ("k2", 20L), ("k3", 30L)))
    // guards: delta+versioned and delta catalog tables refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      Writer.write(spark, base, SinkSpec(root, format = "delta", versioned = true))
    }
    assert(e1.getMessage.contains("already versioned by its transaction log"))
    val e2 = intercept[IllegalArgumentException] {
      Writer.write(spark, base, SinkSpec(root, format = "delta", table = Some("t")))
    }
    assert(e2.getMessage.contains("delta-spark"))
  }

  test("encodePath is the exact inverse of the reader's URI decode") {
    val names = Seq("part-00000-abc.snappy.parquet", "grp=a%3Ax/f.parquet",
      "dir name/with space.parquet", "uni-é中.parquet", "p=%25lit/f.parquet")
    names.foreach { n =>
      val enc = DeltaWrite.encodePath(n)
      assert(new java.net.URI(enc).getPath == n, s"round-trip failed for '$n' -> '$enc'")
    }
  }
}
