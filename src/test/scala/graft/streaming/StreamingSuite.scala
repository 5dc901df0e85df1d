package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSuite extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("tumbling stats over a memory stream honors windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      EventStreams.Ev(2, ts("2024-01-01 10:55:00"), 1, "click", 2.0),
      EventStreams.Ev(3, ts("2024-01-01 11:05:00"), 2, "view", 5.0))
    val q = EventStreams.tumblingStats(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tumbling_out").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString, r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
      assert(rows(("2024-01-01 10:00:00.0", "click")) == 2)
      assert(rows(("2024-01-01 11:00:00.0", "view")) == 1)
    } finally q.stop()
  }

  test("streaming windowed top-k: sketch counts per window, exact in small-domain regime") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      EventStreams.Ev(2, ts("2024-01-01 10:10:00"), 2, "click", 1.0),
      EventStreams.Ev(3, ts("2024-01-01 10:15:00"), 3, "view", 1.0),
      EventStreams.Ev(4, ts("2024-01-01 11:05:00"), 1, "view", 1.0),
      EventStreams.Ev(5, ts("2024-01-01 11:06:00"), 1, "view", 1.0))
    val q = EventStreams.windowedTopK(mem.toDF(), capacity = 8)
      .writeStream.format("memory").queryName("topk_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("topk_out").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
          r.getAs[String]("item")) -> r.getAs[Long]("cnt")).toMap
      assert(rows(("2024-01-01 10:00:00.0", "click")) == 2)
      assert(rows(("2024-01-01 10:00:00.0", "view")) == 1)
      assert(rows(("2024-01-01 11:00:00.0", "view")) == 2)
      // distinct <= capacity: every count exact, so err is absent risk
      assert(spark.table("topk_out").where("err != 0").count() == 0)
    } finally q.stop()
  }

  test("windowed distinct users via the streaming HLL sketch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      EventStreams.Ev(2, ts("2024-01-01 10:10:00"), 2, "click", 1.0),
      EventStreams.Ev(3, ts("2024-01-01 10:15:00"), 1, "view", 1.0), // repeat user 1
      EventStreams.Ev(4, ts("2024-01-01 11:05:00"), 3, "view", 1.0))
    val q = EventStreams.windowedDistinct(mem.toDF())
      .writeStream.format("memory").queryName("ndv_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // a second batch: new user in window 1 must merge into the sketch
      mem.addData(EventStreams.Ev(5, ts("2024-01-01 10:20:00"), 4, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ndv_out").collect()
        .map(r => r.getAs[java.sql.Timestamp]("window_start").toString ->
          ((r.getAs[Long]("ndv"), r.getAs[Long]("n_events")))).toMap
      // HLL exact at tiny cardinality: users {1,2,4} in 10:00, {3} in 11:00
      assert(rows("2024-01-01 10:00:00.0") == ((3L, 4L)), s"got $rows")
      assert(rows("2024-01-01 11:00:00.0") == ((1L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStreams.Ev(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0),
      EventStreams.Ev(2, ts("2024-01-01 10:00:02"), 1, "view", 2.0))
    val q = EventStreams.dedupByKey(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streaming curation: quality/lang gate + fingerprint dedup within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val en = "the cat and the dog is in the house with that other dog near the door again today"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    mem.addData(
      (1L, en, ts("2024-01-01 10:00:00")),
      (2L, en.toUpperCase, ts("2024-01-01 10:00:05")), // normalized dup of 1
      (3L, "too short", ts("2024-01-01 10:00:10")),    // fails token gate
      (4L, en + " plus distinct tail words", ts("2024-01-01 10:00:15")))
    val q = EventStreams.curateDocs(
        mem.toDF().toDF("doc_id", "text", "ts"), minTokens = 10)
      .writeStream.format("memory").queryName("curate_stream_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("curate_stream_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 4L))
    } finally q.stop()
  }

  test("upsert sink merges micro-batches by hash_key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val dir = java.nio.file.Files.createTempDirectory("upsert_sink").toString
    val stream = mem.toDF().withColumn("hash_key", xxhash64(col("event_id")))
    val q = EventStreams.upsertSink(stream, s"$dir/target", s"$dir/ckpt")
    try {
      mem.addData(
        EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        EventStreams.Ev(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(
        EventStreams.Ev(1, ts("2024-01-01 10:02:00"), 1, "click", 9.0), // key 1 updated
        EventStreams.Ev(3, ts("2024-01-01 10:03:00"), 2, "click", 3.0)) // new key
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/target").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
      assert(out == Map(1L -> 9.0, 2L -> 2.0, 3L -> 3.0))
    } finally q.stop()
  }

  test("versioned upsert sink: micro-batches land as manifest commits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val dir = java.nio.file.Files.createTempDirectory("upsert_vsink").toString
    val stream = mem.toDF().withColumn("hash_key", xxhash64(col("event_id")))
    val q = EventStreams.upsertSink(stream, s"$dir/target", s"$dir/ckpt", versioned = true)
    try {
      mem.addData(
        EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        EventStreams.Ev(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(
        EventStreams.Ev(1, ts("2024-01-01 10:02:00"), 1, "click", 9.0))
      q.processAllAvailable()
      import graft.pipeline.VersionedTable
      val snap = VersionedTable.currentSnapshot(spark, s"$dir/target").get
      assert(snap.version == 2L) // one manifest commit per micro-batch
      val out = VersionedTable.read(spark, s"$dir/target").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
      assert(out == Map(1L -> 9.0, 2L -> 2.0))
      // the pre-merge snapshot is still readable (time travel)
      assert(VersionedTable.readVersion(spark, s"$dir/target", 1L).count() == 2L)
    } finally q.stop()
  }

  test("stream-static enrich: dimension columns appear, stream rows preserved") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStreams.Ev(2, ts("2024-01-01 10:01:00"), 9, "view", 2.0)) // no dim row
    val q = EventStreams.enrich(mem.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(rows(1L).contains("gold"))
      assert(rows(2L).isEmpty)
    } finally q.stop()
  }

  test("dedup against a durable fingerprint store spans query restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fp_store").toString
    val text = "a sufficiently long body of document text for fingerprinting"
    def run(data: Seq[(Long, String, java.sql.Timestamp)], ckpt: String): Unit = {
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      mem.addData(data: _*)
      val q = EventStreams.dedupAgainstStore(
        mem.toDF().toDF("doc_id", "text", "ts"),
        s"$dir/store", s"$dir/out", s"$dir/$ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    // run 1: doc 1 + an in-batch duplicate (keep min id)
    run(Seq((1L, text, ts("2024-01-01 10:00:00")),
      (2L, text, ts("2024-01-01 10:00:01")),
      (3L, text + " distinct", ts("2024-01-01 10:00:02"))), "ck1")
    // run 2 (NEW query, new checkpoint — far outside any watermark):
    // the re-crawl of doc 1's text must be dropped by the store
    run(Seq((9L, text, ts("2024-06-01 10:00:00")),
      (10L, text + " brand new", ts("2024-06-01 10:00:01"))), "ck2")
    val ids = spark.read.parquet(s"$dir/out").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L, 3L, 10L), s"expected cross-run dedup, got $ids")
  }

  test("stream-stream interval join: funnel pairs within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0),    // first
      EventStreams.Ev(2, ts("2024-01-01 10:20:00"), 1, "purchase", 0), // within 30m → pair
      EventStreams.Ev(3, ts("2024-01-01 10:00:00"), 2, "click", 0),    // first
      EventStreams.Ev(4, ts("2024-01-01 11:00:00"), 2, "purchase", 0), // outside 30m
      EventStreams.Ev(5, ts("2024-01-01 10:10:00"), 3, "purchase", 0)) // no preceding click
    val q = EventStreams.followedWithin(mem.toDF(), "click", "purchase")
      .writeStream.format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_out").collect()
        .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("then_id"))).toSet
      assert(got == Set((1L, 2L)), s"expected only the in-window funnel pair, got $got")
    } finally q.stop()
  }

  test("same-type funnel does not self-pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 1, "purchase", 0),
      EventStreams.Ev(2, ts("2024-01-01 10:10:00"), 1, "purchase", 0)) // repeat within 30m
    val q = EventStreams.followedWithin(mem.toDF(), "purchase", "purchase")
      .writeStream.format("memory").queryName("repeat_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("repeat_out").collect()
        .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("then_id"))).toSet
      assert(got == Set((1L, 2L)), s"self-pairs must be excluded, got $got")
    } finally q.stop()
  }

  test("streaming near-dup: planted dups pair across micro-batches, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles carry heavy wooden crates across the old stone bridge " +
      "under a pale winter moon toward the distant harbor lights"
    val other = "completely different subject matter entirely about numeric " +
      "linear algebra kernels and cache oblivious matrix layouts on modern " +
      "vector hardware with wide registers and deep pipelines throughout"
    val third = "yet another unrelated passage describing rainfall patterns " +
      "across coastal basins and the seasonal migration of shore birds over " +
      "tidal flats near the estuary mouth during early autumn weeks"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val bands = 16
    val pairs = StreamingDedup.nearDupPairs(
      mem.toDF().toDF("doc_id", "text", "ts"), bands = bands, watermark = "1 hour")
    val q = pairs.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      // batch 1: the original + an unrelated doc
      mem.addData((1L, base, ts("2024-01-01 10:00:00")), (10L, other, ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      // batch 2: a near-dup of doc 1 arrives in a LATER micro-batch —
      // only bucket state can pair it with doc 1
      mem.addData((2L, base, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // batch 3: far-future unrelated doc advances the watermark past
      // every earlier member (1h delay → horizon 11:30)
      mem.addData((11L, third, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      // batch 4: another copy of doc 1's text — its former bucket
      // members are evicted, so NO pair may surface
      mem.addData((3L, base, ts("2024-01-01 12:31:00")))
      q.processAllAvailable()

      val got = spark.table("neardup_out").collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).distinct
      assert(got.toSet == Set((1L, 2L)), s"expected exactly the planted pair, got ${got.toSet}")
      assert(spark.table("neardup_out").collect().forall(_.getAs[Double]("est") >= 0.8))
      // bounded state: only the two live docs' buckets remain (≤ bands
      // rows each; evicted/timed-out buckets are gone)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3L * bands, s"state not bounded: $stateRows rows")
    } finally q.stop()
  }

  test("streaming near-dup rejects a zero watermark delay up front") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    // a 0-delay watermark would make the event-time timeout equal the
    // watermark inside the state function — Spark throws there, deep in
    // a task; the operator must fail at construction instead
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.nearDupPairs(
        mem.toDF().toDF("doc_id", "text", "ts"), watermark = "0 seconds")
    }
    assert(e.getMessage.contains("watermark"))
  }

  test("stateful sessionize assigns increasing session ids per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    mem.addData(
      EventStreams.Ev(1, ts("2024-01-01 10:00:00"), 7, "a", 0),
      EventStreams.Ev(2, ts("2024-01-01 10:10:00"), 7, "a", 0),
      EventStreams.Ev(3, ts("2024-01-01 12:00:00"), 7, "a", 0))
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val m = spark.table("sess_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Int]("session_seq")).toMap
      assert(m(1L) == 1 && m(2L) == 1 && m(3L) == 2)
    } finally q.stop()
  }

  test("rollupBatch replay recognizes pre-SHA-256 legacy checkpoint tags") {
    import spark.implicits._
    import graft.pipeline.{MaterializedAgg, VersionedTable}
    val base = java.nio.file.Files.createTempDirectory("graft_legacy_tag").toString
    val src = base + "/src"; val agg = base + "/agg"
    val checkpointDir = base + "/ckpt"
    val groups = Seq("g")
    val aggs = Seq(MaterializedAgg.MAgg("n", "", "count"))
    val batch = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    // batch 0 committed by a pre-upgrade stream: tag uses String.hashCode
    val legacy = s"stream-${Integer.toHexString(checkpointDir.hashCode)}"
    EventStreams.rollupBatch(batch, 0L, src, agg, groups, aggs, tagPrefix = legacy)
    assert(VersionedTable.read(spark, src).count() == 2L)
    // post-upgrade replay of the SAME batch: new SHA-256 prefix misses,
    // the legacy fallback must catch it — no second append
    val sha = "stream-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpointDir.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
    EventStreams.rollupBatch(batch, 0L, src, agg, groups, aggs,
      tagPrefix = sha, legacyTagPrefix = Some(legacy))
    assert(VersionedTable.read(spark, src).count() == 2L,
      "legacy-tagged batch was appended a second time after the prefix upgrade")
    // a genuinely NEW batch under the new prefix still lands
    EventStreams.rollupBatch(Seq(("c", 3L)).toDF("g", "v"), 1L, src, agg,
      groups, aggs, tagPrefix = sha, legacyTagPrefix = Some(legacy))
    assert(VersionedTable.read(spark, src).count() == 3L)
  }

  test("rollupSink consults the legacy namespace on the FIRST batch of a run only") {
    import spark.implicits._
    import graft.pipeline.{MaterializedAgg, VersionedTable}
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_legacy_gate").toString
    val src = base + "/src"; val agg = base + "/agg"
    val checkpointDir = base + "/ckpt"
    val groups = Seq("g"); val aggs = Seq(MaterializedAgg.MAgg("n", "", "count"))
    // PLANT a legacy-namespace tag for batch 1 (the 32-bit collision
    // scenario: some other checkpoint path hashing to the same prefix
    // committed its own batch 1). The SHA-256 switch exists so this
    // cannot suppress OUR batch 1 — only the first batch of a resumed
    // run may consult the legacy namespace.
    val legacy = s"stream-${Integer.toHexString(checkpointDir.hashCode)}"
    VersionedTable.commitDelta(spark, src, "parquet",
      Seq(("planted", 99L)).toDF("g", "v"), tag = Some(s"$legacy-batch-1"))
    val mem = MemoryStream[(String, Long)]
    val q = EventStreams.rollupSink(mem.toDF().toDF("g", "v"), src, agg,
      checkpointDir, groups, aggs)
    try {
      mem.addData(("a", 1L)); q.processAllAvailable() // batch 0: legacy consulted, no hit
      mem.addData(("b", 2L)); q.processAllAvailable() // batch 1: legacy MUST be ignored
      val gs = VersionedTable.read(spark, src).collect().map(_.getString(0)).toSet
      assert(gs("a"), "first batch must land")
      assert(gs("b"),
        "batch 1 was suppressed by a planted legacy tag — the legacy namespace " +
          "must only be consulted for the first batch of a run")
    } finally q.stop()
  }
}

/** Cross-task probe counters for the codec-lifecycle test (local mode:
  * executor threads share this JVM, so statics observe them).
  */
object CodecProbe {
  val open = new java.util.concurrent.atomic.AtomicInteger(0)
  val close = new java.util.concurrent.atomic.AtomicInteger(0)
}

class MultimodalSuite extends SparkSpec {

  test("decode stub: deterministic features, bytes pruned from output") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val a = Multimodal.decodeStub(assets, dim = 8)
    val b = Multimodal.decodeStub(assets, dim = 8)
    assert(!a.columns.contains("bytes"))
    val fa = a.orderBy("asset_id").collect().map(r => r.getSeq[Float](r.fieldIndex("features")).toList)
    val fb = b.orderBy("asset_id").collect().map(r => r.getSeq[Float](r.fieldIndex("features")).toList)
    assert(fa.zip(fb).forall { case (x, y) => x == y })
    assert(fa.forall(_.length == 8))
  }

  test("a custom Codec plugs into the same pipeline: lifecycle runs, output schema fixed") {
    // a stand-in for a real JNI decoder: constant features + a
    // partition-lifecycle counter proving open/close bracket the batch
    val codec = new Multimodal.Codec {
      val dim = 4
      def decode(modality: String, bytes: Array[Byte]): Array[Float] = {
        require(CodecProbe.open.get() > 0, "decode ran before open()")
        Array.fill(4)(if (modality == "video") 1f else 0.5f)
      }
      override def open(): Unit = CodecProbe.open.incrementAndGet()
      override def close(): Unit = CodecProbe.close.incrementAndGet()
    }
    CodecProbe.open.set(0); CodecProbe.close.set(0)
    val out = Multimodal.decode(Multimodal.syntheticAssets(spark, 30), codec)
      .orderBy("asset_id").collect()
    assert(out.forall(_.getSeq[Float](3).length == 4))
    assert(out.filter(_.getAs[String]("modality") == "video")
      .forall(_.getSeq[Float](3).forall(_ == 1f)))
    assert(CodecProbe.open.get() > 0, "open() never ran")
    assert(CodecProbe.close.get() == CodecProbe.open.get(),
      s"codec context leak: ${CodecProbe.open.get()} opens, ${CodecProbe.close.get()} closes")
    // a codec lying about its dim fails loudly, not with silent schema drift
    val bad = new Multimodal.Codec {
      val dim = 4
      def decode(m: String, b: Array[Byte]): Array[Float] = Array.fill(3)(0f)
    }
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decode(Multimodal.syntheticAssets(spark, 5), bad).collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("declared dim"))))
  }

  test("resize plan caps the long side, preserves aspect") {
    val out = Multimodal.resizePlan(Multimodal.syntheticAssets(spark, 10), 256).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("target_width") <= 256 || r.getAs[Int]("target_height") <= 256)
      assert(math.max(r.getAs[Int]("target_width"), r.getAs[Int]("target_height")) <= 256)
    }
  }

  test("content dedup: identical blobs collapse to one keeper") {
    import spark.implicits._
    val a = Multimodal.syntheticAssets(spark, 10)
    // duplicate asset 3's bytes under a new id
    val dup = a.where(col("asset_id") === 3).withColumn("asset_id", lit(99L))
    val out = Multimodal.dedupByContent(a.unionByName(dup)).collect()
    assert(out.length == 10) // 11 assets, one shared blob
    val dupRow = out.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dupRow.getAs[Long]("keeper_id") == 3L)
    // null-bytes assets share no content: they must not cluster
    val withNulls = a.unionByName(
      a.limit(3).withColumn("asset_id", col("asset_id") + 200)
        .withColumn("bytes", lit(null).cast("binary")))
    assert(Multimodal.dedupByContent(withNulls).collect()
      .forall(_.getAs[Long]("dup_count") == 1L))
  }

  test("feature near-dup flags byte-identical assets via the decode path") {
    val a = Multimodal.syntheticAssets(spark, 12)
    val dup = a.where(col("asset_id") === 5).withColumn("asset_id", lit(100L))
    val pairs = Multimodal.nearDupByFeatures(a.unionByName(dup), threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((5L, 100L)))
  }

  test("frame sampling: bounded rows per video") {
    val vids = Multimodal.syntheticAssets(spark, 9).where(col("modality") === "video")
    val frames = Multimodal.frameSamplePlan(vids, everyMs = 500)
    val n = frames.groupBy("asset_id").count().collect()
    assert(n.nonEmpty)
    n.foreach(r => assert(r.getAs[Long]("count") >= 1))
  }
}
