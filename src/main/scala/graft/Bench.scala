package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length, lit, max}
object Bench {
  /** Query → family, for the per-family sums in the artifact. Rounds
    * 14–16 each burned a Scratch probe adjudicating drift that a
    * family-level sum would have answered from the artifact alone
    * (e.g. "is the regression concentrated in commit-heavy delta
    * writes or scattered across pure compute?"). Rule order matters:
    * first match wins; anything TextQueries-owned that isn't dedup/
    * simsearch is "text"; the rest is "relational".
    */
  private[graft] def family(q: String): String = {
    def has(ss: String*) = ss.exists(q.contains)
    if (has("delta")) "delta"
    else if (has("versioned", "matview", "branch", "snapshot", "cdc",
      "merge", "overwrite", "scd2", "sql_writes", "sql_maintenance",
      "dsv2", "restore") || q == "q89_delete") "versioned"
    else if (has("dedup", "minhash", "simhash", "jaccard", "neardup",
      "curate", "span", "substring", "dupcheck", "decontaminate",
      "contamination", "chunk")) "dedup"
    else if (has("knn", "ann", "ivfpq", "lsh", "kmeans", "cluster",
      "multimodal", "shard", "leakage", "domain_mix")) "simsearch"
    else if (graft.queries.TextQueries.queries.contains(q)) "text"
    else "relational"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session outside any per-query timing (executor threads,
    // codegen compiler, parquet footers) so the first measured query
    // isn't charged for JVM startup. Stage timings show the whole
    // minhashLsh operator runs 2 s warm vs 13 s as the first measured
    // query — the delta is janino compilation + shuffle/broadcast
    // subsystem spin-up, so compile the heavy kernels here on a
    // 64-doc slice (sub-second) rather than let query #1 pay it.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      val d = Tables.load(spark, sfDir, "documents")
      // count() reads only footers — scan the text column for real so
      // the first text query isn't charged the cold column IO.
      d.select(max(length(col("text")))).collect()
      val d64 = d.limit(64)
      graft.operators.Dedup.minhashLsh(d64).count()
      graft.operators.TextAnalysis.repetitionSignals(d64).count()
      // round 17: the dedup/LSH family carried ±10 s of JVM warm-state
      // scatter ACROSS whole bench runs (§8 A/B — q95/q69/q32/q93/q96
      // moved together on identical code), and its kernels are the
      // heaviest codegen in the suite. Compile the exact-Jaccard
      // verify, the shingle/bucket pairing and the SimHash popcount
      // path here on the 64-doc slice so the measured queries start
      // from tier-compiled code, not cold interpreter profiles.
      val banded = d64.select(lit(0).as("band"), lit(0L).as("key"),
        col("doc_id").as("id"))
      graft.operators.Dedup.jaccardVerify(d64,
        graft.operators.Dedup.bucketPairs(banded, Seq("band", "key"), "id",
          maxBucket = 1 << 20), threshold = 0.7).count()
      graft.operators.Dedup.simhashPairsFrom(
        graft.operators.Dedup.simhashPortable(d64), maxHamming = 3,
        maxBucket = 1 << 20).count()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").head
      catch { case _: Throwable => "-1" }
    // LOAD GATE (round 15): BENCH_r14 was contention-inflated 1.5-3× on
    // its tail (q97 11.9 s artifact vs 4.1 s controlled re-run) because
    // the timed window opened on a VM at load1m ≈ 4. Ambient load is
    // measurable up front — spin-wait (bounded, so a busy driver can
    // never stall the round) until load1m drops under the gate before
    // opening the window, and record both the wait and the final
    // verdict in the artifact so a still-contended run is self-evident.
    val gateStart = System.currentTimeMillis()
    val gateLimit = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "2.0").toDouble
    val gateMaxWaitMs = 600000L
    var gated = false
    while ({
      val l = loadavg().toDouble
      l >= 0 && l > gateLimit &&
        System.currentTimeMillis() - gateStart < gateMaxWaitMs
    }) { gated = true; Thread.sleep(10000) }
    val gateWaitSec = (System.currentTimeMillis() - gateStart) / 1000.0
    val loadAtOpen = loadavg()
    // Cleanup runs OUTSIDE the timed window and BLOCKS until the blocks
    // are gone: with async unpersist inside the window (rounds ≤4), a
    // heavy query's checkpoint-removal I/O landed in whichever window
    // came next — q02 "regressed" 4× in round 4 purely because the map
    // order put it after the two heaviest operators. The trailing no-op
    // job is a barrier for stragglers on the cleaner queue, and the
    // forced GC pays each query's allocation debt in ITS OWN gap — not
    // as a major-GC pause inside the next query's measurement (the
    // residual q02 inflation after the two allocation-heavy dedup
    // queries).
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.range(2L).count()
      System.gc()
    }

    // DEV-ONLY subset iteration (SPARK_GRAFT_BENCH_FILTER=q141,...):
    // runs the named queries with the same warmup/gate/min-of-2
    // discipline but REFUSES to write artifacts — a filtered run must
    // never masquerade as the bench (the completeness guard below)
    val benchFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_FILTER")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val toRun = benchFilter match {
      case Some(f) => SparkEntry.queries.filter(kv => f.contains(kv._1))
      case None => SparkEntry.queries
    }
    val wallStart = System.currentTimeMillis()
    val results = toRun.toSeq.map { case (name, fn) =>
      // min of two runs: single-run times on a shared VM carry ±2×
      // scheduler/GC noise; the min is the steady-state compute cost
      // (Spark cache cleared between runs — only the OS page cache
      // stays warm, which is the realistic cluster condition).
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        // A crashed query must be distinguishable from a fast one:
        // record the exception class instead of silently timing it.
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        val sec = (System.nanoTime() - t0) / 1e9
        cleanup()
        (sec, err)
      }
      val startMs = System.currentTimeMillis()
      val load0 = loadavg()
      val (s1, e1) = once()
      val (s2, e2) = if (e1.isEmpty) once() else (s1, e1)
      val endMs = System.currentTimeMillis()
      (name, math.min(s1, s2), e1.orElse(e2),
        s"""{"start_ms":$startMs,"end_ms":$endMs,"run1":$s1,"run2":$s2,"load1m":$load0}""")
    }
    // FAIL-LOUD completeness gate (round 18): an artifact claiming to be
    // "the bench" must cover EXACTLY SparkEntry.queries — round 17
    // shipped a BENCH_sf1.json missing one query because the artifact
    // predated the query's landing. An incomplete artifact is worse than
    // none (it reads as "covered everything"), so refuse to write one.
    val missingQ = SparkEntry.queries.keySet -- results.map(_._1).toSet
    val extraQ = results.map(_._1).toSet -- SparkEntry.queries.keySet
    require(benchFilter.isDefined || (missingQ.isEmpty && extraQ.isEmpty),
      s"bench artifact would not cover SparkEntry.queries exactly — missing: " +
        s"[${missingQ.toSeq.sorted.mkString(", ")}], extra: " +
        s"[${extraQ.toSeq.sorted.mkString(", ")}]; refusing to write a " +
        "misleading artifact")
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    // Per-query wall-clock timestamps, both raw runs, and a 1-minute
    // loadavg sample: a contaminated driver-VM run (round 4's 89 s
    // phantom) is then self-evident from the artifact — inflated
    // queries show high ambient load and BOTH runs slow, where a code
    // regression shows normal load and reproducible per-run cost.
    val timing = results.map { case (k, _, _, t) => "\"" + k + "\":" + t }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Per-family sums: drift adjudication straight from the artifact
    // (SURVEY §8 reads these; no more per-round Scratch probes for
    // "which family moved").
    val families = results.groupBy { case (k, _, _, _) => family(k) }
      .toSeq.sortBy(_._1)
      .map { case (f, rs) =>
        "\"" + f + "\":{\"sec\":" +
          "%.3f".formatLocal(java.util.Locale.ROOT, rs.map(_._2).sum) +
          ",\"n\":" + rs.size + "}"
      }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","wall_start_ms":$wallStart,"wall_end_ms":${System.currentTimeMillis()},"load1m_end":${loadavg()},"load_gated":$gated,"gate_wait_sec":$gateWaitSec,"load1m_open":$loadAtOpen,"families":$families,"timing":$timing}"""
    // The bare line goes to stdout (build.sbt routes forked output
    // straight through, so no sbt "[info] " prefix) AND to files. The
    // repo copy is the durable per-query artifact: round 6's 2000-char
    // stdout tail preserved only 15 of 75 per-query timings, so the
    // full map now lives where a tail capture can't truncate it.
    println(json)
    // repo copy derived from the launch cwd (sbt forks with user.dir =
    // the project root), not a hardcoded machine path; a failed write
    // warns loudly instead of silently losing the durable artifact
    // sf1 runs land in their OWN durable artifact (BENCH_sf1.json) so
    // the 10× numbers are institutional — same gate fields, same
    // min-of-2 discipline, not an anecdote in a scratch log.
    val detailName =
      if (new java.io.File(sfDir).getName == "sf1") "BENCH_sf1.json"
      else "BENCH_DETAIL.json"
    val detail = java.nio.file.Paths.get(sys.props("user.dir"), detailName)
    for (p <- Seq(java.nio.file.Paths.get("/tmp/bench.json"), detail)
         if benchFilter.isEmpty)
      try java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
      catch { case e: java.io.IOException =>
        System.err.println(s"WARN: bench artifact write failed at $p: $e") }
    // The full artifact line above can exceed a tail-capture window (it
    // did in round 5: a 2000-char tail cut it before "metric":"total"
    // and the round's official wall-time was lost). Emit a compact LAST
    // line carrying the headline AND the whole per-query map at 3-dp
    // (~18 bytes/query — all 75 fit comfortably inside a 2000-char
    // tail) so the capture window alone reconstructs every timing.
    val qs3 = results.map { case (k, v, _, _) =>
      "\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","families":$families,"queries":$qs3}""")
    // Round 19: the driver's tail capture is 2000 chars and its JSON
    // parse is line-oriented — at 142 queries the 3-dp map line above
    // (~3 KB) truncates mid-line and the driver's entire per-query and
    // scaling analysis silently vanishes (PERF_r18: n_common=0,
    // per_query={}). Emit each query as its OWN small parseable line,
    // ascending by time so the heaviest queries — the ones drift
    // adjudication actually needs — land inside even the smallest tail
    // window, then a compact per-family rollup line. Additive only:
    // every pre-existing line keeps its place and the total-only line
    // stays LAST.
    results.sortBy(_._2).foreach { case (k, v, _, _) =>
      println(s"""{"metric":"query","name":"$k","sec":${"%.3f".formatLocal(java.util.Locale.ROOT, v)},"sf":"$sfDir"}""")
    }
    println(s"""{"metric":"families","unit":"sec","sf":"$sfDir","families":$families}""")
    // The 3-dp map line outgrew a 2000-char tail again at 92 queries
    // (round 9 recovered only 84 of 92 timings). The VERY LAST line is
    // therefore total-only (< 500 chars, no queries map): any tail
    // capture, however small, preserves the headline; the full and 3-dp
    // maps remain above and in BENCH_DETAIL.json for per-query drill-in.
    val nErr = results.count(_._3.isDefined)
    println(s"""{"metric":"total","value":${"%.3f".formatLocal(java.util.Locale.ROOT, total)},"unit":"sec","n_queries":${results.size},"n_errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
