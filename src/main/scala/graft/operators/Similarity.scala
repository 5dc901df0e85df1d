package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Vector math goes through graft's native Catalyst expression
  * (functions.FloatDotProduct): whole-stage-codegen'd primitive loops,
  * no UDF serialization, no interpreted higher-order functions, and
  * deterministic left-to-right double summation (which the DuckDB
  * oracle reproduces exactly).
  *
  * Scale shape: the probe set is always the broadcast side; the corpus
  * is scanned once. Top-k is taken per (probe, partition) implicitly by
  * the window over rank — with AQE the post-join partitioning keeps one
  * probe's candidates co-located, so the rank window shuffles only
  * (probes × corpus-partition winners), not the full score matrix.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dotF(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2norm(a) * l2norm(b), lit(0.0))

  /** Brute-force cosine top-k: exact baseline. `probes` must be small
    * (it is broadcast); corpus side stays partition-local until the
    * final per-probe rank.
    */
  def knnBrute(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec")))
    val c = Spread.medium(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val scored = p.crossJoin(c)
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rank"))
  }

  /** Random-hyperplane LSH bucket id: sign bits of `planes` random
    * projections packed into a long. Deterministic in `seed`. The
    * plane matrix rides on a native kernel expression (ONE node — it
    * ships to executors inside the task binary, which Spark itself
    * broadcasts), so plan size and codegen cost are independent of
    * planes × dim; the previous literal-baked formulation hit
    * analyzer/codegen walls past ~64 planes × a few hundred dims.
    * Same matrix values (same RNG order), same sign-bit packing —
    * bucket ids are unchanged for non-null vectors. One deliberate
    * change vs the old when/otherwise Column form: a NULL embedding
    * now yields a NULL bucket (dropped by bucket joins) where the old
    * form landed it in bucket 0 — a null vector has no meaningful
    * projection, so pairing it with real bucket-0 vectors was noise.
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int = 16, seed: Long = 42L): Column = {
    // planes = 0 is EXACT mode: every vector lands in one bucket, so a
    // bucketed operator degrades to its all-pairs/all-candidates
    // semantics (the oracle-closure trick — see q85/q79)
    if (planes == 0) return lit(0L)
    val rnd = new scala.util.Random(seed)
    val matrix = Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    graft.functions.VectorFunctions.hyperplaneBits(vec, matrix)
  }

  /** LSH-bucketed approximate NN: probes and corpus bucketed by
    * hyperplane signature; candidates share a bucket (multi-probe via
    * sign-flip neighbors of the probe bucket); exact cosine rank within
    * candidates. Corpus bucketing is a pure projection — at 100 TB the
    * bucket id would be precomputed/partitioned at ingest so a query
    * touches only matching partitions.
    */
  def annLsh(
      corpus: DataFrame,
      probes: DataFrame,
      dim: Int,
      k: Int = 10,
      planes: Int = 12,
      multiProbeBits: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(multiProbeBits >= 0 && multiProbeBits <= 2,
      s"multiProbeBits supports hamming distance 0..2, got $multiProbeBits")
    val bucketed = Spread.medium(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      hyperplaneBucket(col(vecCol), dim, planes).as("bucket"))
    // Multi-probe: the probe's own bucket plus every bucket within
    // hamming distance `multiProbeBits` (single-bit flips at 1,
    // + all bit-pair flips at 2 — planes·(planes−1)/2 extra probes per
    // row, bounded and broadcast-side only) — recovers neighbors lost
    // to sign flips without widening the corpus scan.
    val flips1 = (0 until (if (multiProbeBits >= 1) planes else 0)).map(i =>
      col("b0").bitwiseXOR(shiftleft(lit(1L), i)))
    val flips2 =
      if (multiProbeBits >= 2)
        for { i <- 0 until planes; jj <- (i + 1) until planes }
          yield col("b0").bitwiseXOR(shiftleft(lit(1L), i)).bitwiseXOR(shiftleft(lit(1L), jj))
      else Seq.empty
    val probeBuckets = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
        hyperplaneBucket(col(vecCol), dim, planes).as("b0"))
      .withColumn("bucket", explode(array(col("b0") +: (flips1 ++ flips2): _*)))
      .drop("b0")
    val scored = broadcast(probeBuckets).join(bucketed, Seq("bucket"))
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rank"))
  }

  /** IVF coarse-quantizer centroids: deterministic sample init (first
    * `nlist` vectors by id) refined by `iters` Lloyd rounds, each round
    * one distributed pass — assignment is a pure codegen'd projection
    * (centroids baked as literals), the mean-update a posexplode +
    * (list, pos) aggregation with map-side partial aggs. Only
    * nlist × dim floats ever reach the driver, per round — the corpus
    * never does. Clusters that lose all members keep their previous
    * centroid.
    */
  def ivfCentroids(
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Array[Float])] = {
    var cents: Seq[(Int, Array[Float])] = corpus
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(nlist)
      .collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](1).toArray
      }.toSeq
    // Spread the per-iteration assignment scan (r19, guide §2.5): the
    // Lloyd mean-update fuses the nearest-centroid kernel with the
    // corpus scan and ran serially on a single-split input. The seed
    // collection above stays on the raw frame (orderBy is
    // partitioning-invariant; no kernel in that path).
    val corpusSpread = Spread.medium(corpus)
    for (_ <- 0 until iters) {
      val means = corpusSpread
        .select(ivfAssign(col(vecCol), cents).as("list_id"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("list_id", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("list_id"),
          transform(col("pm"), p => p.getField("m").cast("float")).as("cvec"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      cents = cents.map { case (lid, old) => lid -> means.getOrElse(lid, old) }
    }
    cents
  }

  /** Nearest-centroid list id as a pure projection — the native
    * [[graft.functions.VectorFunctions.nearestCentroid]] kernel (one
    * expression node carrying the centroid matrix in the task binary;
    * whole-stage codegen, fuses with the scan, plan size independent
    * of nlist × dim). Ties go to the larger list id, matching the
    * former literal struct-array argmax bit-for-bit.
    */
  def ivfAssign(vec: Column, cents: Seq[(Int, Array[Float])]): Column =
    graft.functions.VectorFunctions.nearestCentroid(vec,
      cents.map(_._1).toArray, cents.map(_._2).toArray)

  /** The probe's `nprobe` nearest centroid lists, best-first (same
    * native kernel as [[ivfAssign]]).
    */
  def ivfProbeLists(vec: Column, cents: Seq[(Int, Array[Float])], nprobe: Int): Column =
    graft.functions.VectorFunctions.nearestCentroids(vec,
      cents.map(_._1).toArray, cents.map(_._2).toArray, nprobe)

  /** Centroids → DataFrame `(list_id int, centroid array<float>)` for
    * catalog persistence: `centroidsToDF(...).write.saveAsTable("t")`
    * is the durable at-ingest artifact a 100 TB deployment stores next
    * to the corpus (nlist × dim floats — trivially small).
    */
  def centroidsToDF(spark: org.apache.spark.sql.SparkSession,
                    cents: Seq[(Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    cents.map { case (lid, c) => (lid, c.toSeq) }.toDF("list_id", "centroid")
  }

  /** Load a stored coarse quantizer (inverse of [[centroidsToDF]]). */
  def centroidsFromDF(df: DataFrame): Seq[(Int, Array[Float])] =
    df.select(col("list_id"), col("centroid")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toSeq
      .sortBy(_._1)

  /** Session-scoped trained-quantizer cache — the single-JVM stand-in
    * for "train at ingest, store with the corpus": the first call per
    * `key` (e.g. the corpus path) pays the Lloyd passes; every later
    * ANN query on that corpus reuses the centroids with ZERO training
    * scans. A multi-session deployment persists [[centroidsToDF]] to a
    * catalog table instead and loads via [[centroidsFromDF]].
    */
  private val trainedQuantizers =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Array[Float])]]()

  def ivfCentroidsCached(
      key: String,
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Array[Float])] =
    // idCol/vecCol belong in the key: the same corpus trained on a
    // different vector column is a different quantizer.
    trainedQuantizers.computeIfAbsent(s"$key:$nlist:$iters:$idCol:$vecCol",
      _ => ivfCentroids(corpus, nlist, iters, idCol, vecCol))

  /** Catalog-table quantizer persistence — the durable cross-session
    * form of [[ivfCentroidsCached]]: loads the stored centroids if the
    * table exists, otherwise trains once and saves them. The table IS
    * the at-ingest artifact: later sessions (or other jobs) run ANN
    * queries with zero Lloyd passes and zero training scans.
    */
  def ivfCentroidsTable(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Array[Float])] =
    if (spark.catalog.tableExists(table)) centroidsFromDF(spark.table(table))
    else {
      val cents = ivfCentroids(corpus, nlist, iters, idCol, vecCol)
      // Two jobs can race past the tableExists check; whoever loses the
      // saveAsTable falls back to READING the winner's centroids — both
      // callers then quantize with the same stored quantizer (mixing
      // two trainings' centroids across jobs would corrupt list
      // assignments). The fallback read must itself succeed — a write
      // that died AFTER creating the table metadata must surface ITS
      // error, not a confusing read failure over partial output.
      try {
        centroidsToDF(spark, cents).write.saveAsTable(table)
        cents
      } catch {
        case e: Throwable if spark.catalog.tableExists(table) =>
          try centroidsFromDF(spark.table(table))
          catch { case _: Throwable => throw e }
      }
    }

  /** Path-backed quantizer persistence — the form that survives a JVM
    * restart WITHOUT a persistent metastore: the parquet directory is
    * the durable at-ingest artifact, so a FRESH session (in-memory
    * catalog, where a previous JVM's saveAsTable is not resolvable as a
    * table) still runs ANN queries with zero Lloyd passes. Same
    * concurrent-writer contract as [[ivfCentroidsTable]]: the loser of
    * the write race reads the winner's centroids.
    */
  def ivfCentroidsPath(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Array[Float])] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Artifact integrity = "reads back with exactly nlist centroids":
    // no _SUCCESS dependence (clusters can disable the marker); a
    // crashed writer's partial directory — which can read back a
    // SUBSET of part-files without erroring — and a rename race that
    // nested a tmp dir inside the artifact both fail the check.
    def tryRead(): Option[Seq[(Int, Array[Float])]] =
      try {
        val c = centroidsFromDF(spark.read.parquet(path))
        if (c.length == nlist) Some(c) else None
      } catch { case _: Throwable => None }
    // Sweep ORPHANED tmp dirs from crashed trainers (>1h old — a live
    // concurrent trainer's tmp is seconds old and must not be touched).
    val parent = p.getParent
    if (parent != null && fs.exists(parent)) {
      val cutoff = System.currentTimeMillis() - 3600L * 1000
      fs.listStatus(parent)
        .filter(st => st.getPath.getName.startsWith(p.getName + "__train_") &&
          st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    }
    tryRead().getOrElse {
      val cents = ivfCentroids(corpus, nlist, iters, idCol, vecCol)
      // Publish via RENAME of a private tmp dir: concurrent trainers
      // never write the same directory, so no one deletes or reads
      // another's in-flight output; losers adopt the winner's
      // artifact. Rename-onto-existing-directory NESTS on Hadoop, so
      // every publish is validated by tryRead() and an invalid target
      // is deleted and retried — the loop self-heals both crashed-
      // writer garbage and nesting races, bounded at 3 attempts.
      // Deleting the SHARED artifact is only safe on POSITIVE corruption
      // — a rename race that nested a tmp dir inside it, or the wrong
      // centroid count on a stable re-read after backoff. A transient
      // read failure (FS hiccup, racing a winner's in-flight rename)
      // must never destroy an artifact another job just published or is
      // actively reading; back off and re-read instead.
      def nestedTmp(): Boolean =
        try fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.contains("__train_"))
        catch { case _: Throwable => false }
      def wrongShape(): Boolean =
        try centroidsFromDF(spark.read.parquet(path)).length != nlist
        catch { case _: Throwable => false } // unreadable != provably corrupt
      var result: Option[Seq[(Int, Array[Float])]] = None
      var attempts = 0
      while (result.isEmpty && attempts < 3) {
        attempts += 1
        val tmp = new org.apache.hadoop.fs.Path(
          path + "__train_" + java.util.UUID.randomUUID.toString.take(8))
        centroidsToDF(spark, cents).write
          .mode(org.apache.spark.sql.SaveMode.ErrorIfExists).parquet(tmp.toString)
        if (!fs.exists(p) && fs.rename(tmp, p)) {
          result = tryRead() // validate own publish (nesting race)
          if (result.isEmpty) { Thread.sleep(250L); result = tryRead() }
          if (result.isEmpty) fs.delete(p, true) // own publish, still invalid
        } else {
          fs.delete(tmp, true)
          result = tryRead() // adopt the winner
          if (result.isEmpty && fs.exists(p)) {
            Thread.sleep(250L * attempts)
            result = tryRead()
            if (result.isEmpty &&
                (nestedTmp() || (wrongShape() && { Thread.sleep(250L); wrongShape() })))
              fs.delete(p, true) // positively corrupt — clear for retry
          }
        }
      }
      result.getOrElse(throw new IllegalStateException(
        s"quantizer artifact at $path could not be published or read after $attempts attempts"))
    }
  }

  /** IVF-Flat approximate NN — the classic scale path next to
    * hyperplane LSH ([[annLsh]]): partition the corpus into `nlist`
    * inverted lists by nearest coarse centroid, search only the
    * `nprobe` lists nearest each probe, exact cosine rank within them.
    *
    * This overload trains the quantizer inline (one-shot/ad-hoc use).
    * Repeated queries against the same corpus should train ONCE — at
    * ingest — and call the pre-trained overload below (directly, via
    * [[ivfCentroidsCached]], or via a stored [[centroidsToDF]] table):
    * training costs `iters` full corpus passes that a query should
    * never pay.
    */
  def ivfAnn(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfAnn(corpus, probes, ivfCentroids(corpus, nlist, iters, idCol, vecCol),
      k, nprobe, idCol, vecCol)

  /** IVF-Flat search with a PRE-TRAINED coarse quantizer — zero Lloyd
    * passes; the only corpus touch is the single search scan.
    *
    * Scale shape: corpus list assignment is a projection (at 100 TB it
    * would be precomputed at ingest and used as the table's partition
    * key, so a query reads only nprobe/nlist of the data); probes
    * explode to nprobe rows and BROADCAST onto the lists; the rank
    * window sees only candidate rows.
    */
  def ivfAnn(
      corpus: DataFrame,
      probes: DataFrame,
      cents: Seq[(Int, Array[Float])],
      k: Int,
      nprobe: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val lists = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      ivfAssign(col(vecCol), cents).as("list_id"))
    val probed = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      explode(ivfProbeLists(col(vecCol), cents, nprobe)).as("list_id"))
    broadcast(probed).join(lists, Seq("list_id"))
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the corpus once,
    * pair within buckets (skew-capped), keep cosine ≥ threshold.
    *
    * Pair generation goes through `Dedup.bucketPairs` — the shared
    * ids-only generator (tiny groupBy-count + broadcast anti-join as
    * the skew guard; no window over the vector stream). Float vectors
    * re-join AFTER pair dedup, so the heavy shuffle carries 16-byte id
    * pairs, never two vector payloads per candidate row.
    */
  def embeddingNearDup(
      corpus: DataFrame,
      dim: Int,
      threshold: Double = 0.95,
      planes: Int = 12,
      maxBucket: Int = 2000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val vecs = Spread.medium(corpus).select(col(idCol).as("id"), col(vecCol).as("vec"))
    val bucketed = Spread.medium(corpus).select(col(idCol).as("id"),
      hyperplaneBucket(col(vecCol), dim, planes).as("bucket"))
    Dedup.bucketPairs(bucketed, Seq("bucket"), "id", maxBucket)
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("sim", round(cosine(col("vec_a"), col("vec_b")), 4))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
