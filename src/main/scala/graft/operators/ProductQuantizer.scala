package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the vector
  * COMPRESSION layer under ANN search at corpus scales where the float
  * vectors themselves are the dominant I/O.
  *
  * A `dim`-float vector (dim × 4 bytes) is split into `m` contiguous
  * subvectors; each subspace gets its own tiny k-means codebook
  * (`ksub` centroids over `dim/m` floats), and a vector is stored as
  * the `m` nearest-centroid codes — `m` bytes when ksub ≤ 256. At
  * dim=64/m=8 that is a 32× reduction of the scan payload: searching
  * 100 TB of raw float vectors becomes a ~3 TB scan of codes, and with
  * an IVF coarse quantizer on top ([[ivfPqAnn]]) only nprobe/nlist of
  * THAT. Candidates are scored against the codes alone via asymmetric
  * distance computation (ADC): the probe precomputes its dot product
  * with every (subspace, code) centroid ONCE — an m × ksub lookup
  * table per probe row — and each candidate then costs m array
  * lookups + adds instead of dim multiplies. An exact re-rank of the
  * ADC top `rerank` against the true vectors (point reads by id)
  * restores near-exact top-k.
  *
  * Reference scope: drune has no vector search; this extends graft's
  * similarity family (SURVEY §2 q34/q35/q44/q70) with the
  * compressed-scan path (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public method).
  *
  * Everything is deterministic: sample init by ascending id, Lloyd
  * updates on double means, fixed tie-breaks (larger code wins via
  * struct ordering) — so codebooks, codes and search results are
  * stable across runs, which is what makes the recall suites and the
  * rows-only driver gate meaningful.
  */
object ProductQuantizer {

  /** Trained codebooks: `cents(j)(c)` is the c-th centroid of subspace
    * j, length `dim/m`. Small by construction (dim × ksub floats) —
    * lives on the driver and rides the kernel EXPRESSIONS as a plain
    * field (shipped once per executor inside the task binary), never
    * as plan literals: m × ksub × dsub literal nodes were an
    * analyzer/codegen wall at real codebook sizes.
    */
  case class PqCodebook(dim: Int, m: Int, ksub: Int,
      cents: Vector[Vector[Array[Float]]]) {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub: Int = dim / m
    /** ‖centroid‖² per (subspace, code) — the ADC norm table. */
    lazy val normsq: Vector[Vector[Float]] =
      cents.map(_.map(c => c.map(x => x * x).sum))
    /** The kernel-field forms (stable arrays for expression transport). */
    private[operators] lazy val centsArr: Array[Array[Array[Float]]] =
      cents.map(_.toArray).toArray
    private[operators] lazy val normsqArr: Array[Array[Float]] =
      normsq.map(_.toArray).toArray
  }

  /** PQ codes for a vector as a pure projection: per subspace, the
    * argmin-L2 code via the dot-product identity
    * argmin_c ‖v−c‖² = argmax_c (v·c − ‖c‖²/2) — a native codegen'd
    * kernel (graftbridge.PqEncode), fuses with the scan. At ingest this
    * is the column you persist next to (or instead of) the embedding.
    */
  def encodeExpr(vec: Column, cb: PqCodebook): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.graftbridge.PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        cb.centsArr, cb.normsqArr, cb.dsub))

  /** Train per-subspace codebooks: deterministic init (subvectors of
    * the first `ksub` vectors by id), then `iters` Lloyd rounds. Each
    * round is ONE distributed pass for ALL subspaces — codes are a
    * projection, the mean update a posexplode + (subspace, code,
    * position) aggregation with map-side partials; only
    * m × ksub × dsub doubles reach the driver per round, never the
    * corpus. Subspace cells that lose all members keep their previous
    * centroid.
    */
  def train(
      corpus: DataFrame,
      dim: Int,
      m: Int,
      ksub: Int = 16,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): PqCodebook = {
    val dsub = dim / m
    val seedRows = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(ksub).collect()
    require(seedRows.length == ksub,
      s"PQ init needs at least ksub=$ksub vectors, corpus has ${seedRows.length}")
    var cb = PqCodebook(dim, m, ksub,
      Vector.tabulate(m)(j => Vector.tabulate(ksub)(c =>
        seedRows(c).getSeq[Float](1).slice(j * dsub, (j + 1) * dsub).toArray)))
    // Spread the per-iteration encode scan (r19, guide §2.5) — same
    // single-split serial-kernel shape as Similarity.ivfCentroids
    val corpusSpread = Spread.medium(corpus)
    for (_ <- 0 until iters) {
      val j = (col("pos") / dsub).cast("int")
      val means = corpusSpread
        // Two selects on purpose: a generator (posexplode) in the SAME
        // projection as encodeExpr makes the analyzer re-resolve the
        // struct under the Generate and strip the field aliases
        // (col1/col2), breaking getField("code"). Projection collapsing
        // fuses them back into one stage anyway.
        .select(encodeExpr(col(vecCol), cb).as("codes"), col(vecCol).as("__v"))
        .select(col("codes"), posexplode(col("__v")).as(Seq("pos", "x")))
        .select(j.as("j"), element_at(col("codes"), j + 1).as("code"),
          pmod(col("pos"), lit(dsub)).as("subpos"), col("x"))
        .groupBy("j", "code", "subpos")
        .agg(avg(col("x").cast("double")).as("meanx"))
        .collect()
        .groupBy(r => (r.getAs[Int]("j"), r.getAs[Int]("code")))
        .map { case (jc, rows) =>
          val v = new Array[Float](dsub)
          rows.foreach(r => v(r.getAs[Int]("subpos")) = r.getAs[Double]("meanx").toFloat)
          jc -> v
        }
      cb = cb.copy(cents = Vector.tabulate(m)(j => Vector.tabulate(ksub)(c =>
        means.getOrElse((j, c), cb.cents(j)(c)))))
    }
    cb
  }

  /** Session-scoped trained-codebook cache (the single-JVM stand-in for
    * "train at ingest, persist with the corpus" — mirrors
    * Similarity.ivfCentroidsCached).
    */
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[String, PqCodebook]()

  def trainCached(key: String, corpus: DataFrame, dim: Int, m: Int,
      ksub: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqCodebook =
    trained.computeIfAbsent(s"$key:$dim:$m:$ksub:$iters:$idCol:$vecCol",
      _ => train(corpus, dim, m, ksub, iters, idCol, vecCol))

  /** Codebook ⇄ DataFrame for catalog persistence (the durable
    * at-ingest artifact; m × ksub rows of dsub floats).
    */
  def codebookToDF(spark: org.apache.spark.sql.SparkSession, cb: PqCodebook): DataFrame = {
    import spark.implicits._
    (for { j <- 0 until cb.m; c <- 0 until cb.ksub }
      yield (cb.dim, j, c, cb.cents(j)(c).toSeq)).toDF("dim", "j", "code", "centroid")
  }

  def codebookFromDF(df: DataFrame): PqCodebook = {
    val rows = df.select("dim", "j", "code", "centroid").collect()
    val dim = rows.head.getInt(0)
    val byJ = rows.groupBy(_.getInt(1))
    val m = byJ.size
    val cents = Vector.tabulate(m)(j =>
      byJ(j).sortBy(_.getInt(2)).map(_.getSeq[Float](3).toArray).toVector)
    PqCodebook(dim, m, cents.head.length, cents)
  }

  /** The probe-side ADC lookup table: `lut[j][c]` = probe-subvector ·
    * centroid(j, c). Computed once per probe ROW; every candidate the
    * probe meets afterwards is scored by m lookups into it.
    */
  private def lutExpr(vec: Column, cb: PqCodebook): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.graftbridge.PqLut(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        cb.centsArr, cb.dsub))

  /** ADC cosine of a candidate's `codes` against the probe's `lut`:
    * approx dot = Σⱼ lut[j][codes[j]], approx ‖x‖ from the codebook
    * norm table (a kernel field — the same m lookups). No float
    * vectors are touched; both sums are native codegen'd loops.
    */
  private def adcSim(lut: Column, codes: Column, probeNorm: Column, cb: PqCodebook): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
    val dot = CB.column(org.apache.spark.sql.graftbridge.PqAdcDot(
      CB.expression(lut), CB.expression(codes)))
    val nsq = CB.column(org.apache.spark.sql.graftbridge.PqCodeNormSq(
      CB.expression(codes), cb.normsqArr))
    dot / (probeNorm * sqrt(nsq))
  }

  /** IVF-PQ search with exact re-rank — the full compressed-scan ANN:
    *
    *  1. corpus → (id, IVF list, PQ codes): a projection; at ingest
    *     both are precomputed, the table list-partitioned, and a query
    *     scans only nprobe/nlist of the m-byte codes — neither training
    *     nor search ever shuffles the corpus vectors.
    *  2. probes (broadcast, exploded to nprobe lists) ADC-score every
    *     candidate in their lists from codes alone; top `rerank` per
    *     probe survive.
    *  3. survivors join back to true vectors BY ID (point reads —
    *     rerank × nprobes rows, not the corpus) for exact cosine, and
    *     the top k of that is the answer.
    *
    * rerank ≥ k trades a little extra point-read I/O for recall lost to
    * quantization error; nprobe/nlist trades scan fraction for coarse
    * recall, exactly as in [[Similarity.ivfAnn]].
    */
  def ivfPqAnn(
      corpus: DataFrame,
      probes: DataFrame,
      coarse: Seq[(Int, Array[Float])],
      cb: PqCodebook,
      k: Int = 10,
      nprobe: Int = 4,
      rerank: Int = 50,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfPqAnnCoded(encodeCorpus(corpus, coarse, cb, idCol, vecCol),
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec")),
      probes, coarse, cb, k, nprobe, rerank, idCol, vecCol)

  /** `(vec_id, list_id, codes)` for the whole corpus — one projection.
    * This is the column set a deployment PERSISTS at ingest (written
    * list_id-partitioned, it is the IVF-PQ index: a search scans
    * nprobe/nlist of the m-byte codes and nothing else); [[ivfPqAnn]]
    * computes it inline only for one-shot use.
    */
  def encodeCorpus(
      corpus: DataFrame,
      coarse: Seq[(Int, Array[Float])],
      cb: PqCodebook,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    // Spread the encode scan (r19, guide §2.5): assignment + PQ encode
    // are the per-row kernels; rows are partitioning-invariant
    Spread.medium(corpus).select(col(idCol).as("vec_id"),
      Similarity.ivfAssign(col(vecCol), coarse).as("list_id"),
      encodeExpr(col(vecCol), cb).as("codes"))

  /** [[ivfPqAnn]] over a PRE-ENCODED corpus: `coded` as produced by
    * [[encodeCorpus]] (usually read back from its persisted,
    * list-partitioned form), `vecs` = `(vec_id, vec)` for the exact
    * re-rank's point reads.
    */
  def ivfPqAnnCoded(
      coded: DataFrame,
      vecs: DataFrame,
      probes: DataFrame,
      coarse: Seq[(Int, Array[Float])],
      cb: PqCodebook,
      k: Int,
      nprobe: Int,
      rerank: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probed = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      lutExpr(col(vecCol), cb).as("lut"),
      Similarity.l2norm(col(vecCol)).as("probe_norm"),
      explode(Similarity.ivfProbeLists(col(vecCol), coarse, nprobe)).as("list_id"))
    val cand = broadcast(probed).join(coded, Seq("list_id"))
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("adc", adcSim(col("lut"), col("codes"), col("probe_norm"), cb))
      .withColumn("adc_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("adc").desc, col("vec_id"))))
      .where(col("adc_rank") <= rerank)
      .select(col("probe_id"), col("probe_vec"), col("vec_id"))
    cand.join(vecs, Seq("vec_id"))
      .withColumn("sim", round(Similarity.cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rank"))
  }
}
