package graft.pipeline

import graft.quality.{Constraint, TableRule}

/** Typed pipeline spec — graft's equivalent of drune's YAML models
  * (reference: src/drune/core/models/pipeline_model.py:1-220). Where
  * drune parses YAML into pydantic models, graft uses a Scala ADT: the
  * compiler enforces what drune checks at runtime. A YAML front-end can
  * be layered on (snakeyaml ships with Spark) without touching this.
  */

sealed trait SourceSpec { def name: String }
/** File source (pipeline_model.py SourceSpec type='file');
  * `expectedColumns` replicates reader.py:297-307's delimiter sanity
  * check — fail fast when a mis-parsed CSV yields the wrong width.
  */
final case class FileSource(
    name: String,
    path: String,
    format: String = "parquet",
    options: Map[String, String] = Map.empty,
    expectedColumns: Option[Int] = None) extends SourceSpec
/** Catalog-table source (type='table'). */
final case class TableSource(name: String, table: String) extends SourceSpec
/** SQL source (type='sql') — runs against already-registered views. */
final case class SqlSource(name: String, sql: String) extends SourceSpec
/** Versioned-table source (type='versioned', graft extension): reads a
  * [[VersionedTable]] root — newest committed snapshot by default, a
  * pinned `version` for reproducible reprocessing, or only the data
  * added after `sinceVersion` (incremental consumption of an
  * append-only history).
  */
final case class VersionedSource(
    name: String,
    path: String,
    format: String = "parquet",
    version: Option[Long] = None,
    sinceVersion: Option[Long] = None) extends SourceSpec {
  require(path.nonEmpty, s"versioned source '$name': path is required")
  require(version.isEmpty || sinceVersion.isEmpty,
    s"versioned source '$name': version and sinceVersion are mutually exclusive")
}

/** Column spec (pipeline_model.py ColumnSpec): rename (`from`→`name`),
  * cast to `dataType` (try_cast if `tryCast`), optional SQL `expression`
  * with `{col}` placeholder, `optional` missing-column tolerance,
  * plus quality constraints (applied by ValidateStep).
  */
final case class ColumnSpec(
    name: String,
    from: Option[String] = None,
    dataType: Option[String] = None,
    expression: Option[String] = None,
    optional: Boolean = false,
    tryCast: Boolean = false,
    description: Option[String] = None,
    constraints: Seq[Constraint] = Nil,
    /** Parse pattern for date/timestamp types (drune TypeDefault.format,
      * e.g. "yyyy-MM-dd") — applied via to_date/to_timestamp. */
    format: Option[String] = None) {
  def sourceName: String = from.getOrElse(name)
}

/** Write modes (pipeline_model.py TargetSpec.mode + writer.py). */
sealed trait WriteMode
case object Append extends WriteMode
case object Overwrite extends WriteMode
/** Dynamic partition overwrite (writer.py 'overwrite_partition'). */
case object OverwritePartition extends WriteMode
/** Overwrite only rows matching `condition` (writer.py replaceWhere). */
final case class OverwriteWhere(condition: String) extends WriteMode
/** Upsert on the primary-key hash (writer.py _merge_standard). */
case object MergeUpsert extends WriteMode
/** SCD Type 2 versioning (writer.py _merge_scd2). */
final case class Scd2(trackColumns: Seq[String] = Nil) extends WriteMode

/** Materialized-view sink config (graft extension; YAML `materialized:`
  * block on the target): the sink path becomes an incrementally-
  * maintained rollup of the pipeline's single versioned source —
  * running the pipeline = one [[MaterializedAgg.refresh]] folding only
  * the source commits since the last run, never rescanning history.
  * Row-local computation belongs in the aggregates' `expr`s; pipeline
  * steps are refused (delta maintenance cannot see through them).
  * Replaces drune's full gold recompute per run
  * (reference: src/drune/engines/spark/spark_engine.py:232-255).
  */
final case class MaterializedSpec(
    groupBy: Seq[String],
    aggs: Seq[MaterializedAgg.MAgg]) {
  require(groupBy.nonEmpty, "materialized sink: group_by is required")
  require(aggs.nonEmpty, "materialized sink: at least one aggregate is required")
}

/** Sink (pipeline_model.py TargetSpec): a file path and/or a catalog
  * table name (`table` drives the DDL layer — create/update/evolve).
  */
final case class SinkSpec(
    path: String,
    format: String = "parquet",
    mode: WriteMode = Append,
    partitionBy: Seq[String] = Nil,
    table: Option[String] = None,
    // Z-order clustering columns (graft extension; YAML `zorder_by`):
    // files cover compact hyper-rectangles of these columns' key space
    // so min/max stats prune scans on any of them. Applies to every
    // PATH write mode (incl. merge/scd rewrites); catalog-table sinks
    // reject it loudly. `zorder_files` caps the output file count.
    zorderBy: Seq[String] = Nil,
    zorderFiles: Int = 64,
    // Versioned path sink (graft extension; YAML `versioned: true`):
    // every write commits an immutable data directory through
    // VersionedTable's manifest-pointer CAS, so concurrent merges
    // serialize (losers re-merge and retry — no lost updates), readers
    // always see a complete snapshot, and old versions stay readable
    // until vacuum. The plain-parquet answer to the reference's Delta
    // table sinks (writer.py:40-100).
    versioned: Boolean = false,
    // Incrementally-maintained rollup sink (graft extension; YAML
    // `materialized:` block) — see [[MaterializedSpec]].
    materialized: Option[MaterializedSpec] = None,
    // Additive schema evolution on DELTA appends (delta-spark's
    // mergeSchema; YAML `merge_schema: true`): new columns join the
    // table schema nullable, missing ones null-fill. Only meaningful
    // on `format: delta` append sinks — others refuse loudly.
    mergeSchema: Boolean = false)

/** Test-mode config (pipeline_model.py test section + tester.py):
  * run the pipeline against fixture input and diff the result with an
  * expected dataset, ignoring volatile control columns.
  */
final case class TestSpec(
    sourcePath: String,
    expectedPath: String,
    expectedFormat: String = "parquet")

/** Pipeline steps (core/steps + engines/&lt;engine&gt;/steps.py). Sealed so the
  * runner's match is exhaustive — adding a step type is a compile error
  * until every engine handles it (drune finds out at runtime).
  */
sealed trait Step
/** Silver transform (spark/steps/transformer.py:418-431): ONE select()
  * projection for all columns — a single codegen stage, vs per-column
  * withColumn chains which grow the plan linearly.
  */
final case class Transform(
    columns: Seq[ColumnSpec],
    primaryKey: Seq[String] = Nil,
    addControlColumns: Boolean = false) extends Step
/** Row filter (duckdb/steps.py FilterStep). */
final case class Filter(where: String) extends Step
/** Join against another registered source (duckdb/steps.py JoinStep).
  * `broadcastOther=true` hints the dimension side — at 100 TB a missed
  * broadcast on a small dim is a full shuffle of the fact table.
  */
final case class Join(
    other: String,
    on: Seq[String] = Nil,
    how: String = "inner",
    broadcastOther: Boolean = false,
    condition: Option[String] = None) extends Step
/** Pivot (pandas/steps.py PivotStep): groupBy(index).pivot(col).agg. */
final case class Pivot(
    index: Seq[String],
    pivotColumn: String,
    valueColumn: String,
    agg: String = "sum",
    values: Seq[String] = Nil) extends Step
/** Free-form SQL over registered views; result becomes view `viewName`
  * for later steps (spark_engine.py execute_gold_transformation).
  */
final case class Sql(sql: String, viewName: String = "") extends Step
/** Final target projection (pipeline_model.py TargetSpec.schema:
  * `inherits` with `exclude` drops carried columns; extra `columns`
  * are appended — expression-backed or NULL-typed placeholders).
  */
final case class TargetProject(
    exclude: Seq[String] = Nil,
    add: Seq[ColumnSpec] = Nil) extends Step
/** Validation step (spark/steps/validator.py): single-pass rule
  * evaluation; see graft.quality.Validator for the scale notes.
  */
final case class Validate(
    columns: Seq[ColumnSpec] = Nil,
    tableRules: Seq[TableRule] = Nil,
    /** Append warn-rule failures here (validator.py validation_log_table). */
    logPath: Option[String] = None) extends Step

/** LLM-pipeline steps (graft extension; YAML `dedup:`/`curate:`/
  * `pack:`/`mixture:`) — the declarative face of the corpus operators
  * in [[graft.operators]]. The reference is a declarative framework;
  * these make graft's training-data family configurable the same way
  * its relational steps are.
  */
/** Duplicate removal: `exact` keeps the min-id row per normalized-text
  * fingerprint ([[graft.operators.Dedup.exact]]); `minhash` resolves
  * MinHash/LSH near-dup groups and keeps each group's min id
  * ([[graft.operators.Dedup.minhashLsh]]/`nearDupGroups`). Both FILTER
  * the flowing frame — all its columns survive.
  */
final case class DedupStep(
    method: String = "exact",
    idCol: String = "doc_id",
    textCol: String = "text",
    threshold: Double = 0.8,
    /** `nearDupGroups` tuning (minhash only): pair count at or below
      * which components resolve in the driver union-find, and the
      * label-propagation round cap above it — YAML `local_max_pairs` /
      * `max_iters`, so a 100 TB run can move the route cut without a
      * code change.
      */
    localMaxPairs: Long = 500000L,
    maxIters: Int = 20) extends Step
/** Corpus curation ([[graft.operators.Curation.curate]] /
  * `curateNearDup` when `nearDup`): quality gate + language filter +
  * exact-dup keeper (+ LSH near-dup group resolution). Projects to the
  * operator's (doc_id, n_tokens, lang_pred) shape.
  */
final case class CurateStep(
    idCol: String = "doc_id",
    textCol: String = "text",
    minTokens: Long = 20,
    maxTokens: Long = 1000000,
    langs: Seq[String] = Nil,
    nearDup: Boolean = false,
    threshold: Double = 0.8,
    // true = FILTER semantics (survivors keep every flowing column,
    // mid-chain composable); false = the curation report shape
    // (id, n_tokens, lang_pred — q39's oracle contract)
    keepColumns: Boolean = false) extends Step
/** Training-sequence packing ([[graft.operators.Packing.sequencePack]]):
  * (id, n_tokens, bin, bin_offset) via the distributed two-pass prefix
  * sum.
  */
final case class PackStep(
    seqLen: Long,
    idCol: String = "doc_id",
    textCol: String = "text",
    lengthCol: Option[String] = None) extends Step
/** Domain-mixture resampling ([[graft.operators.Curation.mixtureSample]]):
  * integer-rate hash thinning to the target domain weights.
  */
final case class MixtureStep(
    targets: Seq[(String, Long)],
    idCol: String = "doc_id",
    domainCol: String = "lang") extends Step
/** Sliding-window chunking with overlap
  * ([[graft.operators.Curation.chunkOverlap]]): REPLACES the flowing
  * frame with (idCol, chunk_idx, chunk) — the RAG / context-window
  * prep step.
  */
final case class ChunkStep(
    windowTokens: Int,
    strideTokens: Int,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** Span-level dedup transform ([[graft.operators.Dedup
  * .removeDuplicatedSpans]]): characters covered by cross-document
  * duplicated length-`window` substrings are CUT from `textCol` (the
  * exact-substring dedup transformation); every other column flows
  * through. `hashed` defaults true — the 8-byte-key shuffle shape for
  * pipelines; flip false for the byte-exact gram keys.
  */
final case class SpanDedupStep(
    window: Int = 50,
    minDocs: Int = 2,
    hashed: Boolean = true,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** Incremental span scoring ([[graft.operators.IncrementalDedup
  * .spanDelta]]): join each flowing doc's duplicated-span coverage
  * (vs the persisted gram STORE at `store` + the batch itself) as
  * `dup_chars` / `dup_frac` columns; `admit: true` also appends the
  * batch's new grams to the store (the ingest-pipeline shape). The
  * store must exist (initGramStore) — its pinned window/key-mode
  * params govern.
  */
final case class SpanScoreStep(
    store: String,
    admit: Boolean = false,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** Vocabulary builder ([[graft.operators.TextAnalysis.vocab]]):
  * REPLACES the flowing frame with (tok, term_count, doc_freq) — the
  * word-frequency table tokenizer training starts from.
  */
final case class VocabStep(
    topK: Int = 100,
    minDocFreq: Long = 2,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** LM quality scoring ([[graft.operators.NgramLm]]): train a bigram
  * LM on the registered REFERENCE table (resolved via `spark.table`,
  * CCNet's "score the raw corpus under a clean-corpus LM" shape,
  * pruned to `minCount`), then join each flowing doc's
  * `n_bigrams` / `n_found` / `sum_p_micro` columns — a later filter
  * step thresholds the OOV rate or mean probability.
  */
final case class LmScoreStep(
    refTable: String,
    minCount: Long = 2L,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** BPE token counting ([[graft.operators.BpeTrainer]]): train
  * `steps` merges on the registered REFERENCE table, then append each
  * flowing doc's `n_bpe_tokens` (and `n_words`) as one projection —
  * the token-budget input under a real learned tokenizer.
  */
final case class BpeCountStep(
    refTable: String,
    steps: Int = 64,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** Benchmark decontamination against a registered eval table
  * (resolved via `spark.table`, like `join`'s right side). `drop`
  * FILTERS flagged docs out of the flowing frame (the production
  * posture); `flag` replaces it with
  * [[graft.operators.Curation.decontaminate]]'s per-doc report;
  * `score` with [[graft.operators.Curation.contaminationScore]]'s
  * overlap-fraction report.
  */
final case class DecontaminateStep(
    evalTable: String,
    mode: String = "drop",
    n: Int = 8,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** Leakage-safe train/eval split
  * ([[graft.operators.Curation.leakageSplit]]): APPENDS group_id and
  * split columns to the flowing frame; duplicate groups come from the
  * exact fingerprint (`exact`) or the MinHash-LSH + Jaccard-verify
  * chain (`minhash`), so group members never straddle the split.
  */
final case class SplitStep(
    trainPct: Int = 90,
    method: String = "exact",
    threshold: Double = 0.8,
    idCol: String = "doc_id",
    textCol: String = "text") extends Step
/** Deterministic global shuffle for trainer export
  * ([[graft.operators.Curation.shardAssign]]): APPENDS shard +
  * sort_key; the sink repartitions by shard and sorts within
  * partitions only.
  */
final case class ShardStep(
    nShards: Int,
    idCol: String = "doc_id") extends Step

final case class PipelineSpec(
    name: String,
    sources: Seq[SourceSpec],
    steps: Seq[Step],
    sink: Option[SinkSpec] = None,
    description: Option[String] = None,
    /** Catalog table receiving warn-rule failures (drune
      * validation_log_table); created by the DDL layer. */
    validationLogTable: Option[String] = None,
    /** Test-mode fixtures (`drune test`). */
    test: Option[TestSpec] = None) {
  /** The silver transform carrying the column spec + PK, if any. */
  def transformStep: Option[Transform] =
    steps.collectFirst { case t: Transform => t }
}
