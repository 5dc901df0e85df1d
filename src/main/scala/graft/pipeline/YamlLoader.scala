package graft.pipeline

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._
import graft.quality._

/** YAML front-end: parses a drune-style pipeline document into the
  * typed `PipelineSpec` ADT, so existing reference pipelines port with
  * minimal edits (reference: docs/configuration.md + examples/
  * pipelines/customer/model.yml; models in core/models/
  * pipeline_model.py).
  *
  * Supported keys: `pipeline_name`, `description`, `sources` (name/
  * type/format/path/query/options + `schema.columns` with from/type/
  * format/expression/optional/try_cast/constraints), `steps` (filter/
  * join/pivot/sql/transform/validate), `target` (path/table/format/
  * mode/partition_by/scd), `validation_log_table`, `test`
  * (source_data.path + expected_results_data.path). Constraint strings
  * use drune's rule grammar: `not_null`, `unique`, `pattern:<re>`,
  * `isin:[a,b]`, `greater_than_or_equal_to:<v>`,
  * `less_than_or_equal_to:<v>`, `isbetween:[lo,hi]`, `min_length:<n>`.
  *
  * Project-level defaults (core/pipeline.py:194-238): pass the
  * `ProjectDefaults` resolved from a drune.yml — `${var}`/`{var}`
  * placeholders substitute for DECLARED vars only (the `{col}`
  * expression placeholder is untouched), per-type column defaults fill
  * unset format/try_cast/expression, and source/target kind defaults
  * fill unset format/mode/options. Explicit pipeline values always win.
  */
object YamlLoader {

  def load(yaml: String): PipelineSpec = load(yaml, ProjectDefaults.empty)

  def load(yaml: String, defaults: ProjectDefaults): PipelineSpec = {
    // Vars substitute textually before parsing, so they work in paths,
    // SQL, expressions and table names alike. Only declared var names
    // are replaced — `{col}` survives for the expression placeholder.
    val substituted = defaults.vars.foldLeft(yaml) { case (y, (k, v)) =>
      y.replace(s"$${$k}", v).replace(s"{$k}", v)
    }
    val root = new org.yaml.snakeyaml.Yaml()
      .load[JMap[String, Object]](substituted).asScala.toMap
    val name = str(root, "pipeline_name").getOrElse("pipeline")

    // A pipeline document may carry its own `defaults:` block
    // (pipeline_model.py PipelineDefaults) — more specific than the
    // project's, so it wins the merge.
    val eff = root.get("defaults").map(asMap)
      .map(m => defaults.merged(ProjectConfig.parseDefaults(m).copy(vars = Map.empty, paths = Map.empty)))
      .getOrElse(defaults)

    val sources = root.get("sources").toSeq.flatMap(asList)
      .map(m => parseSource(asMap(m), eff))

    // drune puts the silver column spec under sources[i].schema.columns;
    // these columns (and the PK) feed both the implicit transform and
    // any explicit transform/validate step that names no columns of its
    // own (reference ValidateStep iterates config.columns).
    val schemaSpec = root.get("sources").toSeq.flatMap(asList).headOption
      .map(asMap).flatMap(_.get("schema")).map(asMap)
    val srcColumns = schemaSpec.flatMap(_.get("columns")).map(asList)
      .map(_.map(c => applyTypeDefaults(parseColumn(asMap(c)), eff)).toSeq)
      .getOrElse(Nil)
    val pk = schemaSpec.flatMap(_.get("primary_key")).map(asList)
      .map(_.map(_.toString).toSeq).getOrElse(Nil)

    val steps = root.get("steps").toSeq.flatMap(asList)
      .map(m => parseStep(asMap(m), srcColumns, pk))

    // Implicit steps mirror drune's fixed read→transform→validate
    // order: added only when no explicit step of that kind exists.
    val implicitTransform =
      if (srcColumns.nonEmpty && !steps.exists(_.isInstanceOf[Transform]))
        Seq(Transform(srcColumns, pk, addControlColumns = pk.nonEmpty))
      else Nil
    val implicitValidate =
      if (srcColumns.nonEmpty && !steps.exists(_.isInstanceOf[Validate]))
        Seq(Validate(srcColumns))
      else Nil

    // target.schema (pipeline_model.py TargetSpec.schema): inherits/
    // exclude + extra columns become a final TargetProject step;
    // schema-level partition_by feeds the sink when the target itself
    // declares none. Exclusions name SOURCE-file columns — map them
    // through the silver rename (from → name) before dropping.
    val targetSchema = root.get("target").map(asMap).flatMap(_.get("schema")).map(asMap)
    val targetStep = targetSchema.toSeq.flatMap { ts =>
      val excludeFrom = ts.get("inherits").toSeq.flatMap(asList).map(asMap)
        .flatMap(_.get("exclude").toSeq.flatMap(asList).map(_.toString))
      val excl = excludeFrom.map(e =>
        srcColumns.find(c => c.sourceName == e || c.name == e).map(_.name).getOrElse(e))
      val add = ts.get("columns").toSeq.flatMap(asList).map(c => parseColumn(asMap(c)))
      if (excl.isEmpty && add.isEmpty) Nil else Seq(TargetProject(excl.toSeq, add.toSeq))
    }
    val schemaPartitions = targetSchema.flatMap(_.get("partition_by")).map(asList)
      .map(_.map(_.toString).toSeq).getOrElse(Nil)

    val sink = root.get("target").map(asMap).map(m => parseSink(m, eff))
      .map(s => if (s.partitionBy.isEmpty) s.copy(partitionBy = schemaPartitions) else s)
    PipelineSpec(name, sources.toSeq,
      (implicitTransform ++ implicitValidate ++ steps ++ targetStep).toSeq, sink,
      str(root, "description"),
      validationLogTable = str(root, "validation_log_table"),
      test = root.get("test").map(asMap).map(parseTest))
  }

  /** Load a reference-layout pipeline DIRECTORY: `model.yml` holds the
    * document; an optional `steps.yml` holds only a `steps:` list that
    * appends to the model's (reference examples/pipelines/<name>/
    * layout, loaded by core/pipeline.py). The two documents are merged
    * at the YAML level, then parsed as one.
    */
  def loadDirectory(dir: String, defaults: ProjectDefaults = ProjectDefaults.empty): PipelineSpec = {
    import java.nio.file.{Files, Paths}
    def read(n: String): Option[String] = {
      val p = Paths.get(dir, n)
      if (Files.exists(p)) Some(Files.readString(p)) else None
    }
    val model = read("model.yml").orElse(read("model.yaml"))
      .getOrElse(throw new IllegalArgumentException(s"no model.yml under $dir"))
    val steps = read("steps.yml").orElse(read("steps.yaml"))
      // steps.yml's `steps:` block concatenates under the model doc —
      // snakeyaml keeps the last duplicate key, so indent-splice the
      // list by parsing both and re-serializing is avoided: the model
      // examples carry no steps of their own, but merge defensively.
      .map { st =>
        val y = new org.yaml.snakeyaml.Yaml()
        val modelMap = y.load[JMap[String, Object]](model)
        val stepsMap = y.load[JMap[String, Object]](st)
        // A bare `steps:` key (all steps commented out) maps to null —
        // getOrDefault returns the mapped null and Map.merge rejects
        // null values with an NPE, so normalize to an empty list first.
        val stepList = Option(stepsMap.get("steps"))
          .getOrElse(new java.util.ArrayList[Object]())
        modelMap.merge("steps", stepList,
          (a, b) => { val l = new java.util.ArrayList[Object](a.asInstanceOf[JList[Object]]);
            l.addAll(b.asInstanceOf[JList[Object]]); l })
        y.dump(modelMap)
      }
      .getOrElse(model)
    load(steps, defaults)
  }

  /** Load a pipeline alongside its project config (drune.py:18-43):
    * resolve the project profile, then parse with merged defaults.
    */
  def loadWithProject(pipelineYaml: String, projectYaml: String,
                      profile: Option[String] = None): PipelineSpec =
    load(pipelineYaml, ProjectConfig.load(projectYaml).resolved(profile))

  /** Fill unset column fields from the per-type defaults
    * (pipeline_model.py _apply_type_defaults_to_column:147-157); the
    * lookup key is the DRUNE type name, which mapType normalized — so
    * match on either spelling.
    */
  private def applyTypeDefaults(c: ColumnSpec, defaults: ProjectDefaults): ColumnSpec =
    c.dataType.flatMap(dt =>
        defaults.types.get(dt).orElse(defaults.types.find(t => mapType(t._1) == dt).map(_._2))) match {
      case None => c
      case Some(d) => c.copy(
        format = c.format.orElse(d.format),
        tryCast = c.tryCast || d.tryCast,
        expression = c.expression.orElse(d.expression))
    }

  private def parseSource(m: Map[String, Object], defaults: ProjectDefaults): SourceSpec = {
    val name = str(m, "name").getOrElse("source")
    str(m, "type").getOrElse("file") match {
      case "sql" | "query" => SqlSource(name, str(m, "query").getOrElse(
        throw new IllegalArgumentException(
          s"sql source '$name': a 'query' param is required (an empty query " +
            "used to slip through and fail later as a bare parse error)")))
      case "table" => TableSource(name, str(m, "table_name").orElse(str(m, "table")).getOrElse(name))
      case "versioned" =>
        // the missing-path check must precede resolvePath (an empty
        // path would surface as a context-free Hadoop error from deep
        // inside the manifest read); the version/since_version
        // exclusivity invariant lives on the case class itself
        val vPath = resolvePath(str(m, "path").getOrElse(throw new IllegalArgumentException(
          s"versioned source '$name': path is required (the table's storage root)")),
          defaults, "sources")
        VersionedSource(name, vPath, str(m, "format").getOrElse("parquet"),
          str(m, "version").map(_.toLong), str(m, "since_version").map(_.toLong))
      case kind =>
        val d = defaults.sources.getOrElse(kind, SourceDefault())
        val opts = m.get("options").map(asMap).getOrElse(Map.empty)
          .map { case (k, v) => k -> normalizeOption(k, v.toString) }
        FileSource(name, resolvePath(str(m, "path").getOrElse(""), defaults, "sources"),
          str(m, "format").orElse(d.format).getOrElse("parquet"),
          d.options ++ opts,
          str(m, "expected_columns").map(_.toInt))
    }
  }

  /** drune's pandas-backed examples write `header: 0` meaning "the
    * header is AT row 0" (pandas read_csv semantics) — Spark's csv
    * reader wants a boolean. Translate the pandas spelling; booleans
    * pass through.
    */
  private def normalizeOption(key: String, value: String): String =
    if (key.equalsIgnoreCase("header") && value == "0") "true" else value

  /** Relative file paths resolve against the project's `paths` layout
    * (core/pipeline.py:119-141 joins project_dir / paths.sources /
    * path); absolute paths and pathless specs pass through.
    */
  private def resolvePath(path: String, defaults: ProjectDefaults, kind: String): String =
    defaults.paths.get(kind) match {
      case Some(base) if path.nonEmpty && !java.nio.file.Paths.get(path).isAbsolute =>
        java.nio.file.Paths.get(base, path).toString
      case _ => path
    }

  private def parseColumn(m: Map[String, Object]): ColumnSpec = {
    val constraints = m.get("constraints").toSeq.flatMap(asList).flatMap { c =>
      val cm = asMap(c)
      val onFail = str(cm, "on_fail").getOrElse("fail") match {
        case "drop" => DropAction
        case "warn" => WarnAction
        case "set_null" => SetNullAction
        case _ => FailAction
      }
      // drune's rule grammar chains functions with '|' in ONE string
      // (utils/parsers.py parse_function_string): "not_null|min_length:3"
      // is two rules sharing the on_fail action.
      splitRules(str(cm, "rule").getOrElse("not_null"))
        .map(r => Constraint(parseRule(r), onFail))
    }
    ColumnSpec(
      name = str(m, "name").getOrElse(""),
      from = str(m, "from"),
      dataType = str(m, "type").map(mapType),
      expression = str(m, "expression"),
      optional = bool(m, "optional"),
      tryCast = bool(m, "try_cast"),
      description = str(m, "description"),
      constraints = constraints.toSeq,
      format = str(m, "format"))
  }

  /** drune type names → Spark SQL types (engines apply their own
    * mapping; pandas uses 'str'/'int' etc).
    */
  private def mapType(t: String): String = t match {
    case "str" => "string"
    case "int" => "bigint"
    case "float" => "double"
    case "bool" => "boolean"
    case other => other
  }

  /** Quote-aware split on '|' (utils/parsers.py split_with_quotes):
    * a '|' inside a quoted parameter — e.g. a regex alternation in
    * `pattern:"a|b"` — does not separate rules.
    */
  private[pipeline] def splitRules(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote == 0 && (ch == '"' || ch == '\'')) quote = ch
      else if (ch == quote) quote = 0
      else if (ch == '|' && quote == 0) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Rule grammar `name[:param]` (utils/parsers.py parse_function_string,
    * simplified to the forms the reference examples use).
    */
  private[pipeline] def parseRule(rule: String): Rule = {
    // Strip one layer of EITHER quote style — splitRules honors single
    // quotes too, and leaving them on (e.g. pattern:'^a$') would embed
    // literal apostrophes in the regex so nothing ever matches.
    def unquote(s: String): String =
      if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
        s.substring(1, s.length - 1)
      else s
    val (name, param) = rule.split(":", 2) match {
      case Array(n) => (n.trim, "")
      case Array(n, p) => (n.trim, unquote(p.trim))
    }
    def nums = param.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toDouble)
    name match {
      case "not_null" => NotNull
      case "unique" => Unique
      case "pattern" => Pattern(param)
      case "isin" => IsIn(param.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("'").stripSuffix("'")).toSeq)
      case "greater_than_or_equal_to" => Gte(param.toDouble)
      case "less_than_or_equal_to" => Lte(param.toDouble)
      case "isbetween" => Between(nums(0), nums(1))
      case "min_length" => MinLength(param.toInt)
      case other => throw new IllegalArgumentException(s"unknown rule '$other'")
    }
  }

  /** Explicit steps. A `transform`/`validate` step with no columns of
    * its own operates on the source schema columns — drune's semantics,
    * where TransformStep/ValidateStep always read config.columns
    * (transformer.py:64-77, validator.py:30-124).
    */
  private def parseStep(m: Map[String, Object], srcColumns: Seq[ColumnSpec], pk: Seq[String]): Step = {
    val params = m.get("params").map(asMap).getOrElse(Map.empty)
    str(m, "type").getOrElse("") match {
      case "filter" => Filter(str(params, "where").getOrElse("true"))
      case "join" => Join(
        other = str(params, "other").getOrElse(""),
        on = params.get("on").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
        how = str(params, "how").getOrElse("inner"),
        broadcastOther = bool(params, "broadcast"),
        condition = str(params, "condition"))
      case "sql" => Sql(
        // A missing query is a config error, not `SELECT 1` — fail at
        // load time like the unknown-step case (the reference's pandas
        // PivotStep models the same fail-fast pattern for params).
        str(params, "sql").getOrElse(throw new IllegalArgumentException(
          "sql step requires a 'sql' param")),
        str(params, "view").getOrElse(""))
      case "pivot" => Pivot(
        index = params.get("index").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
        pivotColumn = str(params, "columns").getOrElse(""),
        valueColumn = str(params, "values").getOrElse(""),
        agg = str(params, "agg").getOrElse("sum"),
        // graft extension: declaring the output columns up front skips
        // the distinct-scan job Spark otherwise runs to discover them
        // (one full pass saved — at 100 TB, the difference between one
        // scan and two).
        values = params.get("pivot_values").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil))
      case "validate" => Validate(
        columns = srcColumns,
        tableRules = params.get("duplicate_check").map(asList)
          .map(cols => Seq[TableRule](DuplicateCheck(cols.map(_.toString).toSeq))).getOrElse(Nil),
        logPath = str(params, "log_path"))
      case "transform" => Transform(srcColumns, pk, addControlColumns = pk.nonEmpty)
      // LLM-pipeline step kinds (graft extension): the declarative
      // face of the corpus operators — see model.scala's Scaladoc.
      case "dedup" => DedupStep(
        method = str(params, "method").getOrElse("exact") match {
          case m @ ("exact" | "minhash") => m
          case m => throw new IllegalArgumentException(
            s"dedup step: unknown method '$m' (exact | minhash)")
        },
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"),
        threshold = str(params, "threshold").map(_.toDouble).getOrElse(0.8),
        localMaxPairs = str(params, "local_max_pairs").map(_.toLong).getOrElse(500000L),
        maxIters = str(params, "max_iters").map(_.toInt).getOrElse(20))
      case "curate" => CurateStep(
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"),
        minTokens = str(params, "min_tokens").map(_.toLong).getOrElse(20L),
        maxTokens = str(params, "max_tokens").map(_.toLong).getOrElse(1000000L),
        langs = params.get("langs").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
        nearDup = bool(params, "near_dup"),
        threshold = str(params, "threshold").map(_.toDouble).getOrElse(0.8),
        keepColumns = bool(params, "keep_columns"))
      case "pack" => PackStep(
        seqLen = str(params, "seq_len").map(_.toLong).getOrElse(
          throw new IllegalArgumentException("pack step requires a 'seq_len' param")),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"),
        // pack by a precomputed per-doc length column (e.g. an
        // upstream bpe_count step's n_bpe_tokens) instead of the
        // whitespace token count
        lengthCol = str(params, "length_col"))
      case "mixture" => MixtureStep(
        // `targets: {en: 60, de: 40}` — sorted by domain for a
        // deterministic spec regardless of YAML map iteration order
        targets = params.get("targets").map(asMap).map(
          _.toSeq.map { case (k, v) => k -> v.toString.toLong }.sortBy(_._1)).getOrElse(
            throw new IllegalArgumentException(
              "mixture step requires a 'targets' map of domain -> integer weight")),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        domainCol = str(params, "domain_col").getOrElse("lang"))
      case "chunk" => ChunkStep(
        windowTokens = str(params, "window_tokens").map(_.toInt).getOrElse(
          throw new IllegalArgumentException("chunk step requires a 'window_tokens' param")),
        strideTokens = str(params, "stride_tokens").map(_.toInt).getOrElse(
          throw new IllegalArgumentException("chunk step requires a 'stride_tokens' param")),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "span_dedup" => SpanDedupStep(
        window = str(params, "window").map(_.toInt).getOrElse(50),
        minDocs = str(params, "min_docs").map(_.toInt).getOrElse(2),
        hashed = str(params, "hashed").forall(_.toBoolean),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "span_score" => SpanScoreStep(
        store = str(params, "store").getOrElse(
          throw new IllegalArgumentException(
            "span_score step requires a 'store' param (the gram-store root)")),
        admit = str(params, "admit").exists(_.toBoolean),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "vocab" => VocabStep(
        topK = str(params, "top_k").map(_.toInt).getOrElse(100),
        minDocFreq = str(params, "min_doc_freq").map(_.toLong).getOrElse(2L),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "lm_score" => LmScoreStep(
        refTable = str(params, "ref_table").getOrElse(
          throw new IllegalArgumentException(
            "lm_score step requires a 'ref_table' param (the reference corpus)")),
        minCount = str(params, "min_count").map(_.toLong).getOrElse(2L),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "bpe_count" => BpeCountStep(
        refTable = str(params, "ref_table").getOrElse(
          throw new IllegalArgumentException(
            "bpe_count step requires a 'ref_table' param (the reference corpus)")),
        steps = str(params, "merges").map(_.toInt).getOrElse(64),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "decontaminate" => DecontaminateStep(
        evalTable = str(params, "eval_table").getOrElse(
          throw new IllegalArgumentException("decontaminate step requires an 'eval_table' param")),
        mode = str(params, "mode").getOrElse("drop") match {
          case m @ ("drop" | "flag" | "score") => m
          case m => throw new IllegalArgumentException(
            s"decontaminate step: unknown mode '$m' (drop | flag | score)")
        },
        n = str(params, "ngram").map(_.toInt).getOrElse(8),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "split" => SplitStep(
        trainPct = str(params, "train_pct").map(_.toInt).getOrElse(90),
        method = str(params, "method").getOrElse("exact") match {
          case m @ ("exact" | "minhash") => m
          case m => throw new IllegalArgumentException(
            s"split step: unknown method '$m' (exact | minhash)")
        },
        threshold = str(params, "threshold").map(_.toDouble).getOrElse(0.8),
        idCol = str(params, "id_col").getOrElse("doc_id"),
        textCol = str(params, "text_col").getOrElse("text"))
      case "shard" => ShardStep(
        nShards = str(params, "n_shards").map(_.toInt).getOrElse(
          throw new IllegalArgumentException("shard step requires an 'n_shards' param")),
        idCol = str(params, "id_col").getOrElse("doc_id"))
      case other => throw new IllegalArgumentException(s"unknown step type '$other'")
    }
  }

  private def parseSink(m: Map[String, Object], defaults: ProjectDefaults): SinkSpec = {
    val kind = str(m, "type").getOrElse("file")
    val d = defaults.targets.getOrElse(kind, TargetDefault())
    val mode = str(m, "mode").orElse(d.mode).getOrElse("append") match {
      case "overwrite" => Overwrite
      case "merge" => MergeUpsert
      case "overwrite_partition" => OverwritePartition
      case "overwrite_where" => OverwriteWhere(str(m, "overwrite_condition").getOrElse("true"))
      case _ => Append
    }
    SinkSpec(
      path = resolvePath(str(m, "path").getOrElse(""), defaults, "targets"),
      format = str(m, "format").orElse(d.format).getOrElse("parquet"),
      mode = if (m.contains("scd")) Scd2() else mode,
      partitionBy = m.get("partition_by").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
      table = str(m, "table").orElse(str(m, "name")).filter(_ => kind == "table"),
      zorderBy = m.get("zorder_by").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
      versioned = bool(m, "versioned"),
      zorderFiles = str(m, "zorder_files").map { v =>
        // fail-fast with the offending key and sink named, mirroring the
        // loader's other diagnostics — a raw NumberFormatException (or a
        // stringified YAML list) would surface with no YAML context
        try v.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"sink '${str(m, "path").orElse(str(m, "table")).orElse(str(m, "name"))
              .getOrElse(kind)}': zorder_files must be an integer file count, got '$v'")
        }
      }.getOrElse(64),
      materialized = m.get("materialized").map(asMap).map(parseMaterialized),
      mergeSchema = bool(m, "merge_schema"))
  }

  /** `materialized:` block on a target — group_by list + aggregates
    * (name/kind, optional expr; count ignores expr). Running the
    * pipeline then performs one incremental [[MaterializedAgg]]
    * refresh of the sink path from the single versioned source.
    */
  private def parseMaterialized(m: Map[String, Object]): MaterializedSpec = {
    val groupBy = m.get("group_by").map(asList).map(_.map(_.toString).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "materialized target: group_by is required"))
    val aggs = m.get("aggregates").map(asList).map(_.map(a => {
      val am = asMap(a.asInstanceOf[Object])
      MaterializedAgg.MAgg(
        str(am, "name").getOrElse(throw new IllegalArgumentException(
          "materialized aggregate: name is required")),
        str(am, "expr").getOrElse(""),
        str(am, "kind").getOrElse(throw new IllegalArgumentException(
          "materialized aggregate: kind is required (count|sum|min|max|avg|ndv)")))
    }).toSeq).getOrElse(throw new IllegalArgumentException(
      "materialized target: aggregates list is required"))
    MaterializedSpec(groupBy, aggs)
  }

  /** Test section (pipeline_model.py test + tester.py:18-31). */
  private def parseTest(m: Map[String, Object]): TestSpec = {
    val src = m.get("source_data").map(asMap).getOrElse(Map.empty)
    val exp = m.get("expected_results_data").map(asMap).getOrElse(Map.empty)
    TestSpec(
      sourcePath = str(src, "path").getOrElse(""),
      expectedPath = str(exp, "path").orElse(str(exp, "table")).getOrElse(""),
      expectedFormat = str(exp, "format").getOrElse("parquet"))
  }

  private def str(m: Map[String, Object], k: String): Option[String] =
    Option(m.getOrElse(k, null)).map(_.toString).filter(_.nonEmpty)
  private def bool(m: Map[String, Object], k: String): Boolean =
    Option(m.getOrElse(k, null)).exists(_.toString.toBoolean)
  private def asMap(o: Object): Map[String, Object] =
    o.asInstanceOf[JMap[String, Object]].asScala.toMap
  private def asList(o: Object): Seq[Object] =
    o.asInstanceOf[JList[Object]].asScala.toSeq
}
