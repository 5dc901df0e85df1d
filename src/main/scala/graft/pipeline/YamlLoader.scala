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
  * expression/optional/try_cast/constraints), `steps` (filter/join/
  * pivot/sql/transform/validate), `target` (path/format/mode/
  * partition_by/scd). Constraint strings use drune's rule grammar:
  * `not_null`, `unique`, `pattern:<re>`, `isin:[a,b]`,
  * `greater_than_or_equal_to:<v>`, `less_than_or_equal_to:<v>`,
  * `isbetween:[lo,hi]`, `min_length:<n>`.
  */
object YamlLoader {

  def load(yaml: String): PipelineSpec = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[JMap[String, Object]](yaml).asScala.toMap
    val name = str(root, "pipeline_name").getOrElse("pipeline")

    val sources = root.get("sources").toSeq.flatMap(asList).map(m => parseSource(asMap(m)))
    val steps = root.get("steps").toSeq.flatMap(asList).map(m => parseStep(asMap(m)))

    // drune puts the silver column spec under sources[i].schema.columns;
    // surface the first source's columns as an implicit Transform step
    // when no explicit transform step exists.
    val schemaSpec = root.get("sources").toSeq.flatMap(asList).headOption
      .map(asMap).flatMap(_.get("schema")).map(asMap)
    val srcColumns = schemaSpec.flatMap(_.get("columns")).map(asList)
      .map(_.map(c => parseColumn(asMap(c)))).getOrElse(Nil)
    val pk = schemaSpec.flatMap(_.get("primary_key")).map(asList)
      .map(_.map(_.toString)).getOrElse(Nil)

    val implicitSteps =
      if (srcColumns.nonEmpty && !steps.exists(_.isInstanceOf[Transform]))
        Seq(Transform(srcColumns.toSeq, pk.toSeq, addControlColumns = pk.nonEmpty),
          Validate(srcColumns.toSeq))
      else Nil

    val sink = root.get("target").map(asMap).map(parseSink)
    PipelineSpec(name, sources.toSeq, (implicitSteps ++ steps).toSeq, sink,
      str(root, "description"))
  }

  private def parseSource(m: Map[String, Object]): SourceSpec = {
    val name = str(m, "name").getOrElse("source")
    str(m, "type").getOrElse("file") match {
      case "sql" | "query" => SqlSource(name, str(m, "query").getOrElse(""))
      case "table" => TableSource(name, str(m, "table_name").orElse(str(m, "table")).getOrElse(name))
      case _ =>
        val opts = m.get("options").map(asMap).getOrElse(Map.empty)
          .map { case (k, v) => k -> v.toString }
        FileSource(name, str(m, "path").getOrElse(""),
          str(m, "format").getOrElse("parquet"), opts,
          str(m, "expected_columns").map(_.toInt))
    }
  }

  private def parseColumn(m: Map[String, Object]): ColumnSpec = {
    val constraints = m.get("constraints").toSeq.flatMap(asList).map { c =>
      val cm = asMap(c)
      Constraint(parseRule(str(cm, "rule").getOrElse("not_null")),
        str(cm, "on_fail").getOrElse("fail") match {
          case "drop" => DropAction
          case "warn" => WarnAction
          case "set_null" => SetNullAction
          case _ => FailAction
        })
    }
    ColumnSpec(
      name = str(m, "name").getOrElse(""),
      from = str(m, "from"),
      dataType = str(m, "type").map(mapType),
      expression = str(m, "expression"),
      optional = bool(m, "optional"),
      tryCast = bool(m, "try_cast"),
      description = str(m, "description"),
      constraints = constraints.toSeq)
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

  /** Rule grammar `name[:param]` (utils/parsers.py parse_function_string,
    * simplified to the forms the reference examples use).
    */
  private[pipeline] def parseRule(rule: String): Rule = {
    val (name, param) = rule.split(":", 2) match {
      case Array(n) => (n.trim, "")
      case Array(n, p) => (n.trim, p.trim.stripPrefix("\"").stripSuffix("\""))
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

  private def parseStep(m: Map[String, Object]): Step = {
    val params = m.get("params").map(asMap).getOrElse(Map.empty)
    str(m, "type").getOrElse("") match {
      case "filter" => Filter(str(params, "where").getOrElse("true"))
      case "join" => Join(
        other = str(params, "other").getOrElse(""),
        on = params.get("on").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
        how = str(params, "how").getOrElse("inner"),
        broadcastOther = bool(params, "broadcast"),
        condition = str(params, "condition"))
      case "sql" => Sql(str(params, "sql").getOrElse("SELECT 1"),
        str(params, "view").getOrElse(""))
      case "pivot" => Pivot(
        index = params.get("index").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil),
        pivotColumn = str(params, "columns").getOrElse(""),
        valueColumn = str(params, "values").getOrElse(""),
        agg = str(params, "agg").getOrElse("sum"))
      case "validate" => Validate()
      case "transform" => Transform(Nil)
      case other => throw new IllegalArgumentException(s"unknown step type '$other'")
    }
  }

  private def parseSink(m: Map[String, Object]): SinkSpec = {
    val mode = str(m, "mode").getOrElse("append") match {
      case "overwrite" => Overwrite
      case "merge" => MergeUpsert
      case "overwrite_partition" => OverwritePartition
      case "overwrite_where" => OverwriteWhere(str(m, "overwrite_condition").getOrElse("true"))
      case _ if m.contains("scd") => Scd2()
      case _ => Append
    }
    SinkSpec(
      path = str(m, "path").getOrElse(""),
      format = str(m, "format").getOrElse("parquet"),
      mode = if (m.contains("scd")) Scd2() else mode,
      partitionBy = m.get("partition_by").map(asList).map(_.map(_.toString).toSeq).getOrElse(Nil))
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
