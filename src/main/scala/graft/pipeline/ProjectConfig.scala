package graft.pipeline

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

/** Project-level configuration — graft's equivalent of drune's
  * `drune.yml` + ProjectModel + defaults merging (reference:
  * core/drune.py:18-60, core/models/project_model.py:19-84,
  * core/models/defaults_model.py:4-30, core/pipeline.py:194-238).
  *
  * A project document declares global defaults (per-type column
  * defaults, per-kind source/target defaults, vars) and named profiles
  * whose overrides deep-merge ON TOP of the defaults; the resolved
  * defaults then merge into every pipeline a gap at a time — an
  * explicit pipeline value always wins over a default.
  */

/** Per-data-type column defaults (defaults_model.py TypeDefault). */
final case class TypeDefault(
    format: Option[String] = None,
    tryCast: Boolean = false,
    expression: Option[String] = None)

/** Per-kind source defaults (defaults_model.py SourceDefault). */
final case class SourceDefault(
    format: Option[String] = None,
    options: Map[String, String] = Map.empty)

/** Per-kind target defaults (defaults_model.py TargetDefault). */
final case class TargetDefault(
    format: Option[String] = None,
    mode: Option[String] = None,
    options: Map[String, String] = Map.empty)

final case class ProjectDefaults(
    vars: Map[String, String] = Map.empty,
    types: Map[String, TypeDefault] = Map.empty,
    sources: Map[String, SourceDefault] = Map.empty,
    targets: Map[String, TargetDefault] = Map.empty,
    /** Project directory layout (project_model.py Paths): keys
      * `sources`/`targets`/`pipelines`; relative pipeline file paths
      * resolve against these (core/pipeline.py:119-141).
      */
    paths: Map[String, String] = Map.empty) {

  /** Deep merge: `other`'s set fields win (project_model.py
    * deep_merge_dicts — override takes precedence, key-wise).
    */
  def merged(other: ProjectDefaults): ProjectDefaults = ProjectDefaults(
    vars = vars ++ other.vars,
    paths = paths ++ other.paths,
    types = mergeMap(types, other.types)((b, o) => TypeDefault(
      o.format.orElse(b.format), o.tryCast || b.tryCast, o.expression.orElse(b.expression))),
    sources = mergeMap(sources, other.sources)((b, o) => SourceDefault(
      o.format.orElse(b.format), b.options ++ o.options)),
    targets = mergeMap(targets, other.targets)((b, o) => TargetDefault(
      o.format.orElse(b.format), o.mode.orElse(b.mode), b.options ++ o.options)))

  private def mergeMap[V](base: Map[String, V], over: Map[String, V])(f: (V, V) => V): Map[String, V] =
    (base.keySet ++ over.keySet).map { k =>
      k -> ((base.get(k), over.get(k)) match {
        case (Some(b), Some(o)) => f(b, o)
        case (b, o) => o.orElse(b).get
      })
    }.toMap
}

object ProjectDefaults { val empty: ProjectDefaults = ProjectDefaults() }

final case class ProjectSpec(
    name: String,
    description: Option[String] = None,
    profile: Option[String] = None,
    defaults: ProjectDefaults = ProjectDefaults.empty,
    profiles: Map[String, ProjectDefaults] = Map.empty) {

  /** Defaults with the given (or declared) profile merged on top
    * (project_model.py merge_defaults:59-84).
    */
  def resolved(profileOverride: Option[String] = None): ProjectDefaults = {
    val active = profileOverride.orElse(profile)
    active match {
      case None => defaults
      case Some(p) =>
        val over = profiles.getOrElse(p,
          throw new IllegalArgumentException(s"profile '$p' not found in project '$name'"))
        defaults.merged(over)
    }
  }
}

object ProjectConfig {

  def load(yaml: String): ProjectSpec = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[JMap[String, Object]](yaml).asScala.toMap
    ProjectSpec(
      name = str(root, "project_name").getOrElse("project"),
      description = str(root, "description"),
      profile = str(root, "profile"),
      defaults = root.get("defaults").map(asMap).map(parseDefaults).getOrElse(ProjectDefaults.empty),
      profiles = root.get("profiles").map(asMap).getOrElse(Map.empty)
        .map { case (k, v) => k -> parseDefaults(asMap(v)) })
  }

  private[pipeline] def parseDefaults(m: Map[String, Object]): ProjectDefaults = ProjectDefaults(
    vars = m.get("vars").map(asMap).getOrElse(Map.empty)
      .map { case (k, v) => k -> v.toString },
    paths = m.get("paths").map(asMap).getOrElse(Map.empty)
      .map { case (k, v) => k -> v.toString },
    types = m.get("types").map(asMap).getOrElse(Map.empty).map { case (k, v) =>
      val tm = asMap(v)
      k -> TypeDefault(str(tm, "format"), bool(tm, "try_cast"), str(tm, "expression"))
    },
    sources = m.get("sources").map(asMap).getOrElse(Map.empty).map { case (k, v) =>
      val sm = asMap(v)
      k -> SourceDefault(str(sm, "format"),
        sm.get("options").map(asMap).getOrElse(Map.empty).map { case (ok, ov) => ok -> ov.toString })
    },
    targets = m.get("targets").map(asMap).getOrElse(Map.empty).map { case (k, v) =>
      val tm = asMap(v)
      k -> TargetDefault(str(tm, "format"), str(tm, "mode"),
        tm.get("options").map(asMap).getOrElse(Map.empty).map { case (ok, ov) => ok -> ov.toString })
    })

  private def str(m: Map[String, Object], k: String): Option[String] =
    Option(m.getOrElse(k, null)).map(_.toString).filter(_.nonEmpty)
  private def bool(m: Map[String, Object], k: String): Boolean =
    Option(m.getOrElse(k, null)).exists(_.toString.toBoolean)
  private def asMap(o: Object): Map[String, Object] =
    o.asInstanceOf[JMap[String, Object]].asScala.toMap
}
