package graft

import graft.pipeline.{Pipeline, YamlLoader}

/** Minimal CLI — graft's equivalent of drune's `drune run <pipeline>`
  * (reference: src/drune/cli/main.py): load a YAML pipeline spec and
  * run it on a local session.
  *
  * Usage: graft.Cli run /path/to/pipeline.yml [--cores N]
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "run" :: path :: rest =>
      val cores = rest.sliding(2).collectFirst { case List("--cores", n) => n.toInt }
        .getOrElse(Runtime.getRuntime.availableProcessors())
      val spark = GraftSession.local(cores)
      spark.sparkContext.setLogLevel("WARN")
      try {
        val spec = YamlLoader.load(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
        val out = Pipeline(spark, spec).run()
        println(s"[graft] pipeline '${spec.name}' finished; ${out.columns.length} output columns")
      } finally spark.stop()
    case _ =>
      System.err.println("usage: graft.Cli run <pipeline.yml> [--cores N]")
      sys.exit(2)
  }
}
