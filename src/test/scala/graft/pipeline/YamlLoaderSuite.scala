package graft.pipeline

import graft.SparkSpec
import graft.quality._
import org.apache.spark.sql.functions._

class YamlLoaderSuite extends SparkSpec {
  import spark.implicits._

  private val yaml =
    """pipeline_name: customer_pipeline
      |description: silver customers
      |sources:
      |  - name: customer_file
      |    type: file
      |    format: csv
      |    path: "__PATH__"
      |    options:
      |      header: "true"
      |    schema:
      |      primary_key: [cd_customer]
      |      columns:
      |        - name: cd_customer
      |          from: customer_id
      |          type: int
      |          constraints:
      |            - rule: "not_null"
      |              on_fail: "warn"
      |            - rule: "unique"
      |              on_fail: "drop"
      |        - name: nm_name
      |          from: name
      |          type: str
      |          expression: upper(trim({col}))
      |        - name: vl_balance
      |          type: float
      |          try_cast: true
      |          constraints:
      |            - rule: "greater_than_or_equal_to:0"
      |              on_fail: "drop"
      |steps:
      |  - name: only_positive_ids
      |    type: filter
      |    params:
      |      where: cd_customer > 0
      |""".stripMargin

  test("drune-style YAML parses into the typed spec") {
    val spec = YamlLoader.load(yaml)
    assert(spec.name == "customer_pipeline")
    assert(spec.sources.head.asInstanceOf[FileSource].format == "csv")
    val t = spec.steps.collectFirst { case t: Transform => t }.get
    assert(t.columns.map(_.name) == Seq("cd_customer", "nm_name", "vl_balance"))
    assert(t.columns.head.constraints.map(_.rule) == Seq(NotNull, Unique))
    assert(t.primaryKey == Seq("cd_customer"))
    assert(spec.steps.exists(_.isInstanceOf[Validate]))
    assert(spec.steps.exists(_.isInstanceOf[Filter]))
  }

  test("yaml pipeline runs end-to-end on a csv source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_yaml")
    val csv = dir.resolve("cust.csv")
    java.nio.file.Files.writeString(csv,
      "customer_id,name,vl_balance\n1, ann ,10.5\n2,bob,-3\n2,bob2,4\n-5,neg,1\n")
    val spec = YamlLoader.load(yaml.replace("__PATH__", csv.toString))
    val out = Pipeline(spark, spec).run().orderBy("cd_customer")
    // drops: negative balance (bob), duplicate ids (both id=2), filter cd>0 (id=-5)
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("cd_customer")).toSeq == Seq(1L))
    assert(rows.head.getAs[String]("nm_name") == "ANN")
    assert(out.columns.contains("hash_key"))
  }

  test("rule grammar parses every reference rule form") {
    assert(YamlLoader.parseRule("pattern:\"^a.*$\"") == Pattern("^a.*$"))
    assert(YamlLoader.parseRule("isin:['A','B']") == IsIn(Seq("A", "B")))
    assert(YamlLoader.parseRule("isbetween:[0, 10]") == Between(0, 10))
    assert(YamlLoader.parseRule("min_length:3") == MinLength(3))
    assert(YamlLoader.parseRule("less_than_or_equal_to:9.5") == Lte(9.5))
    intercept[IllegalArgumentException](YamlLoader.parseRule("bogus:1"))
  }

  test("pipe-chained rule strings split into multiple rules, quotes respected") {
    assert(YamlLoader.splitRules("not_null|min_length:3") == Seq("not_null", "min_length:3"))
    assert(YamlLoader.splitRules("pattern:\"^(a|b)$\"|not_null") ==
      Seq("pattern:\"^(a|b)$\"", "not_null"))
    assert(YamlLoader.splitRules("not_null") == Seq("not_null"))
    val yamlChained =
      """sources:
        |  - name: s
        |    type: file
        |    path: /tmp/x.csv
        |    schema:
        |      columns:
        |        - name: c
        |          type: str
        |          constraints:
        |            - rule: "not_null|min_length:3"
        |              on_fail: warn
        |""".stripMargin
    val t = YamlLoader.load(yamlChained).steps.collectFirst { case t: Transform => t }.get
    assert(t.columns.head.constraints.map(_.rule) == Seq(NotNull, MinLength(3)))
  }

  test("relative source/target paths resolve against project paths layout") {
    val d = ProjectDefaults(paths = Map("sources" -> "/proj/data", "targets" -> "/proj/out"))
    val spec = YamlLoader.load(
      """sources:
        |  - name: s
        |    type: file
        |    path: in/cust.csv
        |target:
        |  name: t
        |  type: file
        |  path: result
        |""".stripMargin, d)
    assert(spec.sources.head.asInstanceOf[FileSource].path == "/proj/data/in/cust.csv")
    assert(spec.sink.get.path == "/proj/out/result")
    // absolute paths pass through untouched
    val abs = YamlLoader.load(
      "sources:\n  - name: s\n    type: file\n    path: /abs/x.csv\n", d)
    assert(abs.sources.head.asInstanceOf[FileSource].path == "/abs/x.csv")
  }

  test("zorder_by sink: parses from YAML and the write round-trips clustered") {
    val spec = YamlLoader.load(
      """sources:
        |  - name: s
        |    type: file
        |    path: /tmp/in.parquet
        |target:
        |  name: t
        |  type: file
        |  path: /tmp/out
        |  zorder_by: [x, y]
        |  zorder_files: 4
        |""".stripMargin)
    assert(spec.sink.get.zorderBy == Seq("x", "y"))
    assert(spec.sink.get.zorderFiles == 4)
    // the write path applies the clustering and loses no rows
    val dir = java.nio.file.Files.createTempDirectory("graft_zsink").toString + "/t"
    val df = spark.range(500L).select(col("id").as("x"), (col("id") * 7 % 501).as("y"))
    Writer.write(spark, df, SinkSpec(dir, mode = Overwrite, zorderBy = Seq("x", "y"), zorderFiles = 4))
    val back = spark.read.parquet(dir)
    assert(back.count() == 500L)
    assert(back.agg(sum("x")).head().getLong(0) == df.agg(sum("x")).head().getLong(0))
  }

  test("zorder_files: a non-numeric value fails naming the key and sink") {
    val e = intercept[IllegalArgumentException] {
      YamlLoader.load(
        """sources:
          |  - name: s
          |    type: file
          |    path: /tmp/in.parquet
          |target:
          |  name: t
          |  type: file
          |  path: /tmp/out
          |  zorder_by: [x]
          |  zorder_files: lots
          |""".stripMargin)
    }
    assert(e.getMessage.contains("zorder_files"))
    assert(e.getMessage.contains("/tmp/out"))
    assert(e.getMessage.contains("lots"))
  }

  test("pipeline test compare: equal, missing and unexpected rows") {
    val a = Seq((1, "x"), (2, "y")).toDF("id", "v")
    assert(PipelineTest.compare(a, a).isEmpty)
    val b = Seq((1, "x"), (3, "z")).toDF("id", "v")
    val d = PipelineTest.compare(a, b)
    assert(d.missing.collect().map(_.getInt(0)).toSeq == Seq(3))
    assert(d.unexpected.collect().map(_.getInt(0)).toSeq == Seq(2))
    // volatile columns ignored
    val withTs = a.withColumn("updated_at", current_timestamp())
    assert(PipelineTest.compare(withTs, a).isEmpty)
  }

  test("explicit validate step carries the schema rules (not a no-op)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_yaml_v")
    val csv = dir.resolve("cust.csv")
    java.nio.file.Files.writeString(csv,
      "customer_id,name,vl_balance\n1,ann,10.5\n2,bob,-3\n")
    val explicit = yaml.replace("__PATH__", csv.toString) +
      "  - name: explicit_validate\n    type: validate\n"
    val spec = YamlLoader.load(explicit)
    // the explicit step parses WITH the schema columns; no implicit twin
    val validates = spec.steps.collect { case v: Validate => v }
    assert(validates.length == 1)
    assert(validates.head.columns.nonEmpty)
    // and it enforces: bob's negative balance is a drop rule
    val out = Pipeline(spark, spec).run()
    assert(out.where("cd_customer = 2").count() == 0)
    assert(out.where("cd_customer = 1").count() == 1)
  }

  private val projectYaml =
    """project_name: graft_example
      |profile: dev
      |defaults:
      |  vars:
      |    env_name: "default"
      |  types:
      |    str:
      |      expression: upper(trim({col}))
      |    int:
      |      try_cast: true
      |  sources:
      |    file:
      |      format: csv
      |      options:
      |        header: "true"
      |  targets:
      |    file:
      |      format: parquet
      |      mode: overwrite
      |profiles:
      |  dev:
      |    vars:
      |      env_name: "dev"
      |    targets:
      |      file:
      |        format: csv
      |  prd: {}
      |""".stripMargin

  test("project defaults: type/source/target defaults + profile deep-merge") {
    val pipelineYaml =
      """pipeline_name: defaults_pipe
        |sources:
        |  - name: src
        |    type: file
        |    path: /tmp/in_${env_name}.csv
        |    schema:
        |      primary_key: [pid]
        |      columns:
        |        - name: pid
        |          from: id
        |          type: int
        |        - name: label
        |          type: str
        |target:
        |  name: out
        |  type: file
        |  path: /tmp/out
        |""".stripMargin
    val spec = YamlLoader.loadWithProject(pipelineYaml, projectYaml)
    val src = spec.sources.head.asInstanceOf[FileSource]
    assert(src.format == "csv")                      // source kind default
    assert(src.options("header") == "true")          // source options default
    assert(src.path == "/tmp/in_dev.csv")            // profile var beat default var
    val t = spec.steps.collectFirst { case t: Transform => t }.get
    assert(t.columns.find(_.name == "pid").get.tryCast)              // int type default
    assert(t.columns.find(_.name == "label").get.expression.contains("upper(trim({col}))"))
    assert(spec.sink.get.format == "csv")            // dev profile overrode parquet
    assert(spec.sink.get.mode == Overwrite)          // mode default survived merge
    // explicit profile override: prd inherits the parquet default
    val prd = YamlLoader.loadWithProject(pipelineYaml, projectYaml, profile = Some("prd"))
    assert(prd.sink.get.format == "parquet")
    assert(prd.sources.head.asInstanceOf[FileSource].path == "/tmp/in_default.csv")
    intercept[IllegalArgumentException] {
      YamlLoader.loadWithProject(pipelineYaml, projectYaml, profile = Some("nope"))
    }
  }

  test("explicit pipeline values beat project defaults") {
    val pipelineYaml =
      """pipeline_name: explicit_pipe
        |sources:
        |  - name: src
        |    type: file
        |    format: json
        |    path: /tmp/in.json
        |    schema:
        |      columns:
        |        - name: label
        |          type: str
        |          expression: lower({col})
        |""".stripMargin
    val spec = YamlLoader.loadWithProject(pipelineYaml, projectYaml)
    assert(spec.sources.head.asInstanceOf[FileSource].format == "json")
    val t = spec.steps.collectFirst { case t: Transform => t }.get
    assert(t.columns.head.expression.contains("lower({col})"))
  }

  test("test-mode runs the pipeline on fixtures and diffs vs expected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_testmode")
    val fixture = dir.resolve("fixture.csv")
    java.nio.file.Files.writeString(fixture, "customer_id,name,vl_balance\n7,gail,1.5\n")
    val expectedPath = dir.resolve("expected").toString
    val spec0 = YamlLoader.load(yaml.replace("__PATH__", fixture.toString))
    val expected = Pipeline(spark, spec0.copy(sink = None)).run()
    expected.write.parquet(expectedPath)

    val spec = spec0.copy(test = Some(TestSpec(fixture.toString, expectedPath)))
    PipelineTest.runTestMode(spark, spec) // passes

    val badExpected = dir.resolve("expected_bad").toString
    expected.withColumn("nm_name", lit("WRONG")).write.parquet(badExpected)
    intercept[AssertionError] {
      PipelineTest.runTestMode(spark,
        spec.copy(test = Some(TestSpec(fixture.toString, badExpected))))
    }
  }

  test("word bigram counts match the array formulation") {
    val docs = Seq((1L, "a b c a b"), (2L, "a b")).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.wordBigramCounts(docs).collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("cnt")).toMap
    assert(m == Map("a b" -> 3, "b c" -> 1, "c a" -> 1))
  }

  test("transform: a later column expression may reference an earlier output column") {
    val df = Seq(("  A@B.Co  ", 1L)).toDF("email", "id")
    val t = Transform(Seq(
      ColumnSpec("ds_email", from = Some("email"), expression = Some("lower(trim({col}))")),
      ColumnSpec("ds_domain", expression = Some("split(ds_email, '@')[1]"))))
    val r = Pipeline.transform(df, t).collect()(0)
    assert(r.getAs[String]("ds_email") == "a@b.co")
    assert(r.getAs[String]("ds_domain") == "b.co")
  }

  test("the repo's own examples/ project runs end-to-end with project defaults") {
    val proj = "examples/graft.yml"
    assume(new java.io.File(proj).exists)
    val defaults0 = ProjectConfig.load(
      java.nio.file.Files.readString(java.nio.file.Paths.get(proj))).resolved(Some("dev"))
    val projDir = java.nio.file.Paths.get(proj).toAbsolutePath.getParent
    val outDir = java.nio.file.Files.createTempDirectory("graft_example_out")
    val defaults = defaults0.copy(paths = defaults0.paths.map {
      case ("targets", _) => "targets" -> outDir.toString
      case (k, v) => k -> projDir.resolve(v).normalize.toString
    })
    val spec = YamlLoader.loadDirectory(projDir.resolve("pipelines/customers").toString, defaults)
    val out = Pipeline(spark, spec).run()
    val rows = out.orderBy("cd_customer").collect()
    // id=2 duplicated → both dropped by the unique rule; 1 and 3 remain.
    assert(rows.map(_.getAs[Long]("cd_customer")).toSeq == Seq(1L, 3L))
    assert(rows(0).getAs[String]("nm_name") == "ANN") // type default upper(trim)
    assert(rows(0).getAs[String]("ds_env") == "dev")  // profile var substitution
    assert(spark.read.parquet(outDir.resolve("customers_silver").toString).count() == 2)
  }

  test("pivot step: explicit pivot_values pin the output schema without a discovery scan") {
    val y =
      """pipeline_name: pv
        |sources:
        |  - name: s
        |    type: file
        |steps:
        |  - type: pivot
        |    params:
        |      index: [id]
        |      columns: cat
        |      values: amount
        |      agg: sum
        |      pivot_values: [a, b]
        |""".stripMargin
    val spec = YamlLoader.load(y)
    val p = spec.steps.collectFirst { case p: Pivot => p }.get
    assert(p.values == Seq("a", "b"))
    // The data carries a third category; the declared list (not a
    // distinct scan) drives the output schema, and no Spark job runs
    // while the pivot plan is BUILT (discovery pivots collect the
    // distinct values eagerly at plan-construction time).
    val df = Seq((1L, "a", 10.0), (1L, "b", 5.0), (2L, "c", 7.0)).toDF("id", "cat", "amount")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = Pipeline(spark, spec).applyStep(df, p) // lazy — no action yet
      Thread.sleep(200) // let any eagerly-submitted discovery job surface
      assert(jobs == 0, "explicit pivot_values must not run a distinct-scan job")
      assert(plan.columns.toSeq == Seq("id", "a", "b")) // 'c' excluded: values were used
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sql step without a sql param fails at load time") {
    val y =
      """pipeline_name: badsql
        |sources:
        |  - name: s
        |    type: file
        |steps:
        |  - type: sql
        |    params:
        |      view: v
        |""".stripMargin
    val e = intercept[IllegalArgumentException] { YamlLoader.load(y) }
    assert(e.getMessage.contains("sql step requires"))
  }

  test("five-source pipeline: the FIRST source stays the initial target (order preserved)") {
    // regression: .toMap over 4+ entries switches to hash order and
    // run() would fold steps over an arbitrary source
    val dir = java.nio.file.Files.createTempDirectory("graft_5src")
    val names = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    names.zipWithIndex.foreach { case (n, i) =>
      java.nio.file.Files.writeString(dir.resolve(s"$n.csv"), s"id,src\n$i,$n\n")
    }
    val spec = PipelineSpec("five_src",
      names.map(n => FileSource(n, dir.resolve(s"$n.csv").toString, "csv",
        Map("header" -> "true"))),
      Nil)
    val out = Pipeline(spark, spec).run().collect()
    assert(out.length == 1 && out(0).getAs[String]("src") == "alpha",
      s"initial target must be the first declared source, got ${out.toSeq}")
  }

  test("single-quoted rule params parse like double-quoted ones") {
    assert(YamlLoader.parseRule("pattern:'^a.*$'") == Pattern("^a.*$"))
    assert(YamlLoader.parseRule("pattern:\"^a.*$\"") == Pattern("^a.*$"))
  }

  test("steps.yml with a bare steps: key falls back to the model's steps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_barestep")
    java.nio.file.Files.writeString(dir.resolve("model.yml"),
      """pipeline_name: bare
        |sources:
        |  - name: s
        |    type: file
        |steps:
        |  - type: filter
        |    params: { where: "1 = 1" }
        |""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("steps.yml"), "steps:\n")
    val spec = YamlLoader.loadDirectory(dir.toString)
    assert(spec.steps.exists(_.isInstanceOf[Filter])) // no NPE, model steps kept
  }

  test("cli --input dynamic path mirrors the reference's _read_file semantics") {
    def src(path: String) = PipelineSpec("p",
      Seq(FileSource("s", path, "csv")), Nil)
    def pathOf(s: PipelineSpec) = s.sources.head.asInstanceOf[FileSource].path
    // file path + input: the input REPLACES the file name (with_name)
    assert(pathOf(graft.Cli.applyInput(src("/data/landing/customers.csv"), Seq("2024-06-01.csv")))
      == "/data/landing/2024-06-01.csv")
    // directory path + input: the input joins on
    assert(pathOf(graft.Cli.applyInput(src("/data/landing"), Seq("f.csv")))
      == "/data/landing/f.csv")
    // absolute input wins outright
    assert(pathOf(graft.Cli.applyInput(src("/data/landing/customers.csv"), Seq("/tmp/x.csv")))
      == "/tmp/x.csv")
    // file path, no input: untouched
    assert(pathOf(graft.Cli.applyInput(src("/data/landing/customers.csv"), Nil))
      == "/data/landing/customers.csv")
    // directory (or empty) path with no input: fail fast, clear error
    val e = intercept[IllegalArgumentException] { graft.Cli.applyInput(src("/data/landing"), Nil) }
    assert(e.getMessage.contains("points to a directory"))
    intercept[IllegalArgumentException] { graft.Cli.applyInput(src(""), Nil) }
  }

  test("cli --input targets the primary source only; named form addresses the rest") {
    val spec = PipelineSpec("p", Seq(
      FileSource("orders", "/landing/orders.csv", "csv"),
      FileSource("countries", "/ref/countries.csv", "csv")), Nil)
    def paths(s: PipelineSpec) = s.sources.collect { case f: FileSource => f.name -> f.path }.toMap
    // bare input rewrites ONLY the first file source; the static
    // secondary lookup keeps its configured path (round-4 advice: every
    // extension-bearing source was being re-pointed).
    val bare = paths(graft.Cli.applyInput(spec, Seq("2024-06-01.csv")))
    assert(bare("orders") == "/landing/2024-06-01.csv")
    assert(bare("countries") == "/ref/countries.csv")
    // named form (drune src_paths dict): address any source by name
    val named = paths(graft.Cli.applyInput(spec, Seq("a.csv", "countries=eu.csv")))
    assert(named("orders") == "/landing/a.csv")
    assert(named("countries") == "/ref/eu.csv")
    // unknown name fails fast
    intercept[IllegalArgumentException] {
      graft.Cli.applyInput(spec, Seq("nope=x.csv"))
    }
    // a bare path with a Hive-partition '=' segment is NOT the named
    // form — it must apply verbatim to the primary source
    val hive = paths(graft.Cli.applyInput(spec, Seq("/lz/ds=2024-06-01/orders.csv")))
    assert(hive("orders") == "/lz/ds=2024-06-01/orders.csv")
    assert(hive("countries") == "/ref/countries.csv")
  }

  test("cli --input '=' edge cases: declared-name hive prefix, filename with '='") {
    val spec = PipelineSpec("p", Seq(
      FileSource("ds", "/landing/ds.csv", "csv"),
      FileSource("countries", "/ref/countries.csv", "csv")), Nil)
    def paths(s: PipelineSpec) = s.sources.collect { case f: FileSource => f.name -> f.path }.toMap
    // a RELATIVE hive-style path whose prefix collides with a declared
    // source name ('ds') carries a path separator in the value — it is
    // a bare input for the primary source, not a rewrite of source 'ds'
    val hive = paths(graft.Cli.applyInput(spec, Seq("ds=2024-06-01/f.csv")))
    assert(hive("ds") == "/landing/ds=2024-06-01/f.csv")
    assert(hive("countries") == "/ref/countries.csv")
    // a bare filename containing '=' with a dot-free prefix AND a
    // dot-free value is a bare input, not an unknown-name hard failure
    val eq = paths(graft.Cli.applyInput(spec, Seq("run=1_data")))
    assert(eq("ds") == "/landing/run=1_data")
    // the named form still addresses a declared source by name
    val named = paths(graft.Cli.applyInput(spec, Seq("ds=2024-06-01.csv")))
    assert(named("ds") == "/landing/2024-06-01.csv")
    // a declared name with an ABSOLUTE value is the named form (the
    // absolute input wins outright for THAT source)
    val abs = paths(graft.Cli.applyInput(spec, Seq("countries=/ref/v2/eu.csv")))
    assert(abs("countries") == "/ref/v2/eu.csv")
    assert(abs("ds") == "/landing/ds.csv")
    // and a typo'd name in front of a file-like value still fails fast
    intercept[IllegalArgumentException] {
      graft.Cli.applyInput(spec, Seq("oders=x.csv"))
    }
  }

  test("the shipped reference customer example loads and runs unmodified") {
    val refDir = "/root/reference/examples/pipelines/customer"
    assume(new java.io.File(refDir + "/model.yml").exists)
    val dir = java.nio.file.Files.createTempDirectory("graft_refex")
    val csv = dir.resolve("customers.csv")
    java.nio.file.Files.writeString(csv,
      """customer_id,first_name,last_name,email,document
        |1, john , doe ,John.Doe@Example.COM,11122
        |2,jane,row,jane@x.org,33344
        |""".stripMargin)
    val spec0 = YamlLoader.loadDirectory(refDir)
    // Only runtime bindings change: the source file (the example ships
    // no path — drune passes it at run time) and a writable sink.
    val spec = spec0.copy(
      sources = spec0.sources.map {
        case f: FileSource => f.copy(path = csv.toString)
        case s => s
      },
      sink = spec0.sink.map(_.copy(path = dir.resolve("out").toString)))
    // steps.yml appended its filter + validate to the model's implicit steps.
    assert(spec.steps.exists { case Filter(w) => w.contains("JOHN"); case _ => false })
    val out = Pipeline(spark, spec).run()
    // target.schema: document excluded (via its renamed column), new_column added.
    assert(!out.columns.contains("nu_document"))
    assert(out.columns.contains("new_column"))
    val rows = out.collect()
    assert(rows.length == 1) // filter nm_first_name='JOHN' after trim+upper
    val r = rows(0)
    assert(r.getAs[String]("nm_first_name") == "JOHN")
    assert(r.getAs[String]("ds_email") == "john.doe@example.com")
    // string_split shim: Spark subscripts are 0-based (documented
    // caveat) — [1] is the domain here.
    assert(r.getAs[String]("ds_login") == "example.com")
  }

  test("the product and sales example pipelines load and run from their directories") {
    // the reference ships product/sales example DATA but empty model
    // YAMLs (reference examples/pipelines/{product,sales}/model.yml are
    // 0 bytes) — these fixtures are the pipelines those CSVs imply, in
    // the same declarative surface as the shipped customer example
    def bind(dir: String, csvName: String): PipelineSpec = {
      val spec0 = YamlLoader.loadDirectory(s"/root/repo/examples/pipelines/$dir")
      val out = java.nio.file.Files.createTempDirectory(s"graft_ex_$dir")
      spec0.copy(
        sources = spec0.sources.map {
          case f: FileSource =>
            f.copy(path = s"/root/repo/examples/data/$csvName")
          case s => s
        },
        sink = spec0.sink.map(_.copy(path = out.resolve("out").toString)))
    }
    // PRODUCT: not_null|unique drop kills the null id and the dup pair;
    // the filter step drops the priceless monitor
    val prod = Pipeline(spark, bind("product", "product.csv")).run()
    // business columns first; the keyed target appends the control
    // columns (hash_key/updated_at/created_at) drune adds too
    assert(prod.columns.take(4).toSeq ==
      Seq("cd_product", "nm_product", "ds_category", "vl_price"))
    val prows = prod.orderBy("cd_product").collect()
    assert(prows.map(_.getAs[Long]("cd_product")).toSeq == Seq(20L, 30L),
      prows.mkString("; "))
    assert(prows.head.getAs[String]("nm_product") == "MOUSE") // trim+upper applied
    // SALES: duplicate sale 1004 drops, the null product drops, the
    // zero quantity drops; dates land typed
    val sales = Pipeline(spark, bind("sales", "sales.csv")).run()
    assert(sales.columns.take(5).toSeq ==
      Seq("cd_sale", "dt_sale", "cd_customer", "cd_product", "qt_quantity"))
    val srows = sales.orderBy("cd_sale").collect()
    assert(srows.map(_.getAs[Long]("cd_sale")).toSeq == Seq(1001L, 1002L, 1003L, 1007L),
      srows.mkString("; "))
    assert(srows.head.getAs[java.sql.Date]("dt_sale").toString == "2024-01-15")
  }

  test("CLI init scaffolds a runnable pipeline directory and refuses overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_init").resolve("orders")
    graft.Cli.init(dir.toString, name = None)
    assert(java.nio.file.Files.exists(dir.resolve("model.yml")))
    assert(java.nio.file.Files.exists(dir.resolve("steps.yml")))
    // the scaffold parses AND runs once its TODO source path is bound
    val csv = dir.resolve("orders.csv")
    java.nio.file.Files.writeString(csv, "source_id,example\n1, ann \n2,bob\n2,dup\n")
    val spec0 = YamlLoader.loadDirectory(dir.toString)
    assert(spec0.name == "orders") // directory name is the default pipeline name
    val spec = spec0.copy(
      sources = spec0.sources.map {
        case f: FileSource => f.copy(path = csv.toString)
        case s => s
      },
      sink = spec0.sink.map(_.copy(path = dir.resolve("out").toString)))
    val rows = Pipeline(spark, spec).run().orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L), // unique drop kills both id=2
      rows.mkString("; "))
    assert(rows.head.getAs[String]("nm_example") == "ANN")
    // re-init must never eat an existing pipeline
    val e = intercept[IllegalArgumentException] { graft.Cli.init(dir.toString, None) }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // --name overrides the directory-derived pipeline name
    val dir2 = java.nio.file.Files.createTempDirectory("graft_init2").resolve("x")
    graft.Cli.init(dir2.toString, Some("renamed"))
    assert(YamlLoader.loadDirectory(dir2.toString).name == "renamed")
  }

  test("materialized target block parses: group_by + aggregates, missing keys are loud") {
    val spec = YamlLoader.load(
      """pipeline_name: mv
        |sources:
        |  - name: fact
        |    type: versioned
        |    path: /data/fact
        |target:
        |  path: /data/rollup
        |  materialized:
        |    group_by: [status, month]
        |    aggregates:
        |      - {name: n, kind: count}
        |      - {name: revenue, kind: sum, expr: cents}
        |""".stripMargin)
    val mv = spec.sink.get.materialized.get
    assert(mv.groupBy == Seq("status", "month"))
    assert(mv.aggs == Seq(
      MaterializedAgg.MAgg("n", "", "count"),
      MaterializedAgg.MAgg("revenue", "cents", "sum")))
    def bad(block: String, expect: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        YamlLoader.load(
          s"""pipeline_name: mv
             |sources:
             |  - name: fact
             |    type: versioned
             |    path: /data/fact
             |target:
             |  path: /data/rollup
             |  materialized:
             |$block
             |""".stripMargin)
      }
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    bad("    aggregates: [{name: n, kind: count}]", "group_by is required")
    bad("    group_by: [status]", "aggregates list is required")
    bad("    group_by: [status]\n    aggregates: [{kind: count}]", "name is required")
    bad("    group_by: [status]\n    aggregates: [{name: n}]", "kind is required")
  }

  test("LLM-pipeline step kinds: YAML curate reproduces the operator call exactly") {
    val docs = s"$sfDir/documents.parquet"
    val spec = YamlLoader.load(
      s"""pipeline_name: curation
         |sources:
         |  - name: documents
         |    type: file
         |    format: parquet
         |    path: "$docs"
         |steps:
         |  - type: curate
         |    params:
         |      min_tokens: 20
         |""".stripMargin)
    assert(spec.steps == Seq(CurateStep(minTokens = 20)))
    val out = Pipeline(spark, spec).run().orderBy("doc_id").collect().toSeq
    val expected = graft.operators.Curation.curate(
        spark.read.parquet(docs), minTokens = 20)
      .orderBy("doc_id").collect().toSeq
    assert(out == expected, "YAML curate must be row-identical to Curation.curate (q39)")
  }

  test("LLM-pipeline step kinds: dedup/pack/mixture parse and run") {
    val docs = s"$sfDir/documents.parquet"
    val spec = YamlLoader.load(
      s"""pipeline_name: corpus
         |sources:
         |  - name: documents
         |    type: file
         |    format: parquet
         |    path: "$docs"
         |steps:
         |  - type: dedup
         |    params: {method: exact}
         |  - type: pack
         |    params: {seq_len: 2048}
         |""".stripMargin)
    assert(spec.steps == Seq(DedupStep(), PackStep(2048L)))
    // nearDupGroups tuning reaches the step from YAML (a 100 TB run
    // moves the union-find/label-propagation cut without code changes)
    val tuned = YamlLoader.load(
      s"""pipeline_name: corpus
         |sources:
         |  - name: documents
         |    type: file
         |    format: parquet
         |    path: "$docs"
         |steps:
         |  - type: dedup
         |    params: {method: minhash, threshold: 0.7, local_max_pairs: 123, max_iters: 5}
         |""".stripMargin)
    assert(tuned.steps == Seq(DedupStep(method = "minhash", threshold = 0.7,
      localMaxPairs = 123L, maxIters = 5)))
    val out = Pipeline(spark, spec).run()
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "bin", "bin_offset"))
    val n = out.count()
    val raw = spark.read.parquet(docs)
    assert(n > 0 && n <= raw.count())
    // dedup step keeps ALL original columns (filter semantics)
    val dd = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: dd
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: dedup, params: {method: minhash, threshold: 0.8}}]
         |""".stripMargin)).run()
    assert(dd.columns.sorted.toSeq == raw.columns.sorted.toSeq)
    assert(dd.count() <= raw.count())
    // mixture: integer-rate thinning toward the declared weights
    val mixSpec = YamlLoader.load(
      s"""pipeline_name: mix
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: mixture, params: {targets: {en: 60, de: 40}, domain_col: lang}}]
         |""".stripMargin)
    assert(mixSpec.steps == Seq(MixtureStep(Seq("de" -> 40L, "en" -> 60L))))
    val mixed = Pipeline(spark, mixSpec).run()
    assert(mixed.columns.toSeq == Seq("doc_id", "lang", "bucket"))
    assert(mixed.count() > 0)
    // unknown method refuses at LOAD time
    val e = intercept[IllegalArgumentException] {
      YamlLoader.load(
        """pipeline_name: x
          |sources: [{name: d, type: file, format: parquet, path: "/x"}]
          |steps: [{type: dedup, params: {method: fuzzy}}]
          |""".stripMargin)
    }
    assert(e.getMessage.contains("unknown method 'fuzzy'"))
  }

  test("the shipped pretrain_corpus example: full curation chain runs end-to-end") {
    val dir = "/root/repo/examples/pipelines/pretrain_corpus"
    val spec0 = YamlLoader.loadDirectory(dir)
    assert(spec0.steps.map(_.getClass.getSimpleName) == Seq(
      "CurateStep", "DedupStep", "SpanDedupStep", "DecontaminateStep",
      "LmScoreStep", "Filter", "BpeCountStep", "PackStep", "ShardStep"))
    // bind the runtime source path, as the customer example does
    val spec = spec0.copy(sources = spec0.sources.map {
      case f: FileSource if f.name == "documents" =>
        f.copy(path = s"$sfDir/documents.parquet")
      case s => s
    })
    val out = Pipeline(spark, spec).run()
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "bin", "bin_offset",
      "sort_key", "shard"))
    val raw = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val n = out.count()
    assert(n > 0 && n < raw, s"curation must drop something: $n of $raw survived")
    // the pack invariant holds on the CURATED stream: offsets are the
    // contiguous prefix sum of the BPE lengths in doc_id order
    val rows = out.select("doc_id", "n_tokens", "bin", "bin_offset")
      .orderBy("doc_id").collect()
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == cum / 2048 && r.getLong(3) == cum % 2048,
        s"doc ${r.getLong(0)}: bin/offset diverged from the prefix sum")
      cum += r.getLong(1)
    }
    assert(out.select("shard").distinct().count() <= 8)
  }

  test("curate keep_columns works with a non-default id_col") {
    val docs = s"$sfDir/documents.parquet"
    val out = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: kc
         |sources:
         |  - name: d
         |    type: sql
         |    query: "SELECT doc_id AS my_id, text, lang FROM parquet.`$docs`"
         |steps:
         |  - type: curate
         |    params: {id_col: my_id, min_tokens: 5, keep_columns: true}
         |""".stripMargin)).run()
    // filter semantics: ALL flowing columns survive, under the caller's id
    assert(out.columns.toSeq == Seq("my_id", "text", "lang"))
    val raw = spark.read.parquet(docs)
    assert(out.count() > 0 && out.count() <= raw.count())
  }

  test("pack step with length_col: bpe_count -> pack packs by BPE lengths") {
    val docs = s"$sfDir/documents.parquet"
    val raw = spark.read.parquet(docs)
    raw.createOrReplaceTempView("pack_ref_corpus")
    val spec = YamlLoader.load(
      s"""pipeline_name: bpe_pack
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps:
         |  - type: bpe_count
         |    params: {ref_table: pack_ref_corpus, merges: 4}
         |  - type: pack
         |    params: {seq_len: 256, length_col: n_bpe_tokens}
         |""".stripMargin)
    assert(spec.steps(1) == PackStep(256L, lengthCol = Some("n_bpe_tokens")))
    val out = Pipeline(spark, spec).run().orderBy("doc_id").collect()
    // n_tokens must be the BPE count, not the whitespace count, and the
    // prefix sum must walk those lengths
    val merges = graft.operators.BpeTrainer.train(spark, raw, steps = 4)
    val expected = raw.select(col("doc_id"),
        graft.operators.BpeTrainer.tokenCount(col("text"), merges).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    out.zip(expected).foreach { case (r, (id, n)) =>
      assert(r.getLong(0) == id && r.getLong(1) == n,
        s"doc $id: packed length ${r.getLong(1)} != BPE count $n")
      assert(r.getLong(2) == cum / 256 && r.getLong(3) == cum % 256)
      cum += n
    }
  }

  test("LLM-pipeline step kinds: chunk/vocab reproduce the operator calls exactly") {
    val docs = s"$sfDir/documents.parquet"
    val spec = YamlLoader.load(
      s"""pipeline_name: chunks
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps:
         |  - type: chunk
         |    params: {window_tokens: 20, stride_tokens: 10}
         |""".stripMargin)
    assert(spec.steps == Seq(ChunkStep(20, 10)))
    val out = Pipeline(spark, spec).run().orderBy("doc_id", "chunk_idx").collect().toSeq
    val expected = graft.operators.Curation.chunkOverlap(
        spark.read.parquet(docs), 20, 10)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(out == expected, "YAML chunk must be row-identical to Curation.chunkOverlap (q112)")

    val vSpec = YamlLoader.load(
      s"""pipeline_name: vocab
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: vocab, params: {top_k: 20, min_doc_freq: 2}}]
         |""".stripMargin)
    assert(vSpec.steps == Seq(VocabStep(topK = 20, minDocFreq = 2)))
    val vOut = Pipeline(spark, vSpec).run().collect().toSeq
    val vExp = graft.operators.TextAnalysis.vocab(
      spark.read.parquet(docs), topK = 20, minDocFreq = 2).collect().toSeq
    assert(vOut == vExp, "YAML vocab must be row-identical to TextAnalysis.vocab (q114)")

    // span_dedup: cleaned text replaces textCol IN PLACE, other
    // columns flow through, exact mode matches the operator (q120)
    val sSpec = YamlLoader.load(
      s"""pipeline_name: span_dd
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: span_dedup, params: {window: 50, hashed: "false"}}]
         |""".stripMargin)
    assert(sSpec.steps == Seq(SpanDedupStep(window = 50, hashed = false)))
    val sOut = Pipeline(spark, sSpec).run()
    assert(sOut.columns.toSet == spark.read.parquet(docs).columns.toSet,
      "every source column must survive the span_dedup step")
    val sGot = sOut.select("doc_id", "text").orderBy("doc_id").collect().toSeq
    val sExp = graft.operators.Dedup.removeDuplicatedSpans(spark.read.parquet(docs))
      .select(col("doc_id"), col("clean_text").as("text")).orderBy("doc_id").collect().toSeq
    assert(sGot == sExp, "YAML span_dedup must be row-identical to removeDuplicatedSpans (q120)")

    // span_score: coverage vs a persisted gram store joins on as
    // columns; a filter step downstream thresholds it (q123 machinery)
    val storeRoot = java.nio.file.Files.createTempDirectory("yaml_gramstore")
      .toString + "/g"
    graft.operators.IncrementalDedup.initGramStore(spark,
      spark.read.parquet(docs).where("doc_id % 2 = 0"), storeRoot)
    val scSpec = YamlLoader.load(
      s"""pipeline_name: span_score
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps:
         |  - type: filter
         |    params: {where: "doc_id % 2 = 1"}
         |  - type: span_score
         |    params: {store: "$storeRoot"}
         |  - type: filter
         |    params: {where: "dup_frac < 0.5"}
         |""".stripMargin)
    assert(scSpec.steps(1) == SpanScoreStep(store = storeRoot))
    val scOut = Pipeline(spark, scSpec).run()
    assert(scOut.columns.contains("dup_frac") && scOut.columns.contains("text"))
    val scored = graft.operators.IncrementalDedup.spanDelta(spark,
      spark.read.parquet(docs).where("doc_id % 2 = 1"), storeRoot,
      append = false).scores
    assert(scOut.count() == scored.where("dup_frac < 0.5").count(),
      "the YAML chain must keep exactly the under-threshold docs")
    // missing store param refuses at LOAD time
    val eScore = intercept[IllegalArgumentException] {
      YamlLoader.load(
        """pipeline_name: bad
          |sources: [{name: d, type: file, format: parquet, path: "/x"}]
          |steps: [{type: span_score, params: {}}]
          |""".stripMargin)
    }
    assert(eScore.getMessage.contains("store"))
    // missing required params refuse at LOAD time
    val e = intercept[IllegalArgumentException] {
      YamlLoader.load(
        """pipeline_name: x
          |sources: [{name: d, type: file, format: parquet, path: "/x"}]
          |steps: [{type: chunk, params: {window_tokens: 20}}]
          |""".stripMargin)
    }
    assert(e.getMessage.contains("stride_tokens"))
  }

  test("LLM-pipeline step kinds: decontaminate modes and leakage split") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = s"$sfDir/documents.parquet"
    val raw = spark.read.parquet(docs)
    raw.where(pmod(col("doc_id"), lit(7)) === 0).createOrReplaceTempView("eval_suite")
    def run(mode: String) = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: decon
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps:
         |  - {type: filter, params: {where: "doc_id % 7 <> 0"}}
         |  - {type: decontaminate, params: {eval_table: eval_suite, mode: $mode}}
         |""".stripMargin)).run()
    val train = raw.where(pmod(col("doc_id"), lit(7)) =!= 0)
    // drop: clean docs only, all columns kept
    val dropped = run("drop")
    assert(dropped.columns.sorted.toSeq == raw.columns.sorted.toSeq)
    val flagged = graft.operators.Curation.decontaminate(
      train, spark.table("eval_suite"))
    assert(dropped.count() == train.count() - flagged.count())
    // score: row-identical to the operator (q115's shape)
    val scored = run("score").orderBy("doc_id").collect().toSeq
    val sExp = graft.operators.Curation.contaminationScore(
        train, spark.table("eval_suite"))
      .orderBy("doc_id").collect().toSeq
    assert(scored == sExp)
    // split: appends group_id/split, groups never straddle, corpus kept
    val split = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: sp
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: split, params: {train_pct: 90, method: exact}}]
         |""".stripMargin)).run()
    assert(split.count() == raw.count())
    assert(split.columns.contains("split") && split.columns.contains("group_id"))
    val straddle = split.groupBy("group_id")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("n"))
      .where(col("n") > 1).count()
    assert(straddle == 0, "a duplicate group must never straddle the split")
    // shard: appended columns, row-identical to the operator (q116)
    val sharded = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: sh
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: shard, params: {n_shards: 8}}]
         |""".stripMargin)).run().orderBy("doc_id").collect().toSeq
    val shExp = graft.operators.Curation.shardAssign(raw, 8)
      .orderBy("doc_id").collect().toSeq
    assert(sharded == shExp, "YAML shard must be row-identical to Curation.shardAssign")
  }

  test("lm_score and bpe_count steps: reference-trained scoring joins on as columns") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = s"$sfDir/documents.parquet"
    val raw = spark.read.parquet(docs)
    raw.where(pmod(col("doc_id"), lit(4)) === 0).createOrReplaceTempView("ref_corpus")

    // lm_score: CCNet shape — LM trained on the reference view, the
    // flowing frame scored and thresholded downstream (q128/q129)
    val lmOut = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: lmscore
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps:
         |  - {type: lm_score, params: {ref_table: ref_corpus, min_count: 2}}
         |  - {type: filter, params: {where: "n_bigrams > 0 AND n_found * 2 >= n_bigrams"}}
         |""".stripMargin)).run()
    assert(Seq("n_bigrams", "n_found", "sum_p_micro", "text")
      .forall(lmOut.columns.contains))
    val lm = graft.operators.NgramLm.trainBigrams(
      raw.where(pmod(col("doc_id"), lit(4)) === 0), minCount = 2L)
    val exp = graft.operators.NgramLm.scoreDocs(raw, lm)
      .where("n_bigrams > 0 AND n_found * 2 >= n_bigrams")
    assert(lmOut.count() == exp.count(),
      "the YAML chain must keep exactly the low-OOV docs")

    // bpe_count: token budgeting under a learned tokenizer (q126/q127)
    val bpeOut = Pipeline(spark, YamlLoader.load(
      s"""pipeline_name: bpecount
         |sources: [{name: documents, type: file, format: parquet, path: "$docs"}]
         |steps: [{type: bpe_count, params: {ref_table: ref_corpus, merges: 8}}]
         |""".stripMargin)).run()
    assert(bpeOut.columns.contains("n_bpe_tokens") && bpeOut.columns.contains("text"))
    val merges = graft.operators.BpeTrainer.train(spark,
      raw.where(pmod(col("doc_id"), lit(4)) === 0), steps = 8)
    val expTok = raw.select(col("doc_id"),
      graft.operators.BpeTrainer.tokenCount(col("text"), merges).as("n"))
    assert(bpeOut.select(col("doc_id"), col("n_bpe_tokens")).orderBy("doc_id")
      .collect().toSeq ==
      expTok.orderBy("doc_id").collect().toSeq.map(r =>
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))),
      "YAML bpe_count must be row-identical to BpeTrainer.tokenCount")
    // missing ref_table refuses at LOAD time
    val e = intercept[IllegalArgumentException] {
      YamlLoader.load(
        """pipeline_name: bad
          |sources: [{name: d, type: file, format: parquet, path: "/x"}]
          |steps: [{type: lm_score, params: {}}]
          |""".stripMargin)
    }
    assert(e.getMessage.contains("ref_table"))
  }
}
