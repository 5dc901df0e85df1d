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

  test("word bigram counts match the array formulation") {
    val docs = Seq((1L, "a b c a b"), (2L, "a b")).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.wordBigramCounts(docs).collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("cnt")).toMap
    assert(m == Map("a b" -> 3, "b c" -> 1, "c a" -> 1))
  }
}
