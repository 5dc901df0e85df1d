package graft

import graft.sources.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._

/** Round-18 probe: what does the variant layout choice cost at scan
  * time? Two identical Delta tables over the same 1M synthetic JSON
  * documents — one UNSHREDDED (the default variantType layout), one
  * SHREDDED (`delta.enableVariantShredding=true`) — timed on the same
  * three reads: a single-path typed extraction, a two-path extraction
  * + filter, and a full-row count. The 100 TB question the numbers
  * answer: shredding moves path decoding from read time (binary
  * parse per row per variant_get) to write time (typed_value columns
  * Spark's scan reads directly, `pushVariantIntoScan`), so
  * extraction-heavy pipelines should opt in while write-once /
  * read-rarely tables keep the simpler unshredded form. Prints the
  * timings; asserts only result equality between the two layouts.
  */
class Scratch22 extends SparkSpec {

  test("variant layout anatomy: shredded vs unshredded scan cost at 1M rows (probe)") {
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val n = 1000000L
    val docs = spark.range(n).selectExpr("id",
      """parse_json(concat('{"k":', id, ',"score":', id % 997,
         ',"tags":["t', id % 7, '"],"meta":{"lang":"l', id % 23, '"}}')) AS v""")
    val plain = java.nio.file.Files.createTempDirectory("graft_s22p").toString + "/t"
    val shred = java.nio.file.Files.createTempDirectory("graft_s22s").toString + "/t"
    t("write unshredded")(DeltaWrite.append(spark, docs, plain))
    DeltaWrite.append(spark, docs.limit(1), shred) // create, then opt in
    DeltaWrite.setProperties(spark, shred, Map("delta.enableVariantShredding" -> "true"))
    DeltaWrite.delete(spark, shred, "true")
    t("write shredded")(DeltaWrite.append(spark, docs, shred))
    def onePath(root: String): Long = DeltaRead.read(spark, root)
      .selectExpr("variant_get(v, '$.score', 'bigint') AS s")
      .agg(sum("s")).head().getLong(0)
    def twoPath(root: String): Long = DeltaRead.read(spark, root)
      .where("variant_get(v, '$.meta.lang', 'string') = 'l7'")
      .selectExpr("variant_get(v, '$.score', 'bigint') AS s")
      .agg(sum("s")).head().getLong(0)
    def full(root: String): Long = DeltaRead.read(spark, root).count()
    // warm both file sets once so neither side pays cold page cache
    full(plain); full(shred)
    val p1 = t("unshredded one-path agg")(onePath(plain))
    val s1 = t("shredded   one-path agg")(onePath(shred))
    val p2 = t("unshredded two-path filter+agg")(twoPath(plain))
    val s2 = t("shredded   two-path filter+agg")(twoPath(shred))
    t("unshredded full count")(full(plain))
    t("shredded   full count")(full(shred))
    val sizeOf = (root: String) => new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum / 1024 / 1024
    info(s"data size MiB: unshredded=${sizeOf(plain)} shredded=${sizeOf(shred)}")
    assert(p1 == s1 && p2 == s2, "both layouts must read identical values")
  }
}
