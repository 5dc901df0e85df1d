package graft

import graft.sources.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._

/** Round-18 probe: where do q141_delta_cdf_ids' ~10 s at sf0.1 go?
  * Phase-timed replay of the query's exact commit sequence (append →
  * enable CDF+rowTracking+materialized → append → delete → update →
  * merge → id-keyed feed read ×2). Prints one line per phase; SURVEY
  * §8 records the split. The hypothesis to test: the cost is the SIX
  * write commits' fixed job overhead (scan+agg+cdc+stats per DML), not
  * the id-keyed read — i.e. fixture cost, not operator cost.
  */
class Scratch21 extends SparkSpec {

  test("q141 phase anatomy at sf0.1 (probe — prints, asserts sanity only)") {
    val dir = "/root/testdata/sf0.1"
    if (!new java.io.File(dir).isDirectory) { cancel("sf0.1 testdata absent") }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val root = java.nio.file.Files.createTempDirectory("graft_s21").toString + "/t"
    val orders = Tables.load(spark, dir, "orders")
    def slice(r: Int) = orders.where(col("o_orderkey") % 2 === r)
      .select(col("o_orderkey"), col("o_custkey"))
      .repartition(1).sortWithinPartitions("o_orderkey")
    t("append0")(DeltaWrite.append(spark, slice(0), root))
    t("setProps")(DeltaWrite.setProperties(spark, root, Map(
      "delta.enableChangeDataFeed" -> "true",
      "delta.enableRowTracking" -> "true",
      "delta.rowTracking.materializedRowIdColumnName" -> "_graft_mat_rid")))
    t("append1")(DeltaWrite.append(spark, slice(1), root))
    t("delete")(DeltaWrite.delete(spark, root, "o_orderkey % 7 = 3"))
    t("update")(DeltaWrite.update(spark, root, "o_orderkey % 7 = 5",
      Map("o_custkey" -> "o_custkey + 1000000")))
    val src = DeltaRead.read(spark, root)
      .where(col("o_orderkey") % 7 === 1)
      .select(col("o_orderkey"), (col("o_custkey") * 10).as("o_custkey"))
    t("merge")(DeltaWrite.merge(spark, src, root, Seq("o_orderkey")))
    val n1 = t("feed cold")(DeltaRead.readChangesWithRowIds(spark, root, 2L).count())
    val n2 = t("feed warm")(DeltaRead.readChangesWithRowIds(spark, root, 2L).count())
    assert(n1 == n2 && n1 > 0)
  }
}
