package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins every SparkEntry query key's bench family (round 18 — ADVICE:
  * Bench.family classifies by first-match substring rules, so a future
  * query key could silently land in the wrong family and skew the
  * per-family drift sums BENCH artifacts adjudicate with). The expected
  * mapping lives in `src/test/resources/bench_families.txt` (one
  * `key family` line per query): a NEW query key fails here until a
  * human classifies it into the resource — fail-loud, never silent.
  */
class BenchFamilySuite extends AnyFunSuite {

  private def pinned: Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/bench_families.txt"), "UTF-8")
    try src.getLines().filter(_.trim.nonEmpty).map { l =>
      val Array(k, f) = l.trim.split("\\s+")
      k -> f
    }.toMap finally src.close()
  }

  test("every SparkEntry query key has a pinned family and Bench.family agrees") {
    val pins = pinned
    val keys = SparkEntry.queries.keySet
    val unpinned = keys -- pins.keySet
    assert(unpinned.isEmpty,
      s"query keys without a pinned bench family (add them to " +
        s"src/test/resources/bench_families.txt): ${unpinned.toSeq.sorted.mkString(", ")}")
    val stale = pins.keySet -- keys
    assert(stale.isEmpty,
      s"pinned families for query keys that no longer exist: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    val drifted = keys.toSeq.sorted.flatMap { k =>
      val got = Bench.family(k)
      if (got == pins(k)) None else Some(s"$k: pinned ${pins(k)}, Bench.family says $got")
    }
    assert(drifted.isEmpty, s"family drift:\n${drifted.mkString("\n")}")
  }

  test("pinned families are drawn from the known family set") {
    val known = Set("relational", "versioned", "delta", "text", "dedup", "simsearch")
    val bad = pinned.filterNot { case (_, f) => known(f) }
    assert(bad.isEmpty, s"unknown families: $bad")
  }
}
