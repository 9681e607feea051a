package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout contract without launching Spark: the driver
  * captures only the last ~2000 chars of stdout, and sbt appends its own
  * "[success] Total time: …" (~80 chars) after our line — so the JSON
  * line must stay well under that window or the round records
  * `parsed: null` (the r01/r02 failure mode, 2398-char line vs 2000-char
  * tail). Since round 6 the captured line carries per-FAMILY rollups
  * (length bounded by the ~12 module count, not the query count); the
  * full per-query map lands in bench_out.json via renderDetail. */
class BenchLineSpec extends AnyFunSuite {

  private val allNames = SparkEntry.queries.keys.toSeq

  test("query-name prefixes are unique, so short keys are used") {
    val byPrefix = allNames.groupBy(_.takeWhile(_ != '_'))
    val collisions = byPrefix.filter(_._2.size > 1)
    assert(collisions.isEmpty, s"prefix collisions: $collisions")
  }

  test("every registered query maps to a family") {
    val fams = SparkEntry.families
    val orphans = allNames.filterNot(fams.contains)
    assert(orphans.isEmpty, s"queries with no family tag: $orphans")
  }

  test("rendered line fits the driver tail window with >=15-query headroom") {
    // Worst-ish case: every query slow (3 integer digits) plus a failure,
    // PLUS 15 extra not-yet-written queries (they land in the "other"
    // family bucket — the line must absorb future rounds' additions
    // without re-work; round-5 verdict #1).
    val extra = (1 to 15).map(i => s"q9$i%02d_future$i" -> 123.456789)
    val results = allNames.map(_ -> 123.456789).toMap ++ extra +
      (allNames.head -> -1.0)
    // worst case for the warm column too: every query warm-recorded —
    // the line must still only surface the slowest-5's warm figures
    val line = Bench.renderLine(results, "/root/testdata/sf0.1",
      results.map { case (k, _) => k -> 99.9 })
    assert(!line.contains("\n"))
    assert(line.length < 1500,
      s"bench line ${line.length} chars — driver tail window is 2000 " +
        "incl. sbt's [success] line; the rollup line must stay far under it")
  }

  test("line length is independent of query count") {
    val small = Bench.renderLine(allNames.take(20).map(_ -> 1.0).toMap, "/x")
    val big = Bench.renderLine(allNames.map(_ -> 1.0).toMap, "/x")
    // Families present can differ, but growth must be sub-linear: 125
    // extra queries may add at most a handful of family entries.
    assert(big.length - small.length < 200,
      s"line grew ${big.length - small.length} chars for 125 more queries")
  }

  test("rollup line: total excludes failures, failed listed by short key") {
    val line = Bench.renderLine(
      Map("q1_agg" -> 0.9596420401, "q2_join_revenue" -> -1.0), "/x")
    assert(line.contains("\"failed\":[\"q2\"]"))
    // total excludes the failure and keeps millisecond precision
    assert(line.contains("\"value\":0.960"))
    assert(line.contains("\"n_queries\":2"))
    // both are `rel` family; only the non-failed time rolls up
    assert(line.contains("\"queries\":{\"rel\":0.96}"))
  }

  test("slowest-5 are surfaced by short key") {
    val results = allNames.take(10).zipWithIndex
      .map { case (n, i) => n -> (i + 1.0) }.toMap
    val line = Bench.renderLine(results, "/x")
    val slowName = allNames.take(10).zipWithIndex.maxBy(_._2)._1
    assert(line.contains("\"" + slowName.takeWhile(_ != '_') + "\":10.0"),
      s"slowest entry missing from: $line")
  }

  test("plan-comparison twins are split out and excluded from total") {
    assert(Bench.TwinQueries.subsetOf(allNames.toSet),
      "TwinQueries must name real SparkEntry queries")
    val line = Bench.renderLine(
      Map("q12_bigrams_topk" -> 1.0, "q12b_bigrams_inrow" -> 7.0,
          "q18b_keywords_inrow" -> 3.0), "/x")
    assert(line.contains("\"twins\":{\"q12b\":7.00,\"q18b\":3.00}"))
    // headline total = default plans only
    assert(line.contains("\"value\":1.000"))
  }

  test("warm column: slowest rows carry warm figures, detail full map") {
    // a staged-head query (q285-class) reads staging-inclusive in the
    // min-of-2 column; its warm figure rides beside it, never min'd in
    val results = Map("q1_agg" -> 5.0, "q2_join_revenue" -> 3.0)
    val warm = Map("q1_agg" -> 0.22)
    val line = Bench.renderLine(results, "/x", warm)
    assert(line.contains("\"slowest\":{\"q1\":5.00,\"q2\":3.00}"))
    assert(line.contains("\"slowest_warm\":{\"q1\":0.22}"))
    assert(line.contains("\"value\":8.000"), "warm never joins the total")
    val detail = Bench.renderDetail(results, "/x", warm)
    assert(detail.contains("\"warm\":{\"q1_agg\":0.220}"))
    assert(detail.contains("\"value\":8.000"))
  }

  test("renderDetail keeps the full per-query map for bench_out.json") {
    val detail = Bench.renderDetail(
      Map("q1_agg" -> 0.9596420401, "q12b_bigrams_inrow" -> 2.0), "/x")
    assert(detail.contains("\"q1_agg\":0.960"))
    assert(detail.contains("\"twins\":{\"q12b_bigrams_inrow\":2.000}"))
    assert(detail.contains("\"value\":0.960"))
  }

  test("moved_vs_prev: >25% and >0.5s movers self-flag, round-trip") {
    val prevJson = Bench.renderDetail(
      Map("q1_agg" -> 3.0, "q2_join_revenue" -> 0.1,
          "q5_anti_join" -> 2.0), "/x")
    val prev = Bench.parsePrevQueries(prevJson)
    assert(prev == Map("q1_agg" -> 3.0, "q2_join_revenue" -> 0.1,
      "q5_anti_join" -> 2.0))
    // q1 regresses 3.0→4.0 (+33%, +1s: flags); q2 0.1→0.2 (+100% but
    // +0.1s: below the absolute floor); q5 2.0→2.2 (+10%: below the
    // relative floor); a brand-new query never flags
    val now = Map("q1_agg" -> 4.0, "q2_join_revenue" -> 0.2,
      "q5_anti_join" -> 2.2, "q9_salted_agg" -> 9.0)
    assert(Bench.movers(prev, now) == Seq(("q1_agg", 3.0, 4.0)))
    val detail = Bench.renderDetail(now, "/x", prev = prev)
    assert(detail.contains("\"moved_vs_prev\":{\"q1_agg\":[3.000,4.000]}"))
    // failed runs (-1) never flag in either direction
    assert(Bench.movers(Map("q1_agg" -> -1.0), Map("q1_agg" -> 5.0)).isEmpty)
    assert(Bench.movers(Map("q1_agg" -> 5.0), Map("q1_agg" -> -1.0)).isEmpty)
  }
}
