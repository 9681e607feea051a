package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout contract without launching Spark: the driver
  * captures only the last ~2000 chars of stdout, and sbt appends its own
  * "[success] Total time: …" (~80 chars) after our line — so the JSON
  * line must stay well under that window or the round records
  * `parsed: null` (the r01/r02 failure mode, 2398-char line vs 2000-char
  * tail). */
class BenchLineSpec extends AnyFunSuite {

  private val allNames = SparkEntry.queries.keys.toSeq

  test("query-name prefixes are unique, so short keys are used") {
    val byPrefix = allNames.groupBy(_.takeWhile(_ != '_'))
    val collisions = byPrefix.filter(_._2.size > 1)
    assert(collisions.isEmpty, s"prefix collisions: $collisions")
  }

  test("rendered line fits the driver tail window with headroom") {
    // Worst-ish case: every query slow (3 integer digits) plus a failure.
    val results = allNames.map(_ -> 123.456789).toMap +
      (allNames.head -> -1.0)
    val line = Bench.renderLine(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1800,
      s"bench line ${line.length} chars — driver tail window is 2000 " +
        "incl. sbt's [success] line; shrink keys/note or drop precision")
  }

  test("values are centisecond-rounded and failures stay -1") {
    val line = Bench.renderLine(
      Map("q1_agg" -> 0.9596420401, "q2_join_revenue" -> -1.0), "/x")
    assert(line.contains("\"q1\":0.96"))
    assert(line.contains("\"q2\":-1"))
    assert(line.contains("\"failed\":[\"q2\"]"))
    // total excludes the failure and keeps millisecond precision
    assert(line.contains("\"value\":0.960"))
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
    assert(!line.contains("\"queries\":{\"q12\":1.00,\"q12b\""))
  }
}
