package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Round-11 pins: the degenerate-input guards the round-10 advice
  * asked for (one-source two-sample tests, constant-series ACF, tiny
  * blocking corpora) and the q297 token-hash collision fixture. Each
  * test fails on the pre-guard behavior (double-counted samples,
  * engine-divergent /0, first-letter/length hash collisions). */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q294/q302: a one-source corpus yields an EMPTY result, not a double-counted one") {
    import spark.implicits._
    val docs = Seq(("only", 1L), ("only", 2L), ("only", 3L))
      .toDF("source", "n_chars")
    assert(QualityQueries.mannWhitneyOf(docs).collect().isEmpty,
      "min==max source must not double-count every row into both samples")
    assert(QualityQueries.wassersteinOf(docs).collect().isEmpty,
      "W1 of a source against itself is a meaningless 0 — emit nothing")
  }

  test("q293: a constant series has NULL acf at every lag (zero variance)") {
    import spark.implicits._
    val days = (0 until 14).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 3, 1).plusDays(i)),
        5.0)).toDF("day", "y")
    val acf = TimeQueries.acfOf(days).collect()
    assert(acf.length == 7)
    assert(acf.forall(_.isNullAt(1)),
      "den=0 must surface as NULL, identically in both engines")
  }

  test("q301: n=1 corpus publishes reduction_ratio 1.0, completeness 1.0, quality NULL") {
    import spark.implicits._
    val docs = Seq((1L, "solitary token stream here", 100L))
      .toDF("doc_id", "text", "n_chars")
    val r = DedupQueries.blockingEvalOf(docs).collect().head
    assert(r.getAs[Long]("n") == 1L)
    assert(r.getAs[Double]("reduction_ratio") == 1.0,
      "zero of zero comparisons avoided = vacuously perfect reduction")
    assert(r.getAs[Double]("pairs_completeness") == 1.0,
      "zero truth pairs, zero missed = vacuously complete")
    assert(r.isNullAt(r.fieldIndex("pairs_quality")),
      "precision of an empty candidate set is undefined -> NULL")
  }

  test("q297: first-letter/length-colliding token streams no longer share fingerprints") {
    import spark.implicits._
    // Every token pair below shares (first char, length) — the old
    // ascii(t)+length(t) base hash made these two docs IDENTICAL to
    // the fingerprinter; the md5-prefix hash must keep them apart.
    val a = "cat1 dog2 fox3 owl4 bee5 ant6 elk7 ram8 sow9 hen0 pig1 cow2"
    val b = "car1 dot2 fog3 oak4 bed5 arc6 egg7 rat8 sun9 hat0 pin1 cod2"
    val docs = Seq((1L, a), (2L, b), (3L, a)).toDF("doc_id", "text")
    val pairs = DedupQueries.winnowingPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), "true copies still pair")
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)),
      s"colliding-but-different tokens must not fingerprint-match: $pairs")
  }
}
