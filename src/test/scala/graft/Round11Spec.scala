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

  private def indexedSeries(ys: Seq[Long]) = {
    import spark.implicits._
    ys.zipWithIndex.map { case (y, ix) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 4, 1)
        .plusDays(ix)), (ix + 1).toLong, y)
    }.toDF("day", "i", "y")
  }

  test("q312: Theil-Sen recovers a planted slope through 20% outliers") {
    // y = 3i + 10, with 4 of 20 days blown up 100x: OLS would be
    // dragged far off; the pairwise-slope median must stay exactly 3
    val ys = (1 to 20).map(i => if (i % 5 == 0) 5000L else 3L * i + 10L)
    val r = TimeQueries.theilSenOf(indexedSeries(ys)).collect().head
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Double]("slope") == 3.0, r.toString)
    assert(r.getAs[Double]("intercept") == 10.0, r.toString)
  }

  test("q318: Page-Hinkley stays silent on a flat series and alarms after a level shift") {
    val ys = Seq.fill(15)(10L) ++ Seq.fill(15)(100L)
    val out = TimeQueries.pageHinkleyOf(indexedSeries(ys)).collect()
    val alarms = out.map(r => r.getAs[Boolean]("alarm"))
    assert(!alarms.take(15).exists(identity),
      "no drift, no alarm: the pre-shift mean matches every sample")
    assert(alarms.last, "the accumulated post-shift deviation must alarm")
    assert(out.take(15).forall(_.getAs[Double]("ph") == 0.0),
      "x == running mean pre-shift => zero PH statistic")
  }

  test("q311: Holt-Winters matches a plain-Scala reference fold exactly") {
    // weekly spike + mild trend; reference fold replays init + the
    // identical IEEE recurrence, floor-rounded like the engine
    val ys = (0 until 28).map(i =>
      100L + i + (if (i % 7 == 0) 50L else 0L))
    val out = TimeQueries.holtWintersOf(indexedSeries(ys)).collect()
    assert(out.length == 14)
    val y = ys.map(_.toDouble)
    var l = y.slice(0, 7).sum / 7.0
    var b = (y.slice(7, 14).sum / 7.0 - y.slice(0, 7).sum / 7.0) / 7.0
    val w2m = y.slice(7, 14).sum / 7.0
    var s = y.slice(7, 14).map(_ - w2m).toVector
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    (14 until 28).zip(out).foreach { case (t, row) =>
      val fc = l + b + s.head
      val nl = 0.3 * (y(t) - s.head) + 0.7 * (l + b)
      val nb = 0.1 * (nl - l) + 0.9 * b
      val ns = 0.2 * (y(t) - nl) + 0.8 * s.head
      assert(row.getAs[Double]("forecast") == r4(fc), s"t=$t fc")
      assert(row.getAs[Double]("level") == r4(nl), s"t=$t level")
      assert(row.getAs[Double]("trend") == r4(nb), s"t=$t trend")
      assert(row.getAs[Double]("seasonal") == r4(ns), s"t=$t seasonal")
      l = nl; b = nb; s = s.tail :+ ns
    }
    // the weekly spike must surface as the dominant seasonal slot
    val lastWeek = out.takeRight(7)
    val spikeDay = lastWeek.filter(r => {
      val d = java.time.LocalDate.parse(r.getString(0))
      d.toEpochDay % 7 == java.time.LocalDate.of(2026, 4, 1).toEpochDay % 7
    })
    assert(spikeDay.nonEmpty &&
      spikeDay.head.getAs[Double]("seasonal") >
        lastWeek.map(_.getAs[Double]("seasonal")).sorted.apply(5),
      "the planted spike slot must carry the largest seasonal")
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
