package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Pins for the round-9 fixes — each test fails on the PRE-fix form of
  * its operator, independent of the DuckDB oracle (which replays the
  * same formulas and so cannot catch a shared mistake). */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** Write a one-table parquet fixture dir and return its path. */
  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft_r9_").toString

  test("q233: KS takes BOTH one-sided ecdf limits at a jump") {
    import spark.implicits._
    // 4 events with constant 1 s gaps: the gap grid is one point
    // g = 1e6 µs with mean_g = 1e6, so F(g) = 1 − e^(−1) ≈ 0.6321.
    // ecdf right-limit there is 1 (dev 0.3679); LEFT-limit is 0
    // (dev 0.6321). The exact D is 0.6321 — the right-only form
    // (the pre-fix bug) reports 0.3679.
    val dir = fixtureDir()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    (1 to 4).map(i => (i.toLong, "x",
        new java.sql.Timestamp(t0.getTime + (i - 1) * 1000L), "{}"))
      .toDF("event_id", "event_type", "ts", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = TimeQueries.qExpGapFit(spark, dir).collect().head
    assert(r.getAs[Long]("n_gaps") == 3L)
    val d = r.getAs[Double]("ks_d")
    val expected = 1.0 - math.exp(-1.0) // left-limit deviation
    assert(math.abs(d - BigDecimal(expected).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"exact D must include the left limit: got $d, want ~0.6321")
  }

  test("q271: variance denominator counts only surviving replicates") {
    import spark.implicits._
    // source "solo" holds ONE doc: 13 of its 32 Poisson replicates
    // draw total weight 0 (md5-deterministic) and null out; every
    // survivor's mean is exactly n_chars, so the corrected se is
    // exactly 0. The pre-fix /32, /31 form treats the nulled
    // replicates as mass and reports se ≈ 49.9 instead.
    val dir = fixtureDir()
    val docs = (1L, "solo", 100L) +:
      (2L to 51L).map(i => (i, "big", 50L + i))
    docs.toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = QualityQueries.qPoissonBootstrap(spark, dir).collect()
    val solo = rows.find(_.getAs[String]("source") == "solo").get
    assert(solo.getAs[Double]("boot_se") == 0.0,
      s"constant replicate means must give se = 0, got " +
        s"${solo.getAs[Double]("boot_se")}")
    assert(solo.getAs[Double]("ci_lo") == 100.0 &&
      solo.getAs[Double]("ci_hi") == 100.0)
    val big = rows.find(_.getAs[String]("source") == "big").get
    assert(big.getAs[Double]("boot_se") > 0.0 &&
      !big.getAs[Double]("boot_se").isNaN)
  }

  test("q246: engine DFT matches independent closed-form square-wave constants") {
    // Independent derivation (repeated here on purpose — the oracle
    // holds the same constants and this guards both against the
    // engine): 480-sample, period-8, ±8192 square at 8000 Hz. Probe
    // bin k = f·480/8000; k not a multiple of 60 → full rotation → 0;
    // k = 60h, h even → cancel → 0; h odd → |X|/n = A/(4·sin(πh/8)).
    def closed(f: Int): Double = {
      val k = f * 480 / 8000
      if (k % 60 != 0 || (k / 60) % 2 == 0) 0.0
      else 8192.0 / (4.0 * math.sin(math.Pi * (k / 60) / 8.0))
    }
    val xs = MultimodalQueries.squareWave.map(_.toInt)
    Seq(500, 1000, 2000, 3000).foreach { f =>
      val engine = graft.functions.Multimodal.dftMagnitude(xs, 8000, f)
      assert(math.abs(engine - closed(f)) < 1e-6,
        s"$f Hz: engine DFT $engine vs closed form ${closed(f)}")
    }
    assert(closed(1000) > closed(3000) && closed(3000) > 0.0,
      "fundamental must dominate the 3rd harmonic")
  }

  test("q277: DoReMi weights normalize and upweight the hardest domain") {
    val rows = ScoringQueries.qDoremiReweight(spark, sf).collect()
    assert(rows.length > 1)
    val sumNew = rows.map(_.getAs[Double]("w_new")).sum
    assert(math.abs(sumNew - 1.0) < 1e-2, s"w_new must normalize: $sumNew")
    val excess = rows.map(_.getAs[Double]("excess_nll"))
    assert(excess.forall(_ >= 0.0), "excess loss is clipped at zero")
    assert(excess.exists(_ > 0.0) && excess.exists(_ == 0.0),
      "the clip must be non-vacuous on the shipped corpus")
    val hardest = rows.maxBy(_.getAs[Double]("excess_nll"))
    assert(hardest.getAs[Double]("w_new") > hardest.getAs[Double]("w_old"),
      "the highest-excess domain must gain weight")
  }

  test("q279: water-filling respects caps, conserves budget, and binds") {
    // sf0.01: near-uniform sources under √-flattening push the small
    // ones over the 1.05-epoch ceiling — the cap must actually bind
    val dir = "/root/testdata/sf0.01"
    val rows = QualityQueries.qMixturePlan(spark, dir).collect()
    val t = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    rows.foreach { r =>
      assert(r.getAs[Double]("alloc_tokens") <=
        r.getAs[Double]("cap_tokens") + 1e-6,
        s"${r.getAs[String]("source")}: alloc exceeds the epoch cap")
      assert(r.getAs[Double]("epochs") <= 1.05 + 1e-6)
    }
    val alloc = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(alloc <= t + 1.0, s"plan allocates more than one epoch total")
    assert(alloc > 0.95 * t, "3 rounds must place nearly the whole budget")
    val capped = rows.filter(_.getAs[Boolean]("capped"))
    assert(capped.nonEmpty, "cap is vacuous on the shipped corpus")
    capped.foreach(r => assert(r.getAs[Double]("alloc_tokens") ==
      r.getAs[Double]("cap_tokens"),
      "a capped source must sit exactly at its ceiling"))
  }

  test("q280: classes partition the corpus; d agrees with the mean gap") {
    val rows = ScoringQueries.qDedupQualitySkew(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("is_dup")).toSet == Set(0L, 1L))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    val m = rows.map(r => r.getAs[Long]("is_dup") ->
      r.getAs[Double]("mean_score")).toMap
    val d = rows.head.getAs[Double]("cohens_d")
    assert(rows.forall(_.getAs[Double]("cohens_d") == d),
      "d is a corpus-level number, identical on both rows")
    assert(math.signum(d) == math.signum(m(1L) - m(0L)),
      "effect size must point the same way as the mean gap")
  }

  test("q281: k-means‖ emits k well-separated weighted seeds") {
    val rows = SimilarityQueries.qKmeansParInit(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.length == 8, s"want k=8 seeds, got ${rows.length}")
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to 8))
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 8)
    // oversampling weights: every point is assigned somewhere, so
    // weights over the FULL candidate set sum to n — the chosen-8
    // subset carries a dominant share (they were picked weight-first)
    val n = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    val wSum = rows.map(_.getAs[Long]("weight")).sum
    assert(wSum > 0 && wSum <= n)
    // farthest-first separation: every later seed keeps real distance
    // to the already-chosen set (unit vectors: d² ∈ [0, 4])
    val seps = rows.filter(_.getAs[Int]("rk") > 1)
      .map(_.getAs[Double]("sep"))
    assert(seps.forall(s0 => s0 > 0.0 && s0 <= 4.0),
      s"degenerate separation: ${seps.mkString(",")}")
    assert(rows.head.isNullAt(rows.head.fieldIndex("sep")),
      "the first seed has no prior set to be separated from")
  }

  test("q282: EM is monotone on held-out NLL; strong bigram structure pushes λ up") {
    import spark.implicits._
    // shipped corpus: monotone non-increasing NLL (EM = coordinate
    // ascent on held-out likelihood), λ stays a probability
    val rows = ScoringQueries.qJmInterpolation(spark, sf).collect()
    assert(rows.length == 4)
    val nlls = rows.sortBy(_.getAs[Int]("iter"))
      .map(_.getAs[Double]("heldout_nll"))
    assert(nlls.zip(nlls.tail).forall { case (a, b) => b <= a },
      s"EM must not increase held-out NLL: ${nlls.mkString(",")}")
    assert(rows.forall { r =>
      val l = r.getAs[Double]("lambda"); l > 0.0 && l < 1.0
    })
    // deterministic-bigram fixture: p(b|a)=1 ≫ p(b)=0.5, so EM must
    // drive λ toward the bigram model
    val dir = fixtureDir()
    (1L to 20L).map(i => (i, "a b a b a b a b"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val fit = ScoringQueries.qJmInterpolation(spark, dir).collect()
      .sortBy(_.getAs[Int]("iter"))
    // closed form on this fixture (pb = 1, pu = 1/2 for every held-out
    // bigram): λ ← λ/(λ + (1−λ)/2), i.e. 1/2 → 2/3 → 4/5 → 8/9
    assert(fit.map(_.getAs[Double]("lambda")).toSeq ==
      Seq(0.5, 2.0 / 3, 0.8, 8.0 / 9).map(l =>
        BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble),
      s"EM trajectory must match the closed form, got " +
        s"${fit.map(_.getAs[Double]("lambda")).mkString(",")}")
  }

  test("q283: range cuts partition the corpus into ordered, disjoint shards") {
    val rows = StorageQueries.qRangeShardPlan(spark,
      "/root/testdata/sf0.01").collect()
      .sortBy(_.getAs[Int]("shard"))
    assert(rows.nonEmpty && rows.length <= 8)
    val n = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n,
      "every document must land in exactly one shard")
    // value ranges are ordered and non-overlapping shard to shard
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"),
          s"shards ${a.getAs[Int]("shard")}/${b.getAs[Int]("shard")} overlap")
      case _ =>
    }
    // a 128-point sample must do far better than the worst case: no
    // shard more than 2x ideal (observed max ~1.3 on this corpus)
    assert(rows.forall(_.getAs[Double]("skew") < 2.0),
      "sampled cuts produced a catastrophic shard")
  }

  test("q284: frame lumas decode exactly; cuts fire on jumps, not ramps") {
    import spark.implicits._
    // the engine REALLY demuxes and decodes: the scene AVI's per-frame
    // lumas come back as the exact planted constants
    val scene = Seq(Tuple1(
      graft.functions.MediaGen.avi(
        Seq(10, 12, 14, 200, 198, 196)
          .map(v => graft.functions.MediaGen.flatGrayPng(4, 3, v)),
        4, 3))).toDF("media")
    val lum = graft.functions.Multimodal.videoFrameLumas(scene, "media")
      .select($"f_lumas").as[Seq[Double]].head()
    assert(lum == Seq(10.0, 12.0, 14.0, 200.0, 198.0, 196.0))
    // a smooth ramp (q138's fixture: steps of 40 < the 64 threshold)
    // must segment into ONE scene — cut detection is not a motion
    // detector
    val ramp = Seq(Tuple1(
      graft.functions.MediaGen.avi(
        (0 until 6).map(i =>
          graft.functions.MediaGen.flatGrayPng(4, 3, 40 * i)), 4, 3)))
      .toDF("media")
    val rampLum = graft.functions.Multimodal
      .videoFrameLumas(ramp, "media")
      .select($"f_lumas").as[Seq[Double]].head()
    val rampCuts = rampLum.sliding(2)
      .count { case Seq(a, b) => math.abs(b - a) > 64.0 }
    assert(rampCuts == 0, "a 40-per-frame ramp must not cut")
    // and the full query: every media row cuts exactly once at frame 4
    val rows = MultimodalQueries.qSceneCuts(spark, sf).collect()
    val media = rows.filter(_.getAs[Long]("doc_id") % 4 == 0)
    assert(media.nonEmpty)
    media.foreach { r =>
      assert(r.getAs[String]("cut_idx") == "4" &&
        r.getAs[Int]("n_scenes") == 2)
    }
    assert(rows.filter(_.getAs[Long]("doc_id") % 4 != 0)
      .forall(_.isNullAt(rows.head.fieldIndex("cut_idx"))))
  }

  test("q283/q284 degenerate inputs: tiny corpus and 1-frame video don't crash") {
    import spark.implicits._
    // q283 on a corpus smaller than the first cut rank: the cut list
    // is EMPTY (the pre-fix reduce threw on it) — everything lands in
    // shard 0
    val dir = fixtureDir()
    (1L to 5L).map(i => (i, 100L * i))
      .toDF("doc_id", "n_chars").write.parquet(s"$dir/documents.parquet")
    val shards = StorageQueries.qRangeShardPlan(spark, dir).collect()
    assert(shards.length == 1 && shards.head.getAs[Int]("shard") == 0)
    assert(shards.head.getAs[Long]("n_docs") == 5L)
    // q284 on a 1-frame AVI: Spark's sequence(2, 1) runs DESCENDING,
    // so the unguarded filter evaluated element_at(_, 0) and threw —
    // a single frame is simply one scene with no cuts
    val one = Seq(Tuple1(graft.functions.MediaGen.avi(
      Seq(graft.functions.MediaGen.flatGrayPng(4, 3, 50)), 4, 3)))
      .toDF("media")
    val lum = graft.functions.Multimodal.videoFrameLumas(one, "media")
    val guarded = lum
      .select(size(MultimodalQueries.sceneCutIdx($"f_lumas")))
      .as[Int].head()
    assert(guarded == 0, "a single-frame video has no cuts")
  }

  test("q285: doubling ranks equal the hand-sorted suffix order") {
    import spark.implicits._
    // Two docs, four suffixes, hand-sortable:
    //   (d1,p1)="b a"  (d1,p2)="a"  (d2,p1)="a b"  (d2,p2)="b"
    // Token order with shorter-suffix-first ties:
    //   "a" < "a b" < "b" < "b a"  →  ranks 1,2,3,4
    val dir = fixtureDir()
    Seq((1L, "b a"), (2L, "a b"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.qSuffixArray(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))
        -> r.getAs[Long]("sfx_rank")).toMap
    assert(got == Map((1L, 2L) -> 1L, (2L, 1L) -> 2L,
      (2L, 2L) -> 3L, (1L, 1L) -> 4L))
  }

  test("q285: order is bounded at 16 tokens — deep ties share a rank") {
    import spark.implicits._
    // 20 identical tokens: suffixes of length >= 16 are order-equal
    // (the doubling stops at SaContext=16), lengths 1..15 sort
    // shorter-first below them. So pos 20 -> rank 1 ... pos 6 ->
    // rank 15, and pos 1..5 all SHARE rank 16. A full (unbounded)
    // sort would give them distinct ranks — this pins the bound.
    val dir = fixtureDir()
    Seq((1L, Seq.fill(20)("t").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.qSuffixArray(spark, dir).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("sfx_rank")).toMap
    (6L to 20L).foreach(p => assert(got(p) == 21L - p,
      s"pos $p: short suffixes sort shorter-first"))
    (1L to 5L).foreach(p => assert(got(p) == 16L,
      s"pos $p: 16-token-equal suffixes must tie"))
  }

  test("q285: adjacent equal ranks expose repeated 16-token spans") {
    import spark.implicits._
    // The dedup use-case: a 16-token span planted in two docs makes
    // exactly its two start positions rank-equal; all other
    // positions stay distinct.
    val span = (1 to 16).map(i => s"w$i").mkString(" ")
    val dir = fixtureDir()
    Seq((1L, s"x $span"), (2L, s"$span y"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.qSuffixArray(spark, dir).collect()
    val byRank = rows.groupBy(_.getAs[Long]("sfx_rank"))
    val dups = byRank.filter(_._2.length > 1)
    assert(dups.size == 1, s"exactly one repeated span, got ${dups.size}")
    assert(dups.head._2.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("pos"))).toSet == Set((1L, 2L), (2L, 1L)),
      "the tied positions are the two span starts")
  }

  test("q286: digest buckets guarantee 1/32 relative error and stay bounded") {
    import spark.implicits._
    // 1..100 per source: exact integer-selection percentiles are
    // 50/95/99; the log-bucket estimates decode to 51/94/98 (bucket
    // midpoints), each within half a bucket width of exact.
    val dir = fixtureDir()
    (1L to 100L).map(i => (i, "s", "xx", i))
      .toDF("doc_id", "source", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = QualityQueries.qQuantileDigest(spark, dir).collect()
      .map(r => r.getAs[Int]("pct") ->
        (r.getAs[Long]("est_len"), r.getAs[Long]("exact_len"),
         r.getAs[Boolean]("in_bucket"))).toMap
    assert(got(50) == ((51L, 50L, true)))
    assert(got(95) == ((94L, 95L, true)))
    assert(got(99) == ((98L, 99L, true)))
    // real corpus: the sketch guarantee holds on EVERY row, and the
    // digest stays bounded — 16 slots/octave regardless of n
    val rows = QualityQueries.qQuantileDigest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_bucket"),
        s"${r.getAs[String]("source")}/p${r.getAs[Int]("pct")}: " +
          "estimate escaped its bucket")
      // rel_err ships rounded to 4 decimals, so the exact-boundary
      // 1/32 case displays as 0.0313 — bound by the same rounding
      assert(r.getAs[Double]("rel_err") <= 0.0313,
        s"relative error above the 5-bit bound: ${r.getAs[Double]("rel_err")}")
      assert(r.getAs[Long]("n_buckets") <= 32 + 16 * 40,
        "digest must stay value-domain bounded")
    }
  }

  test("q267: pair-expansion intersections match hand-computed shingle sets") {
    import spark.implicits._
    // Hand-computable word-3-gram sets (tokenize = split on ' '):
    //   s1: "a b c d"   → {a b c, b c d}
    //   s2: "a b c e"   → {a b c, b c e}
    //   s3: "x y z w"   → {x y z, y z w}
    // n_inter(s1,s2) = 1 (shared "a b c"), s3 disjoint from both.
    val dir = fixtureDir()
    Seq((1L, "s1", "a b c d"), (2L, "s2", "a b c e"),
        (3L, "s3", "x y z w"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.qSourceOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> r.getAs[Double]("j_exact")).toMap
    assert(rows.keySet ==
      Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    // |A∩B| = 1, |A| = |B| = 2 → J = 1/3
    assert(math.abs(rows(("s1", "s2")) - 0.3333) < 1e-9)
    assert(rows(("s1", "s3")) == 0.0 && rows(("s2", "s3")) == 0.0)
  }
}
