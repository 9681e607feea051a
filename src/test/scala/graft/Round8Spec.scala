package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Property tests for the round-8 additions — each pins the law the
  * operator's published method guarantees, independent of the DuckDB
  * oracle's value-level hash match. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q226: exact-cosine rerank emits 3 ranked rows per query, cos non-increasing") {
    val rows = SimilarityQueries.qPqRerank(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val byRk = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == (1 to byRk.length))
      val cs = byRk.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"query $q: rerank cos must be non-increasing")
    }
  }

  test("q241: Good-Turing mass in [0,1], Chao1 >= observed vocabulary") {
    val r = TextQueries.qVocabCoverage(spark, sf).collect().head
    val p0 = r.getAs[Double]("p0_gt")
    assert(p0 >= 0.0 && p0 <= 1.0)
    assert(r.getAs[Double]("chao1") >= r.getAs[Long]("v_types").toDouble)
  }

  test("q249: absorption probabilities are probabilities; purchase absorbs at 1") {
    val rows = TimeQueries.qAbsorption(spark, sf).collect()
    rows.foreach { r =>
      val p = r.getAs[Double]("p_convert_5")
      assert(p >= 0.0 && p <= 1.0, s"${r.getAs[String]("state")}: $p")
    }
    val pur = rows.find(_.getAs[String]("state") == "purchase")
    assert(pur.forall(_.getAs[Double]("p_convert_5") == 1.0))
  }

  test("q253: selected threshold attains the maximum J; tp/fp monotone in t") {
    val rows = ScoringQueries.qYoudenThreshold(spark, sf).collect()
      .sortBy(_.getAs[Double]("t"))
    val js = rows.map(_.getAs[Double]("youden_j"))
    val sel = rows.filter(_.getAs[Boolean]("selected"))
    assert(sel.nonEmpty && sel.forall(_.getAs[Double]("youden_j") == js.max))
    val tps = rows.map(_.getAs[Long]("tp"))
    val fps = rows.map(_.getAs[Long]("fp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a <= b })
    assert(fps.zip(fps.tail).forall { case (a, b) => a <= b })
  }

  test("q256: IVF recall and candidate volume are non-decreasing in nprobe") {
    val rows = SimilarityQueries.qNprobeSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 3, 4))
    val rec = rows.map(_.getAs[Double]("recall_at_5"))
    val cand = rows.map(_.getAs[Double]("mean_cand"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      s"recall must grow with probes: ${rec.toSeq}")
    assert(cand.zip(cand.tail).forall { case (a, b) => a <= b },
      s"candidates must grow with probes: ${cand.toSeq}")
  }

  test("q257: more/narrower bands never lose recall; candidates priced alongside") {
    val rows = DedupQueries.qLshRecallSweep(spark, sf).collect()
      .sortBy(-_.getAs[Int]("b"))
    // layouts ordered (16,2) -> (8,4) -> (4,8): S-curve theory says
    // recall at J >= 0.8 is monotone non-increasing in r for fixed b*r
    val rec = rows.map(_.getAs[Double]("recall"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b },
      s"recall must not rise as r grows: ${rec.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Double]("recall") >= 0.0 &&
        r.getAs[Double]("recall") <= 1.0)
      assert(r.getAs[Long]("cand_pairs") >= 0L)
    }
  }

  test("q252: slot counts non-negative and sum to at most the table size") {
    val rows = ScoringQueries.qNegSampling(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("slots") >= 0L))
    // emitted top-30 is a subset, so its slot mass is bounded by 10^6
    assert(rows.map(_.getAs[Long]("slots")).sum <= 1000000L)
  }

  test("q239: segment digits are 1..3 and value-banding keeps ties together") {
    val rows = TimeQueries.qRfmFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '3'), seg)
    }
    // equal frequency => equal frequency-digit (ntile would split ties)
    rows.groupBy(_.getAs[Long]("frequency")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("segment").charAt(1)).toSet.size == 1)
    }
  }

  test("q238: kappa cells partition the corpus and kappa is within [-1, 1]") {
    val r = ScoringQueries.qGateKappa(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    assert(n == r.getAs[Long]("n11") + r.getAs[Long]("n10") +
      r.getAs[Long]("n01") + r.getAs[Long]("n00"))
    val k = r.getAs[Double]("kappa")
    assert(k >= -1.0 && k <= 1.0)
  }

  test("q254: 1-bit estimate agrees with the full signature in direction") {
    val rows = DedupQueries.qBbitMinhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("j_b1") >= -1.0 &&
        r.getAs[Double]("j_b1") <= 1.0)
      assert(r.getAs[Long]("n_bit_match") >= 0L &&
        r.getAs[Long]("n_bit_match") <= 32L)
    }
    // mean absolute error of the 1-bit estimator stays bounded on the
    // blocked (high-J) pairs: E[err] = 0, sd ~ 2*sqrt(p(1-p)/32) < 0.2
    val mae = rows.map(r => math.abs(r.getAs[Double]("err_b1"))).sum /
      rows.length
    assert(mae < 0.35, s"1-bit estimator MAE $mae out of family")
  }

  test("q269: bins respect the budget, pad = 512 - used, multi-doc bins can't absorb their successor") {
    val rows = QualityQueries.qPadPacking(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val used = r.getAs[Long]("used_tokens")
      val pad  = r.getAs[Long]("pad_tokens")
      assert(used >= 1L && used <= 512L)
      assert(pad == 512L - used)
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
    // bin ids are dense per shard (NFD opens bins sequentially)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
      val bins = rs.map(_.getAs[Long]("bin_id")).sorted
      assert(bins.toSeq == (0L until bins.length).toSeq,
        s"shard $sh: bin ids not dense")
    }
  }

  test("q270: rendezvous moves ~1/9 of keys, mod-hash ~8/9; everything conserved") {
    val rows = StorageQueries.qRendezvousShards(spark, sf).collect()
    val bySch = rows.map(r => r.getAs[String]("scheme") -> r).toMap
    val hrw = bySch("rendezvous"); val md = bySch("mod")
    val n = hrw.getAs[Long]("n_docs")
    assert(n == md.getAs[Long]("n_docs"))
    val fHrw = hrw.getAs[Double]("moved_frac")
    val fMod = md.getAs[Double]("moved_frac")
    // HRW's movement is exactly the mass the new shard wins (E=1/9);
    // mod-hash remaps everything whose residue changes (E=8/9)
    assert(fHrw < 0.25, s"rendezvous moved $fHrw — minimal-movement violated")
    assert(fMod > 0.7, s"mod moved only $fMod — expected near-total remap")
    assert(hrw.getAs[Long]("max_load") >= hrw.getAs[Long]("min_load"))
  }

  test("q274: zone-map scan never under-reads; Z-order at worst matches the best single sort on the 2D predicate") {
    val rows = StorageQueries.qCurvePruning(spark, sf).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_match"),
        s"${r.getAs[String]("layout")}/${r.getAs[String]("pred")}: " +
          "pruning dropped matching rows")
    }
    def scanned(layout: String, pred: String): Long =
      rows.find(r => r.getAs[String]("layout") == layout &&
        r.getAs[String]("pred") == pred).get.getAs[Long]("rows_scanned")
    assert(scanned("by_zorder", "both") <=
      math.min(scanned("by_lang", "both"), scanned("by_chars", "both")),
      "Z-order must win (or tie) the two-dimensional predicate")
  }

  test("q275: measured FPP tracks theory and decreases in filter size") {
    val rows = StorageQueries.qBloomCalibration(spark, sf).collect()
      .sortBy(_.getAs[Long]("m"))
    assert(rows.length == 4)
    rows.foreach { r =>
      val th = r.getAs[Double]("theory_fpp")
      val ms = r.getAs[Double]("measured_fpp")
      // binomial noise at ~150 probes: allow a generous absolute band
      assert(math.abs(ms - th) < 0.12,
        s"m=${r.getAs[Long]("m")}: measured $ms vs theory $th")
      assert(r.getAs[Long]("bits_set") <= 2L * r.getAs[Long]("n_members"))
    }
    val th = rows.map(_.getAs[Double]("theory_fpp"))
    assert(th.zip(th.tail).forall { case (a, b) => a >= b },
      "theory FPP must fall as m grows")
  }

  test("q276: quantile matching removes the length confound; deciles complete") {
    val rows = QualityQueries.qMatchedCorpora(spark, sf).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L to 9L))
    rows.foreach { r =>
      val gap = r.getAs[Double]("mean_abs_gap")
      val m = math.max(r.getAs[Double]("mean_len_en"),
        r.getAs[Double]("mean_len_de"))
      // matched quantiles must track: residual gap well under the level
      assert(gap < 0.5 * m,
        s"decile ${r.getAs[Long]("decile")}: gap $gap vs level $m")
      assert(r.getAs[Long]("n_pairs") >= 1L)
    }
    // matched means must be monotone in the decile (CDF alignment)
    val en = rows.map(_.getAs[Double]("mean_len_en"))
    assert(en.zip(en.tail).forall { case (a, b) => a <= b })
  }

  test("q271: bootstrap CI brackets the point mean; se positive and sane") {
    val rows = QualityQueries.qPoissonBootstrap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mu = r.getAs[Double]("mean_chars")
      val se = r.getAs[Double]("boot_se")
      assert(se > 0.0)
      assert(r.getAs[Double]("ci_lo") <= mu && mu <= r.getAs[Double]("ci_hi"))
      // Poisson-bootstrap SE of a mean ~ sd/sqrt(n): sanity-bound it by
      // the mean itself (lengths have cv well under 1 per source)
      assert(se < mu, s"${r.getAs[String]("source")}: se $se vs mu $mu")
    }
  }
}
