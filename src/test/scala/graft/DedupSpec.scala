package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupQueries, SimilarityQueries}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("cross-lingual dup matrix: planted dups cross language boundaries") {
    import spark.implicits._
    val m = DedupQueries.qCrossLingualDup(spark, sf)
      .as[(String, String, Long, Boolean)].collect()
    assert(m.nonEmpty)
    m.foreach { case (a, b, n, x) =>
      assert(a <= b && n >= 1 && x == (a != b))
    }
    // the corpus plants near-dup text across languages (q31's blocking
    // rationale) — per-language dedup would miss these rows
    assert(m.exists(_._4), "expected cross-lingual duplicate mass")
  }

  test("cohort value: cumulative per-user value is nondecreasing in age") {
    import spark.implicits._
    val rows = graft.operators.TimeQueries.qCohortValue(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val curve = rs.sortBy(_._2).map(_._4)
      assert(curve.sameElements(curve.sorted),
        s"cohort $cohort LTV curve decreased: ${curve.mkString(",")}")
      assert(rs.forall(_._3 > 0))
    }
  }

  test("LSH tuning: S-curve monotone in r, candidate volume anti-monotone") {
    import spark.implicits._
    val rows = DedupQueries.qLshTuning(spark, sf)
      .as[(Int, Int, Double, Double, Long, Long)].collect()
      .sortBy(_._2) // by r ascending: (32,1), (16,2), (8,4), (4,8)
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((32, 1), (16, 2), (8, 4), (4, 8)))
    // more rows per band ⇒ higher threshold, lower detection at fixed J,
    // fewer candidate pairs — the three monotonicities the table exists
    // to show
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 < hi._3, "threshold must rise with r")
      assert(lo._4 >= hi._4, "p@0.8 must not rise with r")
      assert(lo._6 >= hi._6, "candidate volume must not rise with r")
    }
  }

  test("minhash estimate: unbiased-ish and bounded on candidate pairs") {
    import spark.implicits._
    val rows = DedupQueries.qMinhashEstimate(spark, sf)
      .select($"j_est", $"j_exact", $"err").as[(Double, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (est, ex, err) =>
      assert(est >= 0.0 && est <= 1.0 && ex >= 0.0 && ex <= 1.0)
      assert(math.abs(err) <= 0.35,
        s"estimator error $err beyond 4x the 1/sqrt(32) std bound")
    }
    val meanAbs = rows.map(t => math.abs(t._3)).sum / rows.length
    assert(meanAbs < 0.1, s"mean |err| $meanAbs too high for k=32")
  }

  test("sparse cosine: bounded, canonical pairs, finds the planted near-dups") {
    import spark.implicits._
    val got = DedupQueries.qSparseCosine(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty, "sparse cosine should surface near-dup pairs")
    got.foreach { case (x, y, c) =>
      assert(x < y, "pairs must be canonical x < y")
      assert(c >= 0.5 && c <= 1.0001, s"cos $c out of range")
    }
    // idf-weighted cosine must agree with q31's exact jaccard on the
    // high end: every >= 0.9-jaccard pair is also a >= 0.5-cosine pair
    val jac = DedupQueries.qNgramJaccard(spark, sf)
      .filter($"jaccard" >= 0.9).select($"x_id", $"y_id")
      .as[(Long, Long)].collect().toSet
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(jac.subsetOf(pairs),
      s"missing high-jaccard pairs: ${jac -- pairs}")
  }

  test("dup-by-quality: deciles partition the corpus, rates bounded") {
    import spark.implicits._
    val rows = DedupQueries.qDupByQuality(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1 to 10).toSet))
    assert(rows.map(_._2).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { case (_, n, d, r) =>
      assert(d <= n && r >= 0.0 && r <= 1.0)
    }
  }

  test("containment is asymmetric: a quoted-whole doc scores 1.0 one way") {
    import spark.implicits._
    // doc 1 is a strict prefix of doc 2: every shingle of 1 appears in
    // 2 (containment 1→2 = 1.0) but 2 has extra shingles (2→1 < 1.0,
    // below threshold here). Jaccard would score this pair ~0.53 and
    // q31's 0.9-style gate would MISS it — the case q159 exists for.
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    val extra = words + " " + (13 to 21).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, extra), (3L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text")
    val got = DedupQueries.containmentPairs(docs)
      .select($"x_id", $"y_id", $"containment").as[(Long, Long, Double)]
      .collect().toSet
    assert(got === Set((1L, 2L, 1.0)),
      s"expected only the 1→2 full-containment edge, got $got")
  }

  test("minhash-LSH candidates verified by exact jaccard (>= 0.9 contract)") {
    import spark.implicits._
    // q32's output is LSH candidates re-checked with EXACT shingle
    // jaccard; every emitted pair must clear the 0.9 threshold (where
    // 8x4 banding detects with p >= 0.9998 on any corpus — round-2
    // ADVICE), and this corpus's planted near-dups sit at >= 0.9
    val got = DedupQueries.qMinhashLsh(spark, sf)
      .select($"x_id", $"y_id", $"jaccard").collect()
    assert(got.nonEmpty, "LSH should surface candidate pairs on sf0.001")
    got.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.9 && j <= 1.0)
    }
  }

  test("dup-cluster resolution: labels are the per-component min doc_id") {
    import spark.implicits._
    val pairs = DedupQueries.qMinhashLsh(spark, sf)
      .select($"x_id", $"y_id").as[(Long, Long)].collect()
    val labels = DedupQueries.qDupClusters(spark, sf)
      .select($"doc_id", $"keeper_id").as[(Long, Long)].collect().toMap
    assert(labels.nonEmpty)
    // every doc in a pair is labeled, both ends agree, keeper <= doc
    pairs.foreach { case (x, y) =>
      assert(labels(x) == labels(y), s"pair ($x,$y) split across clusters")
    }
    labels.foreach { case (d, k) =>
      assert(k <= d)
      assert(labels(k) == k, s"keeper $k of $d is not its own keeper")
    }
    // labels match an independently computed transitive closure
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def component(seed: Long): Set[Long] = {
      var seen = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    labels.keys.foreach { d =>
      assert(labels(d) == component(d).min)
    }
  }

  test("simhash: one 64-bit sketch per doc, stable across runs") {
    import spark.implicits._
    val a = DedupQueries.qSimhash(spark, sf).select($"doc_id", $"simhash")
      .as[(Long, Long)].collect().toMap
    val b = DedupQueries.qSimhash(spark, sf).select($"doc_id", $"simhash")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.size == 500)
  }

  test("identical texts get identical simhash and minhash signatures") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dups = docs.groupBy($"text").count().filter($"count" > 1)
    if (dups.head(1).nonEmpty) {
      val sameText = docs.join(dups.select($"text"), "text")
      val hashes = DedupQueries.qSimhash(spark, sf)
        .join(sameText.select($"doc_id", $"text"), "doc_id")
        .groupBy($"text").agg(org.apache.spark.sql.functions.countDistinct($"simhash").as("n"))
      assert(hashes.filter($"n" > 1).head(1).isEmpty)
    }
  }

  test("source matrix: cells canonical, pair mass conserved") {
    import spark.implicits._
    val cells = DedupQueries.qSourceMatrix(spark, sf)
      .as[(String, String, Long)].collect()
    assert(cells.nonEmpty)
    cells.foreach { case (a, b, n) =>
      assert(a <= b, s"cell ($a,$b) not canonical")
      assert(n > 0)
    }
    val totalPairs = DedupQueries.qMinhashLsh(spark, sf).count()
    assert(cells.map(_._3).sum == totalPairs,
      "every verified pair lands in exactly one matrix cell")
  }

  test("keeper policy: one keeper per q64 cluster, the longest member wins") {
    import spark.implicits._
    val labels = DedupQueries.qDupClusters(spark, sf)
      .as[(Long, Long)].collect()
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    val got = DedupQueries.qKeeperPolicy(spark, sf)
      .select($"cluster_id", $"keeper_id", $"n_members")
      .as[(Long, Long, Long)].collect()
    val clusters = labels.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(got.map(_._1).toSet == clusters.keySet.toSet,
      "one output row per q64 cluster label")
    got.foreach { case (cid, keeper, n) =>
      val members = clusters(cid)
      assert(members.contains(keeper) && n == members.size)
      val best = members.maxBy(m => (chars(m), -m))
      assert(keeper == best,
        s"cluster $cid: keeper $keeper is not the longest member $best")
    }
  }

  test("incremental LSH equals the full run restricted to pairs touching the append") {
    import spark.implicits._
    val full = DedupQueries.qMinhashLsh(spark, sf)
      .select($"x_id", $"y_id").as[(Long, Long)].collect().toSet
    val inc = DedupQueries.qIncrementalLsh(spark, sf)
      .select($"x_id", $"y_id", $"kind").as[(Long, Long, String)].collect()
    val expected = full.filter { case (x, y) => x % 3 == 0 || y % 3 == 0 }
    assert(inc.map(t => (t._1, t._2)).toSet == expected,
      "incremental result must be exactly the full pairs touching %3==0")
    inc.foreach { case (x, y, kind) =>
      val expect = if (x % 3 == 0 && y % 3 == 0) "new_new" else "new_index"
      assert(kind == expect, s"pair ($x,$y) mislabeled $kind")
    }
  }

  test("contamination fraction: bounded in [0,1], and q35's near/exact hits score high") {
    import spark.implicits._
    val frac = DedupQueries.qContamFraction(spark, sf)
      .select($"doc_id", $"contam_frac").as[(Long, Double)].collect().toMap
    assert(frac.nonEmpty)
    frac.values.foreach(f => assert(f >= 0.0 && f <= 1.0))
    // every corpus doc q35 flags (>=0.5 whole-doc Jaccard vs some bench
    // doc) must also carry a high fractional score — the fractional
    // form refines, never contradicts, the boolean form
    val flagged = DedupQueries.qContamination(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    flagged.foreach { id =>
      assert(frac.getOrElse(id, 0.0) >= 0.5,
        s"doc $id flagged by q35 but contam_frac=${frac.get(id)}")
    }
  }

  test("training manifest: drop ledger sums to corpus; dup drops equal q68's losers") {
    import spark.implicits._
    val m = DedupQueries.qTrainingManifest(spark, sf).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val parts = Seq("n_kept", "drop_exact", "drop_near", "drop_contam",
        "drop_quality").map(c => r.getAs[Long](c)).sum
      assert(parts == r.getAs[Long]("n_docs"),
        s"lang ${r.getString(0)}: ledger $parts != n_docs " +
          s"${r.getAs[Long]("n_docs")} — a doc was double-counted or lost")
    }
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(m.map(_.getAs[Long]("n_docs")).sum == corpus)
    // exact losers are cluster losers too (exact keeper >= component
    // keeper), so the manifest's two dup buckets partition q68's losers
    val q68losers = DedupQueries.qDedupReport(spark, sf)
      .select($"n_losers").as[Long].head()
    val dupDrops = m.map(r =>
      r.getAs[Long]("drop_exact") + r.getAs[Long]("drop_near")).sum
    assert(dupDrops == q68losers,
      s"manifest dup drops $dupDrops != q68 losers $q68losers")
  }

  test("last-kept throttle: exact sequential-fold replay; q89 kept-set is a strict subset") {
    import spark.implicits._
    val all = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type",
        $"ts".cast("double").as("sec"))
      .as[(Long, Long, String, Double)].collect()
    // reference fold: per key, keep iff ts - last_KEPT ts > 1h
    val expected = all.groupBy(e => (e._2, e._3)).values.flatMap { evs =>
      var last = Double.NegativeInfinity
      evs.sortBy(e => (e._4, e._1)).toSeq.flatMap { e =>
        if (e._4 - last > 3600.0) { last = e._4; Some(e._1) } else None
      }
    }.toSet
    val kept = graft.operators.TimeQueries.qThrottleLastKept(spark, sf)
      .select($"event_id").as[Long].collect().toSet
    assert(kept == expected, "HOF aggregate must equal the sequential fold")
    // lag-based q89 can only keep events the throttle also keeps: the
    // last kept ts is never later than the immediate predecessor's, so
    // pred-gap > 1h implies kept-gap > 1h. Sustained sub-hour bursts give
    // the strictness (throttle re-emits hourly; q89 suppresses forever).
    val lagKept = graft.operators.TimeQueries.qWindowedDedup(spark, sf)
      .select($"event_id").as[Long].collect().toSet
    assert(lagKept.subsetOf(kept), "q89 keeps ⊆ q103 keeps must hold")
  }

  test("q103 streamed keyed-run fold is row-identical to the array form") {
    // The registered q103 streams the fold (sortWithinPartitions +
    // mapPartitions, O(1) state); the demoted collect_list form is the
    // round-5 implementation. They must agree row-for-row, including
    // column order and ts values.
    val streamed = graft.operators.TimeQueries
      .qThrottleLastKept(spark, sf).collect().toSeq
    val arrayForm = graft.operators.TimeQueries
      .throttleLastKeptArray(spark, sf).collect().toSeq
    assert(streamed.nonEmpty && streamed == arrayForm)
  }

  test("windowed dedup: survivors are > 1h apart per key, drops have a fresh predecessor") {
    import spark.implicits._
    val all = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type",
        $"ts".cast("double").as("sec"))
      .as[(Long, Long, String, Double)].collect()
    val kept = graft.operators.TimeQueries.qWindowedDedup(spark, sf)
      .select($"event_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size < all.length,
      "the window must actually suppress some repeats at this sf")
    all.groupBy(e => (e._2, e._3)).foreach { case (_, evs) =>
      evs.sortBy(e => (e._4, e._1)).sliding(2).foreach {
        case Array(prev, cur) =>
          val fresh = cur._4 - prev._4 <= 3600.0
          assert(kept.contains(cur._1) == !fresh,
            s"event ${cur._1}: gap ${cur._4 - prev._4}s, kept=${kept.contains(cur._1)}")
        case single => assert(kept.contains(single.head._1),
          "a key's first event is always kept")
      }
    }
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("LSH ANN results are a subset of brute-force scores (same cosine)") {
    import spark.implicits._
    val brute = SimilarityQueries.qCosineTopk(spark, sf)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)]
      .collect().map { case (q, v, c) => (q, v) -> c }.toMap
    val lsh = SimilarityQueries.qLshAnn(spark, sf)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // any LSH pair that brute-force also ranked must agree on the score
    lsh.foreach { case (q, v, c) =>
      brute.get((q, v)).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
  }

  test("multi-probe LSH strictly improves recall over the base index") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val truth = pairs(SimilarityQueries.qCosineTopk(spark, sf))
    val base  = pairs(SimilarityQueries.qLshAnn(spark, sf))
    val multi = pairs(SimilarityQueries.qMultiprobeLsh(spark, sf))
    val baseR  = (truth & base).size.toDouble / truth.size
    val multiR = (truth & multi).size.toDouble / truth.size
    assert(multiR > baseR,
      s"multi-probe recall $multiR must beat base $baseR")
    // the probe fan-out must also never LOSE a base hit: every bucket
    // the base index probes is probed here too (mask 0 is in the list)
    assert(base.subsetOf(multi) || (base -- multi).forall(p => !truth(p)),
      "multi-probe dropped a base true-positive")
  }

  test("IVF ANN: scores agree with brute force; recall is substantial") {
    import spark.implicits._
    val brute = SimilarityQueries.qCosineTopk(spark, sf)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)]
      .collect().map { case (q, v, c) => (q, v) -> c }.toMap
    val ivf = SimilarityQueries.qIvfAnn(spark, sf)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, v, c) =>
      brute.get((q, v)).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
    val recall = ivf.count { case (q, v, _) => brute.contains((q, v)) }
      .toDouble / brute.size
    info(f"IVF recall@5 vs brute force: $recall%.3f")
    assert(recall > 0.1, "probing 2/8 cells should recover a real fraction")
  }

  test("incremental dedup: combo keys find exactly the brute-force matches") {
    import spark.implicits._
    // Manku pigeonhole: with hamming <= 3 over 6 blocks some 3-subset of
    // blocks is clean, so candidate generation must be LOSSLESS — the
    // engine's output equals brute-force new-vs-index matching on the
    // same sketches.
    val sk = DedupQueries.qSimhash(spark, sf)
      .select($"doc_id", $"simhash").as[(Long, Long)].collect()
    val idx = sk.filter(_._1 % 3 != 0)
    val brute = sk.filter(_._1 % 3 == 0).flatMap { case (nid, nsh) =>
      val ms = idx.map { case (iid, ish) =>
        (java.lang.Long.bitCount(nsh ^ ish), iid)
      }.filter(_._1 <= 3)
      if (ms.isEmpty) None else Some((nid, ms.min._1, ms.min._2))
    }.toSet
    val got = DedupQueries.qIncrementalDedup(spark, sf)
      .as[(Long, Int, Long)].collect().toSet
    assert(got.nonEmpty, "sf0.001 plants near-dups across the % 3 split")
    assert(got == brute, "combo-key candidates must be lossless")
  }

  test("semdedup: drops point at an earlier same-cell vector above tau") {
    import spark.implicits._
    val out = SimilarityQueries.qSemDedup(spark, sf)
      .as[(Long, Int, Boolean, Long)].collect()
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val dropped = out.filter(!_._3)
    assert(dropped.nonEmpty, "tau=0.3 must prune something on sf0.001")
    val vecsById = TestSpark.spark.read
      .parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    dropped.foreach { case (id, cell, _, dupOf) =>
      assert(dupOf >= 0 && dupOf < id, s"keeper must precede $id")
      assert(cellOf(dupOf) == cell, s"$id's keeper $dupOf is in another cell")
      assert(cos(vecsById(id), vecsById(dupOf)) >= 0.3 - 1e-9,
        s"$id and $dupOf are below the prune threshold")
    }
  }

  test("random projection preserves pairwise distances in the JL sense") {
    import spark.implicits._
    val reduced = SimilarityQueries.qRandomProjection(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (1 until 17).map(r.getDouble).toArray).toMap
    val full = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .as[(Long, Seq[Double])].collect().toMap
    assert(reduced.size == full.count(_._2.exists(_ != 0.0)))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = reduced.keys.toArray.sorted
    val ratios = (0 until 200).map { i =>
      val x = ids(i % ids.length); val y = ids((i * 7 + 3) % ids.length)
      if (x == y) 1.0
      else d2(reduced(x), reduced(y)) /
        d2(full(x).toArray, full(y).toArray)
    }
    val med = ratios.sorted.apply(ratios.length / 2)
    info(f"median distance ratio reduced/full: $med%.3f")
    // k=16 gives sqrt(2/k) ≈ 0.35 relative stddev per pair; the median
    // ratio must sit near 1 or the projection isn't JL at all
    assert(med > 0.5 && med < 1.5, s"median distortion $med out of range")
  }

  test("LSH ANN finds a nonzero fraction of true top-5 neighbors") {
    import spark.implicits._
    val brute = SimilarityQueries.qCosineTopk(spark, sf)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val lsh = SimilarityQueries.qLshAnn(spark, sf)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"ANN recall@5 vs brute force: $recall%.3f")
    assert(recall > 0.0)
  }

  test("prefix join: COMPLETE — equals the naive all-pairs join at tau=0.8") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pruned = DedupQueries.qPrefixJoin(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // naive truth: every pair, exact integer threshold, no filtering
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", split($"text", " ").as("tk"))
      .select($"doc_id", array_distinct(expr(
        "zip_with(slice(tk, 1, greatest(size(tk)-2, 0)), " +
        "zip_with(slice(tk, 2, greatest(size(tk)-2, 0)), " +
        "slice(tk, 3, greatest(size(tk)-2, 0)), (y, z) -> concat_ws(' ', y, z)), " +
        "(x, yz) -> concat_ws(' ', x, yz))")).as("sh"))
      .filter(size($"sh") > 0)
    val a = sets.select($"doc_id".as("doc_a"), $"sh".as("sa"))
    val b = sets.select($"doc_id".as("doc_b"), $"sh".as("sb"))
    val inter = size(array_intersect($"sa", $"sb")).cast("long")
    val naive = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", inter.as("i"),
        size($"sa").cast("long").as("na"), size($"sb").cast("long").as("nb"))
      .filter($"i" * 5 >= ($"na" + $"nb" - $"i") * 4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pruned == naive,
      s"prefix filter missed ${(naive -- pruned).size} pairs / " +
        s"invented ${(pruned -- naive).size}")
    info(s"${naive.size} qualifying pairs, prefix filter exact")
  }

  test("q222 SNM: canonical pairs within the window, all above threshold") {
    val rows = DedupQueries.qSnmDedup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("x_id") < r.getAs[Long]("y_id"))
      assert(Set(1, 2).contains(r.getAs[Int]("w_dist")))
      assert(r.getAs[Double]("sim") >= 0.7)
    }
    // linear-by-construction: candidate volume ≤ (w−1)·n even before
    // the similarity gate, so the emitted set is bounded by 2n
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length <= 2 * n)
  }

  test("q223 FS: weight is the exact sum of per-field contributions; verdict bands consistent") {
    def fsw(agree: Boolean, m: Double, u: Double): Double =
      if (agree) math.log(m / u) else math.log((1.0 - m) / (1.0 - u))
    DedupQueries.qFsLinkage(spark, sf).collect().foreach { r =>
      val w = fsw(r.getAs[Boolean]("agr_lang"), 0.95, 0.30) +
        fsw(r.getAs[Boolean]("agr_source"), 0.90, 0.25) +
        fsw(r.getAs[Boolean]("agr_band"), 0.85, 0.10) +
        fsw(r.getAs[Boolean]("agr_prefix"), 0.70, 0.01)
      assert(math.abs(r.getAs[Double]("fs_weight") - w) < 1e-3)
      val verdict = r.getAs[String]("verdict")
      if (w >= 4.0) assert(verdict === "link")
      else if (w < 0.0) assert(verdict === "non_link")
      else assert(verdict === "possible")
    }
  }

}
