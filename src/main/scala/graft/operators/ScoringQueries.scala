package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.functions.TextOps
import graft.Barrier._
import graft.sources.Tables

/** Corpus-relative document scoring — the two classic "score every doc
  * against corpus-global statistics" shapes a training-data pipeline
  * runs after cleaning and before mixing:
  *
  *  - TF-IDF top terms per document (q71): the retrieval-era keyword
  *    ranking (Sparck Jones 1972; the smoothed idf is the scikit-learn
  *    formulation ln((N+1)/(df+1))+1, published and engine-replayable).
  *  - Unigram-LM negative log-likelihood (q72): the CCNet/KenLM-style
  *    perplexity proxy (Wenzek et al. 2020 filter corpora by LM score;
  *    the unigram variant is the self-contained form — score each doc
  *    by the mean -ln p(token) under the corpus' own unigram MLE).
  *
  * Both follow the same scale shape: one (doc_id, term) partial-agg
  * shuffle for term counts, a vocabulary-sized aggregate, and a
  * broadcast of the vocabulary statistics back onto the token stream —
  * the per-token join never shuffles the corpus a second time. The
  * vocabulary table is kept broadcastable BY CONSTRUCTION: [[unkFold]]
  * caps the token stream to the top-V terms by corpus count and folds
  * the long tail into an UNK bucket (the standard LM move), so every
  * vocabulary-keyed statistic downstream is a ≤ V+1-row frame whatever
  * the corpus size. Bigram-keyed model tables (q93/q160) are V²-bounded
  * rather than V+1-bounded, so those joins carry no broadcast hint and
  * the planner picks shuffle vs broadcast from runtime stats.
  */
object ScoringQueries extends QueryModule {

  /** Vocabulary cap for the corpus-LM scoring family (q71/q72/q93/
    * q115/q160): 24 of this corpus' 31 distinct terms, so the UNK fold
    * is NON-VACUOUS at every SF (q164's frozen-vocab posture); at
    * 100 TB the knob is the tokenizer-scale 10⁵ and the plan is
    * unchanged — the point is that the vocab frame is ≤ TopV+1 rows by
    * construction, which is what licenses its explicit broadcast. */
  private[graft] val ScoreTopV = 24

  /** The fold target for out-of-vocabulary terms. */
  private[graft] val UnkToken = "<unk>"

  /** min-df/UNK vocabulary fold: rank terms by corpus count (ties by
    * term asc — a total order, replayed verbatim by the oracle), keep
    * the top `topV`, rewrite every other token to [[UnkToken]]. The
    * global rank is Filter(row_number ≤ V) with an empty partition
    * spec, which TopKWindowRule rewrites to the bounded-heap aggregate
    * — no single-partition sort of the full vocabulary; the ≤ V-row
    * vocab frame then broadcasts back onto the token stream. Columns
    * other than `term` (doc_id / pos / source) pass through. */
  private[graft] def unkFold(toks: DataFrame,
      topV: Int = ScoreTopV): DataFrame =
    unkFoldWith(toks, toks, topV)

  /** The general form: the top-V vocabulary is ranked on `vocabSrc`
    * (e.g. the TRAIN slice) and applied to `toks` — a held-out stream
    * folded with the train vocab can only contain terms the train
    * model has mass for, which is what makes q282's EM well-defined. */
  private[graft] def unkFoldWith(toks: DataFrame, vocabSrc: DataFrame,
      topV: Int): DataFrame = {
    val vocab = vocabSrc.groupBy(col("term")).agg(count(lit(1)).as("vcnt"))
      .withColumn("vrk", row_number().over(
        Window.orderBy(col("vcnt").desc, col("term").asc)))
      .filter(col("vrk") <= topV)
      .select(col("term"), lit(1).as("iv"))
    val cols = toks.columns
    toks.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("term",
        when(col("iv").isNull, lit(UnkToken)).otherwise(col("term")))
      .select(cols.map(col).toSeq: _*)
  }

  /** Shared oracle CTE chain replaying [[unkFold]]: ends in
    * `toks(doc_id, source, pos, term)` with the tail folded. */
  private def foldedToksCtes: String =
    s"""WITH raw AS (
      |  SELECT doc_id, source, i AS pos, tk[i] AS t0
      |  FROM (SELECT doc_id, source, str_split(text, ' ') AS tk,
      |          unnest(range(1, len(tk) + 1)) AS i FROM documents)),
      |vcap AS (
      |  SELECT t0 FROM (
      |    SELECT t0, row_number() OVER (
      |      ORDER BY count(*) DESC, t0 ASC) AS vrk
      |    FROM raw GROUP BY t0)
      |  WHERE vrk <= $ScoreTopV),
      |toks AS (
      |  SELECT r.doc_id, r.source, r.pos,
      |    CASE WHEN v.t0 IS NULL THEN '$UnkToken' ELSE r.t0 END AS term
      |  FROM raw r LEFT JOIN vcap v USING (t0))""".stripMargin

  /** Shared q380/q391 oracle chain: folded tokens → quantized per-doc
    * NLL → per-source quartiles → cells → reference → `scored`
    * (source, quartile, n_docs, n_tokens, m_nll, w_old, excess, k). */
  private def quartileScoredCtes: String =
    s"""$foldedToksCtes,
      |freq AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY term),
      |tot AS (SELECT sum(cnt) AS total FROM freq),
      |perdoc AS (
      |  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_toks,
      |    sum(CAST(floor(-ln(CAST(cnt AS DOUBLE) / total) * 1e9
      |      + 0.5) AS BIGINT)) AS sum_q
      |  FROM toks JOIN freq USING (term) CROSS JOIN tot
      |  GROUP BY source, doc_id),
      |pd2 AS (
      |  SELECT *, CAST(sum_q AS DOUBLE) / n_toks / 1e9 AS m_nll
      |  FROM perdoc),
      |qt AS (
      |  SELECT *, ntile(4) OVER (PARTITION BY source
      |    ORDER BY m_nll, doc_id) AS quartile
      |  FROM pd2),
      |cells AS (
      |  SELECT source, quartile, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |    sum(sum_q) AS cell_q
      |  FROM qt GROUP BY source, quartile),
      |c2 AS (
      |  SELECT *, CAST(cell_q AS DOUBLE) / n_tokens / 1e9 AS m_nll
      |  FROM cells),
      |ref AS (
      |  SELECT CAST(sum(cell_q) AS DOUBLE) / sum(n_tokens) / 1e9
      |      AS ref_nll,
      |    CAST(sum(n_tokens) AS DOUBLE) AS tok_all,
      |    CAST(count(*) AS DOUBLE) AS k
      |  FROM c2),
      |scored AS (
      |  SELECT source, quartile, n_docs, n_tokens, m_nll,
      |    n_tokens / tok_all AS w_old,
      |    greatest(0.0, m_nll - ref_nll) AS excess, k
      |  FROM c2 CROSS JOIN ref)""".stripMargin

  /** Per-document top-3 terms by smoothed TF-IDF. The per-doc ranking is
    * the Filter(row_number <= k) idiom, which TopKWindowRule rewrites to
    * the bounded-heap top_k_rows aggregate — O(k) state per document,
    * no per-doc sort of the full term list. Ties are impossible within
    * a doc (term is the tie-break and terms are distinct per doc), so
    * the rewrite's determinism guard is satisfied. */
  def qTfidfTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val tf = unkFold(docs
      .select($"doc_id", explode(split($"text", " ")).as("term")))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    // df over the distinct (doc, term) frame = document frequency;
    // ≤ V+1 rows after the fold, so the broadcast is size-bounded
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .select($"doc_id", $"term",
        round($"tf" * (log(($"n_docs" + lit(1.0)) / ($"df" + lit(1.0))) +
          lit(1.0)), 4).as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    scored
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"term", $"score", $"rk")
      .orderBy($"doc_id", $"rk")
  }

  /** Unigram-LM document scoring: mean negative log-likelihood of each
    * document's tokens under the corpus unigram MLE p(t) = cnt(t)/total.
    * Low nll = stereotypical text, high nll = rare-token text — the
    * ranking CCNet buckets into head/middle/tail before sampling. The
    * token stream is scored by a broadcast of the vocabulary frequency
    * table; the only corpus-wide shuffle is the per-doc aggregate, which
    * reuses the (doc_id) grouping every other per-doc stat pays. */
  def qUnigramNll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = unkFold(Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term")))
    // ≤ V+1 rows after the fold — broadcast bounded by construction
    val freq = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum($"cnt").as("total"))
    toks
      .join(broadcast(freq), "term")
      .crossJoin(broadcast(tot))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log($"cnt".cast("double") / $"total")), 4).as("nll"))
      .orderBy($"doc_id")
  }

  /** Bigram-LM document scoring (q93): mean negative log-likelihood of
    * each document's token stream under a Laplace-smoothed corpus bigram
    * model, p(cur|prev) = (c(prev,cur) + 1) / (c(prev) + V) — the
    * conditional upgrade of q72's unigram score and the closest
    * self-contained stand-in for the KenLM 5-gram filter CCNet ships
    * (Wenzek et al. 2020). Smoothing matters operationally: unseen
    * transitions must score finite or one typo nukes the document.
    *
    * Shape: tokens get positions map-side (posexplode) and fold
    * through [[unkFold]] BEFORE bigram formation, the previous-token
    * column comes from a lag over (doc_id) — ONE shuffle of the token
    * stream, reusing the same (doc_id) partitioning the final per-doc
    * aggregate needs. The context table is ≤ V+1 rows after the fold
    * (broadcast, bounded by construction); the bigram table is
    * V²-bounded, not V-bounded, so its join carries NO hint and the
    * planner degrades to a shuffle join from stats instead of OOMing
    * on a forced broadcast; the probability math itself is codegen'd
    * arithmetic. */
  def qBigramNll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = unkFold(Tables.documents(s, dir)
      .select($"doc_id",
        posexplode(split($"text", " ")).as(Seq("pos", "term"))))
    val bi = toks
      .withColumn("prev", lag($"term", 1).over(w))
      .filter($"prev".isNotNull)
    val biCnt = bi.groupBy($"prev", $"term")
      .agg(count(lit(1)).as("c_bi"))
    val ctxCnt = biCnt.groupBy($"prev")
      .agg(sum($"c_bi").as("c_ctx"))
    val vocab = toks.agg(countDistinct($"term").cast("double").as("v"))
    bi
      .join(biCnt, Seq("prev", "term"))
      .join(broadcast(ctxCnt), Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(($"c_bi" + lit(1.0)) / ($"c_ctx" + $"v"))), 4)
          .as("nll"))
      .orderBy($"doc_id")
  }

  /** PPMI word-similarity (q228) — count-based distributional word
    * vectors (Church & Hanks 1990 PMI matrix, positive-clipped per
    * Levy & Goldberg 2014, who show word2vec SGNS implicitly factors
    * exactly this matrix): each word's vector is its PPMI row over
    * ±1-window contexts; similarity = cosine computed the SPARSE way —
    * an inverted join on the shared context (q172's discipline: cost ∝
    * shared non-zeros, no dense vector ever exists). Top-15 pairs by
    * similarity. Pipeline: ONE token-stream shuffle builds symmetric
    * pair counts; support ≥ 3 prunes the matrix (marginals computed on
    * the PRUNED matrix, replayed identically in the oracle). Marginal
    * and norm tables are vocabulary-proportional, so their joins carry
    * NO broadcast hint (q172's discipline) — they co-partition on the
    * same w/c keys their aggregates already used, and the planner may
    * still broadcast from stats when they are genuinely small. At
    * 100 TB the matrix additionally caps to the top-V vocabulary — the
    * standard practice that also bounds the context self-join. */
  def qPpmiSim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "term")))
    val bi = toks
      .withColumn("prev", lag($"term", 1).over(w))
      .filter($"prev".isNotNull && $"prev" =!= $"term")
    val pc = bi.select($"prev".as("w"), $"term".as("c"))
      .union(bi.select($"term".as("w"), $"prev".as("c")))
      .groupBy($"w", $"c").agg(count(lit(1)).as("n"))
      .filter($"n" >= 3)
    val wm = pc.groupBy($"w").agg(sum($"n").as("cw"))
    val cm = pc.groupBy($"c").agg(sum($"n").as("cc"))
    val tot = pc.agg(sum($"n").cast("double").as("t"))
    val ppmi = pc
      .join(wm, "w")
      .join(cm, "c")
      .crossJoin(broadcast(tot))
      .select($"w", $"c",
        greatest(lit(0.0),
          log(($"n".cast("double") * $"t") /
            ($"cw".cast("double") * $"cc"))).as("p"))
      .filter($"p" > 0)
    val norms = ppmi.groupBy($"w").agg(sum($"p" * $"p").as("n2"))
    val x = ppmi.select($"w".as("wa"), $"c", $"p".as("pa"))
    val y = ppmi.select($"w".as("wb"), $"c", $"p".as("pb"))
    val sims = x.join(y, Seq("c")).filter($"wa" < $"wb")
      .groupBy($"wa", $"wb").agg(sum($"pa" * $"pb").as("dotp"))
      .join(norms.select($"w".as("wa"), $"n2".as("na")), "wa")
      .join(norms.select($"w".as("wb"), $"n2".as("nb")), "wb")
      .select($"wa", $"wb",
        ($"dotp" / (sqrt($"na") * sqrt($"nb"))).as("sim"))
    val wTop = Window.orderBy(round($"sim", 6).desc, $"wa".asc, $"wb".asc)
    sims.withColumn("rk", row_number().over(wTop)).filter($"rk" <= 15)
      .select($"rk", $"wa", $"wb", round($"sim", 4).as("sim"))
      .orderBy($"rk")
  }

  /** Absolute discount for the Kneser-Ney model — the standard 0.75
    * (Chen & Goodman 1999's fixed-D variant). A named constant so the
    * oracle replays it as a literal. */
  private val KnD = 0.75

  /** Interpolated Kneser-Ney bigram scoring (q160): per-document mean
    * NLL under P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁) +
    * (D·N₁₊(w₁·)/c(w₁)) · N₁₊(·w₂)/N₁₊(··) — Kneser & Ney 1995 with
    * Chen & Goodman 1999's interpolated formulation. The fidelity
    * upgrade over q93's Laplace smoothing: the backoff weight is the
    * CONTINUATION count (how many distinct contexts a word follows),
    * not raw frequency — "Francisco" is frequent but follows only
    * "San", so KN correctly scores it unlikely in fresh contexts.
    * This is the smoothing family real KenLM corpus filters ship
    * (Heafield 2011 defaults to modified KN).
    *
    * Same plan skeleton as q93 — the token stream folds through
    * [[unkFold]] before bigram formation, then ONE token-stream shuffle
    * (the lag window on doc_id, reused by the final per-doc aggregate).
    * The context/continuation tables are ≤ V+1 rows after the fold and
    * the type count is a scalar — bounded broadcasts by construction;
    * the bigram-count table is V²-bounded, so its join carries no hint
    * (q93's discipline). Every scored bigram was counted in the same
    * corpus, so c ≥ 1 and no division guard is needed; the probability
    * arithmetic is codegen'd column math. */
  def qKneserNeyNll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = unkFold(Tables.documents(s, dir)
      .select($"doc_id",
        posexplode(split($"text", " ")).as(Seq("pos", "term"))))
    val bi = toks
      .withColumn("prev", lag($"term", 1).over(w))
      .filter($"prev".isNotNull)
    val biCnt = bi.groupBy($"prev", $"term")
      .agg(count(lit(1)).as("c_bi"))
    val ctx = biCnt.groupBy($"prev")
      .agg(sum($"c_bi").as("c_ctx"), count(lit(1)).as("n_follow"))
    val cont = biCnt.groupBy($"term")
      .agg(count(lit(1)).as("n_prec"))
    val nTypes = biCnt.agg(count(lit(1)).cast("double").as("n_types"))
    bi
      .join(biCnt, Seq("prev", "term"))
      .join(broadcast(ctx), Seq("prev"))
      .join(broadcast(cont), Seq("term"))
      .crossJoin(broadcast(nTypes))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(
          greatest($"c_bi" - lit(KnD), lit(0.0)) / $"c_ctx" +
            (lit(KnD) * $"n_follow" / $"c_ctx") * ($"n_prec" / $"n_types"))),
          4).as("kn_nll"))
      .orderBy($"doc_id")
  }

  /** DoReMi step size and uniform-smoothing mass — the published
    * defaults' shape (Xie et al. 2023 use a per-step η with uniform
    * mixing); literal so the oracle replays the same constants. */
  private val DoremiEta = 1.0
  private val DoremiSmooth = 0.1

  /** DoReMi-style one-step domain reweighting (q277) — the mixture
    * OPTIMIZATION step beside q49's temperature heuristic: domains
    * whose text the corpus-internal LM finds HARDER than the
    * token-weighted average (positive excess loss) get exponentially
    * upweighted, then the whole vector mixes with uniform mass so no
    * domain starves (Xie et al. 2023, "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining" — the group-DRO
    * multiplicative update, one round). The proxy excess loss is the
    * per-source mean unigram NLL minus the global token-weighted mean
    * (q72's published CCNet-style proxy in place of the paper's
    * trained reference model), clipped at 0 exactly as the paper
    * clips.
    *
    * Scale shape: ONE (source, term-folded) token pass — the unkFold
    * vocab broadcast plus a per-source partial agg to |sources| rows;
    * every subsequent frame (reference scalar, normalizer, weights) is
    * dimension-sized. */
  def qDoremiReweight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = unkFold(Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("term")))
    val freq = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum($"cnt").as("total"))
    val perSrc = toks
      .join(broadcast(freq), "term")
      .crossJoin(broadcast(tot))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log($"cnt".cast("double") / $"total")).as("m_nll"))
    val ref = perSrc.agg(
      (sum($"m_nll" * $"n_tokens") / sum($"n_tokens")).as("ref_nll"),
      sum($"n_tokens").cast("double").as("tok_all"),
      count(lit(1)).cast("double").as("k"))
    val scored = perSrc.crossJoin(broadcast(ref))
      .withColumn("w_old", $"n_tokens" / $"tok_all")
      .withColumn("excess", greatest(lit(0.0), $"m_nll" - $"ref_nll"))
      .withColumn("raw", $"w_old" * exp(lit(DoremiEta) * $"excess"))
    val z = scored.agg(sum($"raw").as("z"))
    scored.crossJoin(broadcast(z))
      .select($"source", $"n_tokens",
        round($"m_nll", 4).as("mean_nll"),
        (round($"excess", 4) + lit(0.0)).as("excess_nll"),
        round($"w_old", 4).as("w_old"),
        round(lit(1.0 - DoremiSmooth) * $"raw" / $"z" +
          lit(DoremiSmooth) / $"k", 4).as("w_new"))
      .orderBy($"source")
  }

  /** Percentile-bucketed domain mixing (q380) — the DoReMi follow-on
    * (round-15 verdict #8): q277 reweights whole DOMAINS, but the
    * lever a real pretraining mix actually pulls is finer — WITHIN
    * each domain, quality strata get different sampling rates (the
    * quality-bucketed CommonCrawl treatment). Each document scores a
    * corpus-LM mean NLL (per-token NLL quantized to the 1e-9 grid
    * BEFORE the doc sum — float Σ is order-dependent; the mean is
    * then exact-int ÷ exact-int, the identical double both engines),
    * docs split into per-source quality QUARTILES by
    * ntile(4) over the total (mean_nll, doc_id) order, and the
    * (source, quartile) CELLS — not the sources — take q277's
    * group-DRO multiplicative update: cells harder than the global
    * token-weighted mean get exp(η·excess) upweighting, smoothed with
    * uniform mass. The published table is the sampling-rate manifest
    * a mixture loader consumes: within one source, w_new now ramps
    * across quartiles instead of moving in lockstep.
    *
    * Scale shape: ONE folded token pass → per-doc partial agg (the
    * q72 class), one bounded ntile window per source (partitioned —
    * never global), then everything is |sources|·4-row metadata. The
    * cell NLL means and the reference mean divide exact integer
    * sums, so no float accumulation exists anywhere upstream of the
    * k-row softmax. */
  def qQuartileMixing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cell/reference sums widen to decimal before aggregation (the
    // dm() discipline): Σ over a cell's docs of 1e9-grid doc sums
    // wraps a long at 100 TB while DuckDB's HUGEINT sails on
    val cells = quartileCells(s, dir)
    val ref = cells.agg(
      (sum($"cell_q").cast("double") / sum($"n_tokens") / 1e9)
        .as("ref_nll"),
      sum($"n_tokens").cast("double").as("tok_all"),
      count(lit(1)).cast("double").as("k"))
    val scored = cells.crossJoin(broadcast(ref))
      .withColumn("w_old", $"n_tokens" / $"tok_all")
      .withColumn("excess", greatest(lit(0.0), $"m_nll" - $"ref_nll"))
      .withColumn("raw", $"w_old" * exp(lit(DoremiEta) * $"excess"))
    val z = scored.agg(sum($"raw").as("z"))
    scored.crossJoin(broadcast(z))
      .select($"source", $"quartile".cast("long").as("quartile"),
        $"n_docs", $"n_tokens",
        round($"m_nll", 4).as("mean_nll"),
        (round($"excess", 4) + lit(0.0)).as("excess_nll"),
        round($"w_old", 4).as("w_old"),
        round(lit(1.0 - DoremiSmooth) * $"raw" / $"z" +
          lit(DoremiSmooth) / $"k", 4).as("w_new"))
      .orderBy($"source", $"quartile")
  }

  /** The (source, quartile) cell frame shared by q380 and q391:
    * folded token pass → per-doc quantized NLL → per-source ntile(4)
    * → cell aggregates with the decimal-widened quantized mass. */
  private def quartileCells(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = unkFold(Tables.documents(s, dir)
      .select($"source", $"doc_id",
        explode(split($"text", " ")).as("term")))
    val freq = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum($"cnt").as("total"))
    val perDoc = toks.join(broadcast(freq), "term")
      .crossJoin(broadcast(tot))
      .select($"source", $"doc_id",
        floor(-log($"cnt".cast("double") / $"total") * 1e9 + 0.5)
          .cast("long").as("nllq"))
      .groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"nllq").as("sum_q"))
      .withColumn("m_nll", $"sum_q".cast("double") / $"n_toks" / 1e9)
    val wQ = Window.partitionBy($"source")
      .orderBy($"m_nll".asc, $"doc_id".asc)
    perDoc.withColumn("quartile", ntile(4).over(wQ))
      .groupBy($"source", $"quartile")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"),
        sum($"sum_q".cast("decimal(38,0)")).as("cell_q"))
      .withColumn("m_nll", $"cell_q".cast("double") / $"n_tokens" / 1e9)
  }

  /** DoReMi iteration-2 reweight on q380's cells (q391 — round-16
    * widening): the group-DRO multiplicative update applied TWICE
    * against the static corpus-LM excess (the proxy model does not
    * retrain between rounds here, so round 2 isolates the update's
    * own dynamics): w_t = (1−s)·(w_{t−1}·e^{η·excess})/Z_t + s/k.
    * The published trajectory (w0 → w1 → w2, plus the round-2 delta)
    * is the convergence read a mixture owner watches: hard cells keep
    * gaining mass round over round while the uniform floor keeps easy
    * cells alive. Determinism: each round's raw mass quantizes to the
    * 1e-12 grid BEFORE the Z sum, so the k-row normalizer is an
    * exact-integer sum (order-independent — one notch tighter than
    * q380's float Z, which its ≤ 20-row frame tolerates). Everything
    * past the single token pass is |sources|·4-row metadata. */
  def qDoremiIter2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = quartileCells(s, dir)
    val ref = cells.agg(
      (sum($"cell_q").cast("double") / sum($"n_tokens") / 1e9)
        .as("ref_nll"),
      sum($"n_tokens").cast("double").as("tok_all"),
      count(lit(1)).cast("double").as("k"))
    val base = cells.crossJoin(broadcast(ref))
      .withColumn("w0", $"n_tokens" / $"tok_all")
      .withColumn("excess", greatest(lit(0.0), $"m_nll" - $"ref_nll"))
      .withColumn("boost", exp(lit(DoremiEta) * $"excess"))
    def stepRound(df: DataFrame, wIn: String, wOut: String): DataFrame = {
      val rq = df.withColumn("rawq",
        floor(col(wIn) * col("boost") * lit(1e12) + lit(0.5)))
      val z = rq.agg(sum($"rawq").as("zq"))
      rq.crossJoin(broadcast(z))
        .withColumn(wOut,
          lit(1.0 - DoremiSmooth) * ($"rawq".cast("double") / $"zq") +
            lit(DoremiSmooth) / $"k")
        .drop("rawq", "zq")
    }
    stepRound(stepRound(base, "w0", "w1"), "w1", "w2")
      .select($"source", $"quartile".cast("long").as("quartile"),
        $"n_tokens",
        (round($"excess", 4) + lit(0.0)).as("excess_nll"),
        round($"w0", 4).as("w0"),
        round($"w1", 4).as("w1"),
        round($"w2", 4).as("w2"),
        (round($"w2" - $"w1", 4) + lit(0.0)).as("delta2"))
      .orderBy($"source", $"quartile")
  }

  /** EM iterations for the q282 Jelinek-Mercer fit — fixed and
    * literal so the oracle unrolls the identical chain. */
  private val JmIters = 3

  /** Jelinek-Mercer interpolation fit (q282) — deleted-interpolation
    * weight estimation (Jelinek & Mercer 1980; Chen & Goodman 1999
    * §2.4), the MODEL-FITTING step the q93/q160 scorers presuppose:
    * the mixture P(w|prev) = λ·p_bi + (1−λ)·p_uni with λ fit by EM on
    * a held-out slice (doc_id % 10 = 0) against train-slice counts.
    * Both slices fold through the TRAIN vocabulary (unkFoldWith), so
    * a held-out token has train unigram mass whenever the train slice
    * itself overflows the cap; the corner where it doesn't (≤ V
    * distinct train terms, so no <unk> mass exists) drops those
    * held-out bigrams explicitly on both engines — the standard OOV
    * drop — and the EM posterior never divides 0/0. Each EM round is
    * λ ← Σ m·λp_bi/(λp_bi+(1−λ)p_uni) / Σ m over held-out bigram
    * TYPES (≤ (V+1)², bounded by the fold), λ snapped to the 1e-9 grid
    * on both engines (the one order-dependent sum). Output: λ and the
    * held-out NLL per iteration — EM is exact coordinate ascent on
    * held-out likelihood here, so the NLL column is non-increasing,
    * which Round9Spec pins.
    *
    * Scale shape: two token-stream passes build the train model (the
    * q93 skeleton); the held-out side collapses to its bigram-type
    * table once, and each EM round is ONE aggregate over that bounded
    * table with a scalar driver round-trip (the q42b metadata-collect
    * posture). The bigram join is unhinted (V²); context/unigram
    * tables broadcast (≤ V+1). */
  def qJmInterpolation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = Tables.documents(s, dir)
      .select($"doc_id",
        posexplode(split($"text", " ")).as(Seq("pos", "term")))
    val folded = unkFoldWith(all, all.filter($"doc_id" % 10 =!= 0),
      ScoreTopV)
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    def bigrams(df: DataFrame): DataFrame = df
      .withColumn("prev", lag($"term", 1).over(w))
      .filter($"prev".isNotNull)
    val train = folded.filter($"doc_id" % 10 =!= 0)
    val uniC = train.groupBy($"term").agg(count(lit(1)).as("c_w"))
    val nTr = uniC.agg(sum($"c_w").cast("double").as("n"))
    val biC = bigrams(train).groupBy($"prev", $"term")
      .agg(count(lit(1)).as("c_bi"))
    val ctxC = biC.groupBy($"prev").agg(sum($"c_bi").as("c_ctx"))
    val hob = bigrams(folded.filter($"doc_id" % 10 === 0))
      .groupBy($"prev", $"term").agg(count(lit(1)).as("m"))
      .join(biC, Seq("prev", "term"), "left")
      .join(broadcast(ctxC), Seq("prev"), "left")
      .join(broadcast(uniC), Seq("term"), "left")
      .crossJoin(broadcast(nTr))
      .select($"m".cast("double").as("m"),
        coalesce($"c_bi".cast("double") / $"c_ctx", lit(0.0)).as("pb"),
        (coalesce($"c_w", lit(0L)).cast("double") / $"n").as("pu"))
      // pu = 0 is possible only when the TRAIN slice has ≤ V distinct
      // terms (no <unk> ever enters the train stream) and a held-out
      // token still folds — then pb = pu = 0 and the mixture is
      // log(0): Spark nulls those rows out of the sums while DuckDB
      // makes them -inf/NaN. Drop them explicitly (the standard OOV
      // drop) so both engines score the same support.
      .filter($"pu" > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def r9(x: Double): Double = BigDecimal(x)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r(x: Double, sc: Int): Double = BigDecimal(x)
        .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
      // an empty held-out support (a tiny corpus whose 10% slice has
      // no bigrams) leaves EM undefined: the oracle's sums over the
      // empty `hob` CTE publish lambda/nll NULL from iteration 1 (and
      // NULL nll at the 0.5 start) — replay exactly that shape
      if (hob.isEmpty) {
        val rows = (0, Some(0.5), Option.empty[Double]) +:
          (1 to JmIters).map(t =>
            (t, Option.empty[Double], Option.empty[Double]))
        return rows.toDF("iter", "lambda", "heldout_nll").orderBy($"iter")
      }
      def nllOf(l: Double): Double = r(hob.agg(
        (sum(-log(lit(l) * $"pb" + lit(1.0 - l) * $"pu") * $"m") /
          sum($"m")).as("x")).head().getDouble(0), 4)
      var lam = 0.5
      val out = scala.collection.mutable.ArrayBuffer(
        (0, r(lam, 6), nllOf(lam)))
      for (t <- 1 to JmIters) {
        lam = r9(hob.agg(
          (sum($"m" * (lit(lam) * $"pb") /
            (lit(lam) * $"pb" + lit(1.0 - lam) * $"pu")) /
            sum($"m")).as("x")).head().getDouble(0))
        out += ((t, r(lam, 6), nllOf(lam)))
      }
      out.toSeq.toDF("iter", "lambda", "heldout_nll").orderBy($"iter")
    } finally { hob.unpersist(); () }
  }

  /** Dedup survivorship-bias audit (q280) — does near-dup removal skew
    * the surviving corpus' quality? Boilerplate duplicates cluster at
    * particular quality bands, so a dedup pass is also an implicit
    * quality intervention; this measures it: per membership class
    * (q199's verified near-dup set vs the rest), the q87 quality-score
    * mean and sd, plus the standardized mean difference (Cohen's d,
    * pooled sd) as the single effect-size number a curation review
    * reads. Two staged frames join once; the audit itself is a 2-row
    * aggregate — nothing here scales past the score scan. A one-class
    * corpus (no dups) yields a NULL d rather than a division error. */
  def qDedupQualitySkew(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cls = scoredLabeled(s, dir).groupBy($"is_dup")
      .agg(count(lit(1)).as("n_docs"),
        sum($"score").as("s1"), sum($"score" * $"score").as("s2"))
      .select($"is_dup", $"n_docs",
        ($"s1" / $"n_docs").as("m"),
        // a one-member class has no sample variance: explicit NULL on
        // BOTH engines (an unguarded /0 is NULL in Spark but NaN in
        // DuckDB's float division — a silent cross-engine divergence)
        when($"n_docs" > 1,
          ($"s2" - $"s1" * $"s1" / $"n_docs") / ($"n_docs" - 1)).as("v"))
    val d = cls.agg(
      ((sum(when($"is_dup" === 1, $"m")) -
        sum(when($"is_dup" === 0, $"m"))) /
        sqrt((sum(when($"is_dup" === 1, ($"n_docs" - 1) * $"v")) +
          sum(when($"is_dup" === 0, ($"n_docs" - 1) * $"v"))) /
          (sum($"n_docs") - 2))).as("d"))
    cls.crossJoin(broadcast(d))
      .select($"is_dup", $"n_docs",
        round($"m", 4).as("mean_score"),
        round(sqrt($"v"), 4).as("sd_score"),
        (round($"d", 4) + lit(0.0)).as("cohens_d"))
      .orderBy($"is_dup")
  }

  /** CCNet perplexity routing (q101): split each language's documents
    * into head/middle/tail TERCILES by unigram-LM NLL — exactly the
    * published CCNet step (Wenzek et al. 2020 §4.3: per-language
    * perplexity terciles; training recipes then sample head > middle >
    * tail). Consumes q72's scores; the tercile is an ntile(3) per
    * language over (nll, doc_id) — total-ordered, so the split is
    * reproducible across engines and runs. The per-language window
    * shuffles the doc-level (not token-level) frame once; output is
    * routing-table-sized. */
  def qPerplexityRouting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = qUnigramNll(s, dir)
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
    val w = Window.partitionBy($"lang").orderBy($"nll", $"doc_id")
    scored
      .withColumn("tercile", ntile(3).over(w))
      .withColumn("bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          $"tercile"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"nll"), 4).as("mean_nll"),
        round(max($"nll"), 4).as("max_nll"))
      .orderBy($"lang", $"bucket")
  }

  /** Two-sample Kolmogorov–Smirnov drift test (q182): per source, the
    * exact KS statistic D = max|ecdf_source − ecdf_rest| over the
    * document-length distribution — the CONTINUOUS-distribution drift
    * check beside q115's categorical KL (a source whose lengths drift
    * keeps the same vocabulary KL while its chunking and packing
    * economics change). Exact and fully deterministic by construction:
    * both ecdfs are integer cumulative sums over the distinct-value
    * grid (windowed per source over |sources|×|values| rows — the
    * grid, never the corpus), divided once at the end; no float ever
    * accumulates. At 100 TB the grid is the value domain (bounded for
    * lengths), not the row count. */
  def qKsDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ksPerSource(s, dir)
      .select($"source", $"ns".as("n_docs"),
        round($"dmax", 4).as("d_stat"))
      .orderBy($"source")
  }

  /** The per-source KS frame (source, ns, n_all, dmax) UNROUNDED —
    * q182 publishes the rounded statistic; q332 needs the raw D for
    * its p-values. */
  private def ksPerSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"source", $"n_chars")
    val grid = d.select($"n_chars").distinct()
    val srcs = d.select($"source").distinct()
    val cnts = d.groupBy($"source", $"n_chars").agg(count(lit(1)).as("c"))
    val full = srcs.crossJoin(grid)
      .join(cnts, Seq("source", "n_chars"), "left")
      .select($"source", $"n_chars", coalesce($"c", lit(0L)).as("c"))
    val wSrc = Window.partitionBy($"source").orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.withColumn("cs", sum($"c").over(wSrc))
    val overall = d.groupBy($"n_chars").agg(count(lit(1)).as("call"))
      .withColumn("ctot", sum($"call").over(
        Window.orderBy($"n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"n_chars", $"ctot")
    val ns = d.groupBy($"source").agg(count(lit(1)).as("ns"))
    val tot = d.agg(count(lit(1)).as("n_all"))
    cum.join(overall, "n_chars")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .select($"source", $"ns", $"n_all",
        // one-source corpus: "rest" is empty, D undefined → NULL (the
        // divisor NULLs like DuckDB's /0, so both engines publish NULL)
        abs($"cs" / $"ns".cast("double") -
          ($"ctot" - $"cs") /
            when($"n_all" =!= $"ns", ($"n_all" - $"ns").cast("double")))
          .as("diff"))
      .groupBy($"source")
      .agg(max($"ns").as("ns"), max($"n_all").as("n_all"),
        max($"diff").as("dmax"))
  }

  /** q332's FDR level. */
  private val BhAlpha = 0.05

  /** Benjamini–Hochberg drift screen (q332) — BH 1995 step-up over the
    * per-source KS drift tests (q182's D, source vs rest): with 20+
    * sources, "which sources drifted" is a MULTIPLE-testing question —
    * thresholding raw p at 0.05 false-alarms ~1 source per run
    * forever. p comes from the Smirnov large-sample tail
    * p = min(1, 2·e^{−2·n_e·D²}), n_e = n₁n₂/(n₁+n₂); BH sorts p
    * ascending and rejects ranks ≤ argmax{i : p_(i) ≤ i·α/m}. Scale
    * shape: everything after q182's audited grid pass runs on the
    * |sources| frame (the sort window is sources-sized — audited); the
    * step-up max is one running max back-join. */
  def qBhDriftScreen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ksPerSource(s, dir)
      .select($"source", $"ns",
        ($"ns" * ($"n_all" - $"ns")).cast("double")
          ./($"n_all".cast("double")).as("ne"),
        $"dmax")
      .withColumn("p",
        least(lit(1.0), lit(2.0) * exp(lit(-2.0) * $"ne" * $"dmax" * $"dmax")))
    val m = Window.partitionBy(lit(1))
    val ranked = base
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("rk", row_number().over(
        Window.orderBy($"p".asc, $"source".asc)))
      .withColumn("pass", $"p" <= $"rk" * lit(BhAlpha) / $"m")
    val kMax = ranked.agg(coalesce(max(when($"pass", $"rk")), lit(0))
      .as("k"))
    ranked.crossJoin(broadcast(kMax))
      .select($"source", $"ns".as("n_docs"),
        (floor($"dmax" * 1e4 + 0.5) / 1e4).as("d_stat"),
        (floor($"p" * 1e6 + 0.5) / 1e6).as("p_value"),
        $"rk".cast("int").as("rank"),
        ($"rk" <= $"k").as("reject"))
      .orderBy($"rank")
  }

  /** Normal-consistency factor: MAD·1.4826 estimates σ under
    * gaussianity, making robust-z thresholds comparable to classic
    * z-scores (Hampel / Leys et al. 2013). */
  private val MadSigma = 1.4826

  /** Per-source robust z-score normalization (q178): each document's
    * quality score standardized by its SOURCE's median and MAD —
    * median/MAD because a single boilerplate flood in one source would
    * drag a mean/σ baseline toward itself and mask its own outliers
    * (q130's argument, applied to quality instead of volume). This is
    * the normalization that makes scores COMPARABLE across sources
    * before a global threshold (q142 solved the same problem with
    * per-source deciles; robust-z keeps a continuous score). Two
    * percentile aggregates per source (→ mergeable sketches at
    * 100 TB), both broadcast back; the z itself is map-side
    * arithmetic. Zero-MAD sources (constant score) emit z = 0 by the
    * same CASE on both engines. */
  def qRobustZ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextOps.tokenize($"text")
    val nToks = size(toks)
    val nStops = size(filter(toks, t => TextOps.isStopword(t)))
    val quality = round((lit(1.0) - nStops.cast("double") / nToks) *
      least(lit(1.0), nToks.cast("double") / 100.0), 4)
    val base = Tables.documents(s, dir)
      .select($"doc_id", $"source", quality.as("q"))
    val med = base.groupBy($"source")
      .agg(percentile($"q", lit(0.5)).as("med"))
    val dev = base.join(broadcast(med), "source")
      .withColumn("dev", abs($"q" - $"med"))
    val mad = dev.groupBy($"source")
      .agg(percentile($"dev", lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "source")
      .select($"doc_id", $"source", $"q",
        when($"mad" > 0,
          round(($"q" - $"med") / (lit(MadSigma) * $"mad"), 4) + lit(0.0))
          .otherwise(lit(0.0)).as("z"))
      .withColumn("outlier", abs($"z") > 3.0)
      .orderBy($"doc_id")
  }

  /** Mutual-information feature audit (q165): MI between each candidate
    * binary feature and the target label (lang = 'en') from the 2×2
    * contingency table — the standard pre-training feature-selection
    * screen for a quality classifier like q87's (a near-zero-MI feature
    * is dead weight; a suspiciously high one is usually leakage). The
    * entire corpus collapses to ONE row of joint counts in a single
    * partial-agg pass (count + 2 sums per feature — mergeable at any
    * scale); the MI algebra then runs on that row and unpivots to a
    * |features|-row report. Counts are exact longs, so the floating MI
    * is the same expression tree over identical integers on both
    * engines. Zero cells contribute 0 (the 0·ln 0 limit), guarded
    * per-cell. */
  def qFeatureMi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = Seq(
      "f_long"  -> ($"n_chars" > 300),
      "f_short" -> ($"n_chars" < 150),
      "f_spark" -> $"text".contains("spark"),
      "f_the"   -> $"text".contains(" the "))
    val base = Tables.documents(s, dir).select(
      ($"lang" === "en").cast("long").as("y") +:
        feats.map { case (n, c) => c.cast("long").as(n) }: _*)
    val aggCols = Seq(count(lit(1)).as("n"), sum($"y").as("ny")) ++
      feats.flatMap { case (nm, _) =>
        Seq(sum(col(nm)).as(s"nf_$nm"),
          sum(col(nm) * $"y").as(s"n11_$nm"))
      }
    val one = base.agg(aggCols.head, aggCols.tail: _*)
    def term(c: Column, a: Column, b: Column, n: Column): Column =
      when(c > 0,
        (c / n.cast("double")) * log(c.cast("double") * n / (a * b)))
        .otherwise(lit(0.0))
    // unpivot via explode so the corpus is scanned ONCE for all features
    val rows = feats.map { case (nm, _) =>
      val nf = col(s"nf_$nm"); val n11 = col(s"n11_$nm")
      val n = col("n"); val ny = col("ny")
      val n10 = nf - n11; val n01 = ny - n11
      val n00 = n - nf - ny + n11
      struct(lit(nm).as("feature"), nf.as("n_f"), n11.as("n11"),
        (round(term(n11, nf, ny, n) + term(n10, nf, n - ny, n) +
          term(n01, n - nf, ny, n) + term(n00, n - nf, n - ny, n), 4)
          + lit(0.0)).as("mi"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select($"r.feature", $"r.n_f", $"r.n11", $"r.mi")
      .orderBy($"feature")
  }

  /** Stopword list for the classifier's coverage feature — token-level
    * (every occurrence counts), unlike Gopher's distinct-hit rule. */
  private val Stop16 = Seq("the", "be", "to", "of", "and", "a", "in",
    "that", "have", "i", "it", "for", "not", "on", "with", "he")

  /** Fixed weights for the logistic quality model. Stand-ins for trained
    * coefficients — the pipeline shape (featurize → linear score →
    * sigmoid → threshold) is what a model-based filter ships; training
    * happens offline and the weights arrive as constants exactly like
    * these. Kept as named constants so the oracle replays them as SQL
    * literals. */
  private val Wb = -2.0   // bias
  private val Wl = 0.9    // ln(1 + n_words): longer docs score higher
  private val Ww = -0.4   // mean word length: penalize token soup
  private val Ws = 3.0    // stopword token ratio: reward natural prose
  private val Wu = -5.0   // uppercase char ratio: penalize SHOUTING

  /** Model-based quality filter (q87): the fastText/CCNet-style stage —
    * score every document with a tiny linear model over cheap engineered
    * features and keep score >= 0.5 (Wenzek et al. 2020 filter by LM/
    * classifier score; LLaMA's pipeline uses a linear classifier the
    * same way). Entirely native expressions — featurize, dot product,
    * and sigmoid all stay inside whole-stage codegen, so at 100 TB this
    * is a map-only pass with zero shuffles; inference cost is the scan.
    * The division guards (`nullif`-style coalesce) keep empty documents
    * from poisoning the batch — per-record error isolation as algebra,
    * not try/catch. */
  /** The q87 logit over a `text` column — shared with q201's AUC
    * evaluation so both score with the identical expression tree. */
  /** The q87 stopword list / z expression as SQL text, shared with
    * composing oracles (q268's per-source datasheet). */
  private[operators] def stop16Sql: String =
    Stop16.map(w => s"'$w'").mkString("(", ", ", ")")

  private[operators] def zExprSql(nWords: String, tk: String,
      text: String, stop16: String): String =
    s"$Wb + $Wl * ln(1.0 + $nWords) " +
      s"+ $Ww * (list_sum(list_transform($tk, " +
      s"x -> CAST(length(x) AS DOUBLE))) / $nWords) " +
      s"+ $Ws * (CAST(len(list_filter($tk, x -> x IN $stop16)) " +
      s"AS DOUBLE) / $nWords) " +
      s"+ $Wu * coalesce(CAST(length($text) - " +
      s"length(regexp_replace($text, '[A-Z]', '', 'g')) AS DOUBLE) " +
      s"/ nullif(length($text), 0), 0.0)"

  private[operators] def qualityZ: Column = {
    val tk = split(col("text"), " ")
    val nWords = size(tk).cast("double")
    val fLen = log(lit(1.0) + nWords)
    val fWlen = aggregate(transform(tk, x => length(x).cast("double")),
      lit(0.0), (acc, x) => acc + x) / nWords
    val fStop = size(filter(tk, x => x.isInCollection(Stop16)))
      .cast("double") / nWords
    val fUpper = coalesce(
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Z]", "")))
        .cast("double") /
        when(length(col("text")) === 0, lit(null))
          .otherwise(length(col("text"))),
      lit(0.0))
    lit(Wb) + lit(Wl) * fLen + lit(Ww) * fWlen +
      lit(Ws) * fStop + lit(Wu) * fUpper
  }

  /** Inter-gate agreement (q238) — Cohen's κ between the two quality
    * gates the suite ships (the Gopher rule set q46 and the logistic
    * classifier q87): observed agreement corrected for the agreement
    * two independent gates would reach by chance (κ = (p_o − p_e) /
    * (1 − p_e), Cohen 1960) — the number that says whether adding the
    * second gate buys signal or re-litigates the first (κ → 1: the
    * model learned the rules; κ ≈ 0: genuinely different filters, the
    * q180 ablation grid tells you which to trust). Both gates are
    * map-only featurizations; the corpus collapses to 4 cells in ONE
    * conditional aggregate — everything after is closed-form on one
    * row. */
  def qGateKappa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // both gates fused into ONE map pass over the documents scan (the
    // doc_id self-join form measured 4.4s vs 0.6s warm at sf0.1)
    val gates = Tables.documents(s, dir)
      .select(QualityQueries.gopherPassesExpr.as("passes"),
        (lit(1.0) / (lit(1.0) + exp(-qualityZ)) >= 0.5).as("keep"))
    val cells = gates.agg(
      count(lit(1)).as("n"),
      sum(when($"passes" && $"keep", 1L).otherwise(0L)).as("n11"),
      sum(when($"passes" && !$"keep", 1L).otherwise(0L)).as("n10"),
      sum(when(!$"passes" && $"keep", 1L).otherwise(0L)).as("n01"),
      sum(when(!$"passes" && !$"keep", 1L).otherwise(0L)).as("n00"))
    val nD = $"n".cast("double")
    val po = ($"n11" + $"n00") / nD
    val pe = (($"n11" + $"n10") * ($"n11" + $"n01") +
      ($"n01" + $"n00") * ($"n10" + $"n00")) / (nD * nD)
    cells.select($"n", $"n11", $"n10", $"n01", $"n00",
      round(po, 4).as("p_obs"), round(pe, 4).as("p_exp"),
      // pe = 1 (all mass in one cell — e.g. a 1-doc corpus): κ is
      // 0/0-undefined → NULL via the nullif'd denominator (DuckDB /0)
      (round((po - pe) / when(pe =!= 1.0, lit(1.0) - pe), 4) + lit(0.0))
        .as("kappa"))
  }

  /** McNemar's paired test (q319) — McNemar 1947 on the SAME 2×2 gate
    * contingency q238's kappa summarizes: kappa asks "do the two
    * quality gates agree", McNemar asks the release question kappa
    * can't — "do they pass systematically DIFFERENT amounts", i.e. is
    * the marginal pass-rate shift real or noise. Only the discordant
    * cells matter: χ² = (b−c)²/(b+c) with the Edwards continuity
    * variant (|b−c|−1)²/(b+c) alongside; b+c = 0 (perfect agreement)
    * publishes NULL χ² explicitly. One fused map pass → ONE 4-cell
    * conditional aggregate; every number after is closed-form on a
    * 1-row frame — exact integers except the two divisions. */
  def qMcnemarGates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mcnemarOf(Tables.documents(s, dir)
      .select(QualityQueries.gopherPassesExpr.as("passes"),
        (lit(1.0) / (lit(1.0) + exp(-qualityZ)) >= 0.5).as("keep")))
  }

  /** McNemar core over any (passes, keep) frame; split out so the
    * spec can pin the statistic and the perfect-agreement NULL. */
  private[graft] def mcnemarOf(gates: DataFrame): DataFrame = {
    val s = gates.sparkSession
    import s.implicits._
    val cells = gates.agg(
      count(lit(1)).as("n"),
      sum(when($"passes" && !$"keep", 1L).otherwise(0L)).as("b"),
      sum(when(!$"passes" && $"keep", 1L).otherwise(0L)).as("c"))
    val disc = $"b" + $"c"
    cells.select($"n", $"b", $"c",
      (floor(lit(1e4) * ($"b" - $"c") * ($"b" - $"c")
        / when(disc =!= 0L, disc) + 0.5) / 1e4).as("chi2"),
      (floor(lit(1e4) * (abs($"b" - $"c") - 1L) * (abs($"b" - $"c") - 1L)
        / when(disc =!= 0L, disc) + 0.5) / 1e4).as("chi2_cc"))
  }

  /** Murphy decomposition of the Brier score (q320) — Murphy 1973:
    * q203 reports the Brier number; this splits it into the three
    * terms a filter owner acts on — RELIABILITY (how far each score
    * bin's mean forecast sits from its observed rate: fix by
    * recalibrating, q303's isotonic PAV), RESOLUTION (how far bins
    * pull away from the base rate: fix by better features), and
    * UNCERTAINTY ȳ(1−ȳ) (irreducible). Same staged (score, is_dup)
    * frame and 10-bin layout as q203. The cross-bin Σ n_k(·)² sums
    * fold IN-ROW over the bin-sorted array (the q313 discipline —
    * collect_list order is not deterministic, the sorted fold is);
    * binned forecasts leave a within-bin variance gap, so the direct
    * Brier is published next to the identity terms rather than
    * implied. */
  def qBrierDecomposition(s: SparkSession, dir: String): DataFrame =
    brierDecompOf(scoredLabeled(s, dir))

  /** Decomposition core over any (score, is_dup) frame; split out so
    * the spec can pin the Murphy terms on a hand-binned forecast set. */
  private[graft] def brierDecompOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val bins = base.groupBy(scoreBin($"score").as("bin"))
      .agg(count(lit(1)).as("nk"), sum($"score").as("sk"),
        sum($"is_dup".cast("long")).as("yk"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum($"is_dup".cast("long")).as("ny"),
      avg(($"score" - $"is_dup") * ($"score" - $"is_dup")).as("brier"))
    bins.agg(array_sort(collect_list(struct($"bin", $"nk", $"sk", $"yk")))
        .as("bs"))
      .crossJoin(broadcast(tot))
      .withColumn("ybar", $"ny".cast("double") / when($"n" > 0L, $"n"))
      .select($"n", (floor($"ybar" * 1e4 + 0.5) / 1e4).as("y_bar"),
        (floor(expr(
          """aggregate(bs, 0.0d, (a, b) -> a + b.nk *
            |  (b.sk / b.nk - cast(b.yk as double) / b.nk)
            |  * (b.sk / b.nk - cast(b.yk as double) / b.nk))"""
            .stripMargin) / when($"n" > 0L, $"n") * 1e4 + 0.5) / 1e4)
          .as("reliability"),
        (floor(expr(
          """aggregate(bs, 0.0d, (a, b) -> a + b.nk *
            |  (cast(b.yk as double) / b.nk - ybar)
            |  * (cast(b.yk as double) / b.nk - ybar))"""
            .stripMargin) / when($"n" > 0L, $"n") * 1e4 + 0.5) / 1e4)
          .as("resolution"),
        (floor($"ybar" * (lit(1.0) - $"ybar") * 1e4 + 0.5) / 1e4)
          .as("uncertainty"),
        (floor($"brier" * 1e4 + 0.5) / 1e4).as("brier"))
  }

  def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val z = qualityZ
    Tables.documents(s, dir)
      .select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_words"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score"),
        (lit(1.0) / (lit(1.0) + exp(-z)) >= 0.5).as("keep"))
      .orderBy($"doc_id")
  }

  /** DSIR importance weights (q104): data selection via hashed-n-gram
    * importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"). Each document's
    * unigrams+bigrams hash into B=1024 buckets; two bucket-count
    * distributions are fit — the TARGET (here the English slice, the
    * paper's "formal text" stand-in) and the RAW corpus — and each doc
    * scores the mean log-likelihood ratio ln(p_target/p_raw) of its
    * grams (+0.5 additive smoothing on both, so empty buckets stay
    * finite). Positive = target-like, the resampling weight upstream of
    * q102's epoch sampler. The bucket hash is an md5-derived integer, so
    * the whole pipeline replays bit-identically in the oracle. Scale
    * shape: ONE (doc, gram) explode feeds both distributions and the
    * per-doc score; the distributions are B-row aggregates that return
    * as a broadcast, so the corpus shuffles once (partial-agg on bucket)
    * and the scoring join is map-side — hashed-DSIR's whole point is
    * that 100 TB reduces to two 1024-bucket histograms. */
  def qDsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeightFrame(s, dir).orderBy(org.apache.spark.sql.functions
      .col("doc_id"))

  /** Staged per-doc weight table — q104 emits it, q114's budgeted
    * selection is a derived read (recomputing the gram chain per
    * consumer measured ~3s at sf0.1; a real DSIR run materializes the
    * weights next to the corpus exactly once). */
  private val weightCache = new SessionCache
  private def dsirWeightFrame(s: SparkSession, dir: String): DataFrame =
    // Double-staged (round-16 optimization, the verified_pairs
    // discipline): the gram-explode + double-histogram build measured
    // ~4.0 s of q104's 4.34 s cold at sf0.1, re-paid by every fresh
    // session; the run-durable parquet stage turns that into a
    // columnar read. Bump the version on any change to
    // buildDsirWeights (B, smoothing, hash prefix).
    weightCache.get(s, dir)(
      DurableStage.get(s, "dsir_weights", 1,
        Seq(s"$dir/documents.parquet"),
        salt = "B=1024;smooth=0.5;tgt=en")(
        buildDsirWeights(s, dir)))

  private def buildDsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = 1024
    // one gram frame: unigrams ++ bigrams, hashed to a bucket id
    val tk = split($"text", " ")
    val bi = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (x, y) => concat_ws(" ", x, y))
    val grams = Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        explode(concat(tk, bi)).as("g"))
      .select($"doc_id", $"lang",
        pmod(conv(substring(md5(concat(lit("dsir:"), $"g")), 1, 6),
          16, 10).cast("long"), lit(B)).as("b"))
    // BOTH histograms in one conditional aggregation: one scan of the
    // gram stream and one 1024-bucket shuffle fit raw and target
    // distributions together (a second scan per distribution is the
    // naive shape; at 100 TB it doubles the dominant cost for nothing)
    val dist = grams.groupBy($"b").agg(
      count(lit(1)).as("c_raw"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_tgt"))
    val tot = dist.agg(sum($"c_raw").as("n_raw"),
      sum($"c_tgt").as("n_tgt"))
    val ratio = dist.crossJoin(broadcast(tot))
      .select($"b",
        (log(($"c_tgt" + lit(0.5)) /
             ($"n_tgt" + lit(0.5 * B))) -
         log(($"c_raw" + lit(0.5)) /
             ($"n_raw" + lit(0.5 * B)))).as("llr"))
    grams.join(broadcast(ratio), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        // + 0.0 normalizes IEEE -0.0 (engines disagree on its string)
        (round(avg($"llr"), 4) + lit(0.0)).as("dsir_logw"))
  }

  /** DSIR-apply under a global token budget (q114): take the highest-
    * importance-weight documents until the selected set reaches 10 000
    * tokens — the actual SELECTION step of Xie et al. 2023, composing
    * q104's weights with q84's distributed prefix-sum discipline. A
    * naive global cumsum is a single-partition window (the scale
    * anti-pattern); instead docs bucket on a fixed grid over the weight
    * value — a deterministic, order-respecting function of the sort key
    * — so the cumulative sum splits into a 16-row bucket-offset frame
    * (broadcast back) plus per-bucket local windows that each hold only
    * their grid slice. Weight ties order by doc_id; cum_tokens is
    * strictly increasing, so the selection boundary is exact and
    * deterministic on both engines. */
  def qDsirSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Budget = 10000L
    val scored = dsirWeightFrame(s, dir)
      .join(Tables.documents(s, dir).select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens")), "doc_id")
      // grid bucket DESCENDING in weight: bucket 0 = best. Clamped ends
      // catch outliers; unequal bucket sizes only skew the local
      // windows, never correctness.
      .withColumn("bucket", greatest(lit(0), least(lit(15),
        floor((lit(2.0) - $"dsir_logw") / 0.25).cast("int"))))
    val offsets = scored.groupBy($"bucket")
      .agg(sum($"n_tokens").as("bucket_tokens"))
      // 16-row frame: the single-partition window here is bucket-count-
      // sized, never corpus-sized (the q38/q63 precedent)
      .withColumn("offset", coalesce(sum($"bucket_tokens").over(
        org.apache.spark.sql.expressions.Window.orderBy($"bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .select($"bucket", $"offset")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy($"bucket").orderBy($"dsir_logw".desc, $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    scored
      .join(broadcast(offsets), "bucket")
      .withColumn("cum_tokens", $"offset" + sum($"n_tokens").over(wLocal))
      .filter($"cum_tokens" <= Budget)
      .select($"doc_id", $"n_tokens", $"dsir_logw", $"cum_tokens")
      .orderBy($"cum_tokens")
  }

  /** Per-source distribution drift (q115): KL(source ‖ corpus) over the
    * unigram distribution, add-0.5 smoothed — the drift monitor a
    * multi-source pipeline alarms on (a source whose language suddenly
    * shifts — spam flood, encoding break, scraper regression — spikes
    * its KL against the corpus it used to resemble). The smoothed KL
    * needs every (source, vocab-term) cell including unobserved ones,
    * so the grid is built as a cross join of two AGGREGATED frames —
    * |sources| × |vocab|; the vocab side folds through [[unkFold]]
    * first, so it is ≤ V+1 rows BY CONSTRUCTION and the grid stays
    * dimension-sized whatever the corpus holds. One (source, term)
    * partial-agg shuffle over the token stream; everything after is
    * grid-sized. */
  def qSourceDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = unkFold(Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("term")))
    val sc = toks.groupBy($"source", $"term")
      .agg(count(lit(1)).as("c_sw"))
    val cc = toks.groupBy($"term").agg(count(lit(1)).as("c_w"))
    val tot = cc.agg(sum($"c_w").as("n_c"),
      count(lit(1)).cast("double").as("v"))
    val ns = sc.groupBy($"source").agg(sum($"c_sw").as("n_s"))
    val grid = ns.crossJoin(broadcast(cc))
      .join(sc, Seq("source", "term"), "left")
      .crossJoin(broadcast(tot))
    val pS = (coalesce($"c_sw", lit(0L)) + lit(0.5)) /
      ($"n_s" + lit(0.5) * $"v")
    val pC = ($"c_w" + lit(0.5)) / ($"n_c" + lit(0.5) * $"v")
    grid
      .groupBy($"source")
      .agg(max($"n_s").as("n_tokens"),
        (round(sum(pS * log(pS / pC)), 4) + lit(0.0)).as("kl"))
      .orderBy($"source")
  }

  /** BM25 query-term set: literal, tiny, broadcast-free (it lives in
    * the filter predicate). */
  private val Bm25Terms = Seq("spark", "window", "merge")

  /** BM25 top-10 retrieval (q125): Robertson-Spärck Jones ranking
    * (k1=1.2, b=0.75) of the whole corpus against a literal query-term
    * set — the retrieval step that sits on top of q119's inverted
    * index. Scale shape: the term filter lands BEFORE the tf aggregate,
    * so only rows for the |q| query terms ever shuffle (a term-bounded
    * frame, not the corpus); document lengths are the same (doc_id)
    * aggregate every per-doc stat pays and join tf on the co-located
    * doc_id key; corpus stats (N, avgdl) broadcast as a 1-row frame.
    * The per-doc score folds the ≤|q| term contributions in FIXED
    * literal order (conditional max per term, then a literal sum), so
    * the float total is bit-identical on any engine — a grouped sum's
    * order would not be. Global top-10 = Filter(row_number <= 10) with
    * an empty partition spec, which TopKWindowRule rewrites to the
    * bounded-heap aggregate: no single-partition sort of all scored
    * docs. */
  /** The ranked BM25 frame (rk, doc_id, raw score) shared by q125 and
    * q247's pseudo-relevant set. */
  private def bm25Ranked(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
    val tf = toks.filter($"term".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
          ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) *
            (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")))
    val score = Bm25Terms.map(t =>
      coalesce(max(when($"term" === t, $"c")), lit(0.0))).reduce(_ + _)
    val w = Window.orderBy($"score".desc, $"doc_id".asc)
    contrib.groupBy($"doc_id").agg(score.as("score"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
  }

  def qBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bm25Ranked(s, dir)
      .select($"rk", $"doc_id", round($"score", 4).as("score"))
      .orderBy($"rk")
  }

  /** Pseudo-relevance-feedback query expansion (q247) — Rocchio 1971 /
    * RM3-lite, the classic second stage of a retrieval pipeline: treat
    * q125's BM25 top-10 as pseudo-relevant, rank the terms of THOSE
    * documents (query terms and stopwords excluded) by tf-in-relevant
    * × smoothed idf (q71's ln((N+1)/(df+1))+1 against the FULL corpus
    * — a term common everywhere is no expansion signal), emit the
    * top-8 expansion candidates with their relevant-set df. Cost: the
    * relevant token stream is 10 documents (semi-join on the broadcast
    * top-10 ids); the corpus-wide df table is vocabulary-sized, so its
    * join is UNHINTED — the 10-doc relevant-term side is the bounded
    * frame and the planner builds on it from stats — and nothing new
    * scales with the corpus beyond the one df pass retrieval already
    * pays. */
  def qPrfExpansion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topDocs = bm25Ranked(s, dir).select($"doc_id")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    val dfAll = toks.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val rel = toks.join(broadcast(topDocs), "doc_id")
      .filter(!$"term".isin(Bm25Terms: _*) &&
        !TextOps.isStopword($"term"))
    val scored = rel.groupBy($"term")
      .agg(count(lit(1)).as("tf_rel"),
        countDistinct($"doc_id").as("df_rel"))
      .join(dfAll, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", $"tf_rel" *
        (log(($"n" + 1.0) / ($"df" + 1.0)) + lit(1.0)))
    val w = Window.orderBy(round($"score", 6).desc, $"term".asc)
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 8)
      .select($"rk", $"term", $"tf_rel", $"df_rel", $"df",
        round($"score", 4).as("score"))
      .orderBy($"rk")
  }

  /** Per-source quality-score calibration (q142): a single global
    * quality threshold over-prunes sources whose score DISTRIBUTION sits
    * low (different boilerplate habits, different languages) — the
    * FineWeb-style fix is to gate each document on its rank WITHIN its
    * source. Scale-safe shape (no per-source percent_rank window, which
    * would total-sort every source's documents on one reducer): compute
    * each source's 9 decile cutpoints in one exact-percentile aggregate
    * (→ q73's mergeable sketch at 100 TB), broadcast the |sources|×9
    * frame back, and assign the source-relative decile map-side by
    * counting cutpoints strictly below the score. kept = top half of
    * its own source, whatever the global distribution looks like. */
  def qQualityCalibrate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextOps.tokenize($"text")
    val nToks = size(toks)
    val nStops = size(filter(toks, t => TextOps.isStopword(t)))
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"source",
        ((lit(1.0) - nStops.cast("double") / nToks) *
          least(lit(1.0), nToks.cast("double") / 100.0)).as("q"))
    val cuts = scored.groupBy($"source")
      .agg(percentile($"q",
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cs"))
    // Compare on the suite's 4-decimal grid, NOT raw doubles: the two
    // engines' interpolated cutpoints differ at the last ulp (measured:
    // 0.8199999999999998 vs 0.82…02 for the same cut), which a strict >
    // on raw values amplifies into a whole-decile flip. Rounding both
    // sides first makes the comparison grid-exact on both engines.
    scored.join(broadcast(cuts), "source")
      .select($"doc_id", $"source", round($"q", 4).as("quality"),
        size(filter($"cs", c => round($"q", 4) > round(c, 4)))
          .cast("int").as("decile"))
      .withColumn("kept", $"decile" >= 5)
      .orderBy($"doc_id")
  }

  /** Population Stability Index (q194): per-source PSI of the document-
    * length distribution against the REST of the corpus over 10 global
    * decile bins — the binned drift score the model-monitoring world
    * standardizes on (credit-scoring lineage; Karakoulas 2004), with
    * the industry read-off bands: <0.10 stable, 0.10–0.25 moderate,
    * ≥0.25 major shift. Completes the drift triptych: q115 is
    * categorical KL on tokens, q182 exact continuous KS, this the
    * binned symmetric form practitioners alert on (PSI is the
    * symmetrized KL over bins, so it prices BOTH directions of
    * mass movement). Numerics: +0.5/cell smoothing (q115's convention)
    * keeps empty bins finite; bin edges are global decile cutpoints
    * compared raw (q183's convention — int-vs-interpolated-double).
    * Scale shape: one percentile aggregate (→ q73's mergeable sketch
    * at 100 TB), bins assigned map-side from the broadcast cutpoints,
    * corpus collapses to |sources|×10 cells in one partial agg; the
    * rest-of-corpus side is pure subtraction on that grid — the
    * corpus is never scanned twice. */
  def qPsiDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"source", $"n_chars")
    val cuts = d.agg(percentile($"n_chars",
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cs"))
    val binned = d.crossJoin(broadcast(cuts))
      .select($"source",
        (size(filter($"cs", c => $"n_chars" > c)) + 1).as("bin"))
    val per = binned.groupBy($"source", $"bin").agg(count(lit(1)).as("n_sb"))
    val glob = per.groupBy($"bin").agg(sum($"n_sb").as("n_b"))
    val totS = per.groupBy($"source").agg(sum($"n_sb").as("n_s"))
    val tot = glob.agg(sum($"n_b").as("n_tot"))
    val grid = totS
      .select($"source", $"n_s",
        explode(sequence(lit(1), lit(10))).as("bin"))
      .join(per, Seq("source", "bin"), "left")
      .join(broadcast(glob), Seq("bin"))
      .crossJoin(broadcast(tot))
    val obs = coalesce($"n_sb", lit(0L))
    val p = (obs + lit(0.5)) / ($"n_s" + lit(5.0))
    val q = (($"n_b" - obs) + lit(0.5)) / (($"n_tot" - $"n_s") + lit(5.0))
    grid.groupBy($"source")
      .agg(max($"n_s").as("n_docs"),
        (round(sum((p - q) * log(p / q)), 4) + lit(0.0)).as("psi"))
      .withColumn("band",
        when($"psi" < 0.10, "stable").when($"psi" < 0.25, "moderate")
          .otherwise("major_shift"))
      .orderBy($"source")
  }

  /** Exact ROC-AUC evaluation (q201): how well does the q87 quality
    * score separate NEAR-DUP cluster members (q199's verified ≥ 0.8
    * pairs — exact-md5 losers would be the natural label but this
    * testdata generation plants none at the correctness SF) from
    * singletons — the scalar verdict on q171's "duplicates are
    * low-quality" hypothesis, and the evaluation harness any
    * model-based filter (q87, perplexity routing, FineWeb-style
    * classifiers) ships with. AUC is the Mann–Whitney statistic
    * computed EXACTLY from the score distribution, ties handled by the
    * trapezoid (average-rank) rule: group docs by their 4-decimal
    * score (identical tie structure on both engines), cumulate
    * negatives below each score, and fold
    * AUC = Σ np(s)·(2·cum_nn(s) + nn(s)) / (2·Np·Nn) — every term an
    * exact integer until the single final division. Scale shape: the
    * member frame is pair-scale and broadcasts; after the one
    * doc-level scoring pass everything runs on the |distinct scores|
    * frame — bounded by the 10⁴-cell rounded grid, so the one
    * unpartitioned cumulative window can never exceed 10⁴ rows
    * whatever the corpus. AUC ≈ 0.5 says quality is independent of
    * duplication; < 0.5 says duplicates score LOWER, confirming the
    * gate ordering in q111. */
  /** (doc_id, score, is_dup): the q87 score on the 4-decimal grid with
    * q199's near-dup membership label — q201's AUC and q203's
    * calibration read the same frame. */
  private def scoredLabeled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = DedupQueries.prefixPairs(s, dir)
    val members = pairs.select($"doc_a".as("doc_id"))
      .unionByName(pairs.select($"doc_b".as("doc_id")))
      .distinct()
      .withColumn("hit", lit(1L))
    Tables.documents(s, dir)
      .select($"doc_id",
        round(lit(1.0) / (lit(1.0) + exp(-qualityZ)), 4).as("score"))
      .join(broadcast(members), Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce($"hit", lit(0L)))
  }

  /** word2vec negative-sampling table (q252) — the unigram^0.75 noise
    * distribution (Mikolov et al. 2013 §2.2: the ¾ power lifts rare
    * words, the single most-copied constant in embedding training):
    * per vocabulary term its smoothed probability, cumulative share in
    * deterministic (count desc, term) order, and the slot count in the
    * standard 10⁶-entry sampling table (floor of cumulative boundary
    * differences, so slots sum EXACTLY to the table size — the
    * alias-free construction). Top-30 emitted. One vocab aggregate;
    * the cumulative window runs on the vocabulary frame (→ q84's
    * two-phase cumsum at 100 TB). */
  def qNegSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tc = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"term").agg(count(lit(1)).as("c"))
    val tot = tc.agg(sum(pow($"c", 0.75)).as("z"))
    // Heap-cut FIRST: the output keeps only the top-30 terms, and in
    // (c desc, term) order their cumulative mass involves no term
    // outside the top 30 — so the running sum can run AFTER the
    // Filter(row_number ≤ 30) heap rewrite, on the 30-row frame. The
    // round-5 form ran the cumsum over the ENTIRE vocabulary first: a
    // vocab-sized single-reducer window in the final plan (caught by
    // the DumpPlans unpartitioned-window audit) that only ever fed 30
    // surviving rows.
    val wr = Window.orderBy($"c".desc, $"term".asc)
    val top = tc.withColumn("rk", row_number().over(wr))
      .filter($"rk" <= 30)
    val w30 = Window.orderBy($"rk")
      .rowsBetween(Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(tot))
      .withColumn("p", pow($"c", 0.75) / $"z")
      .withColumn("cum_p", sum(pow($"c", 0.75)).over(w30) / $"z")
      .withColumn("slots",
        floor($"cum_p" * 1000000L).cast("long") -
          floor(($"cum_p" - $"p") * 1000000L).cast("long"))
      .select($"rk", $"term", $"c", round($"p", 6).as("p"),
        $"slots")
      .orderBy($"rk")
  }

  /** Youden-J threshold selection (q253) — the "pick the cutoff" step
    * AFTER q201 grades ranking and q203 grades calibration: over the
    * 21-point threshold grid, TPR/FPR of the "near-dup if score ≤ t"
    * rule (q201 measured AUC < 0.5: dups score LOWER, so the detector
    * fires on low scores) and J = TPR − FPR, maximized where the gate
    * separates best chance-corrected (Youden 1950 — ROC's operating-
    * point criterion). q204's discipline: the corpus collapses to the
    * rounded-score histogram once; the grid joins THAT (21×|hist|
    * bounded work), empty thresholds restored as explicit zero rows. */
  def qYoudenThreshold(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = scoredLabeled(s, dir).groupBy($"score")
      .agg(sum($"is_dup").as("np"), sum(lit(1L) - $"is_dup").as("nn"))
    val tot = hist.agg(sum($"np").as("n_pos"), sum($"nn").as("n_neg"))
    val grid = Tables.documents(s, dir).sparkSession
      .range(0, 21).select(($"id" * 0.05).as("t"))
    val agg = grid.join(hist, $"score" <= $"t", "left")
      .groupBy($"t")
      .agg(coalesce(sum($"np"), lit(0L)).as("tp"),
        coalesce(sum($"nn"), lit(0L)).as("fp"))
      .crossJoin(broadcast(tot))
    // one-class corpora (e.g. a 1-doc degenerate corpus has no dup
    // positives): rates are 0/0-undefined → NULL rows, like DuckDB's /0
    val tpr = $"tp".cast("double") / when($"n_pos" =!= 0L, $"n_pos")
    val fpr = $"fp".cast("double") / when($"n_neg" =!= 0L, $"n_neg")
    val j = tpr - fpr
    val best = agg.agg(max(round(j, 4) + lit(0.0)).as("best_j"))
    agg.crossJoin(broadcast(best))
      .select(round($"t", 2).as("t"), $"tp", $"fp",
        round(tpr, 4).as("tpr"), round(fpr, 4).as("fpr"),
        (round(j, 4) + lit(0.0)).as("youden_j"),
        // NULL J (one-class corpus): nothing is selected — false on
        // BOTH engines, never a NULL boolean
        coalesce((round(j, 4) + lit(0.0)) === $"best_j", lit(false))
          .as("selected"))
      .orderBy($"t")
  }

  def qAucEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = scoredLabeled(s, dir)
    val per = base.groupBy($"score")
      .agg(sum($"is_dup").as("np"), sum(lit(1L) - $"is_dup").as("nn"))
    val below = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("cum_nn", coalesce(sum($"nn").over(below), lit(0L)))
      .agg(sum($"np").as("n_pos"), sum($"nn").as("n_neg"),
        sum($"np" * (lit(2L) * $"cum_nn" + $"nn")).as("num2"))
      .select($"n_pos", $"n_neg",
        // one-class degenerate corpora (no dups at all) emit NULL, not
        // a divide-by-zero — AUC is undefined without both classes
        when($"n_pos" > 0 && $"n_neg" > 0,
          round($"num2".cast("double") /
            (lit(2.0) * $"n_pos" * $"n_neg"), 4)).as("auc"),
        when($"n_pos" > 0 && $"n_neg" > 0,
          round($"num2".cast("double") /
            ($"n_pos" * $"n_neg").cast("double") - lit(1.0), 4) + lit(0.0))
          .as("gini_coef"))
  }

  /** Effective sample size of the DSIR importance weights (q202):
    * ESS = (Σw)²/Σw² per language (Kish 1965) — the reweighting-health
    * number next to q104's weights themselves: ESS/n near 1 means the
    * weights barely reweight; near 0 means a handful of documents
    * carry the whole selected distribution (high-variance resampling —
    * the failure mode importance sampling is famous for). Weights are
    * exp(dsir_logw) off the STAGED weight frame (a derived read, no
    * gram-chain recompute); the audit itself is one partial agg to
    * |langs| rows. */
  def qEssAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = dsirWeightFrame(s, dir)
      .select($"doc_id", exp($"dsir_logw").as("w"))
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
    w.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"w").as("sw"), sum($"w" * $"w").as("sw2"))
      .select($"lang", $"n_docs",
        round($"sw" * $"sw" / $"sw2", 4).as("ess"),
        round($"sw" * $"sw" / $"sw2" / $"n_docs", 4).as("ess_ratio"))
      .orderBy($"lang")
  }

  /** Score-bin count for the calibration curve (10 equal-width bins
    * over [0,1], top edge folded into bin 9). */
  private def scoreBin(score: Column): Column =
    least(floor(score * 10).cast("int"), lit(9))

  /** Calibration curve + Brier score (q203): reliability diagram of
    * the q87 quality score against the near-dup label — q201 measures
    * DISCRIMINATION (ranking), this measures CALIBRATION (are the
    * probabilities honest): per decile-of-score bin the mean score vs
    * the observed positive rate, plus the global Brier score
    * (Brier 1950; the proper scoring rule decomposable into
    * calibration + refinement). A filter whose scores are used as
    * sampling probabilities (q102's epoch sampler) NEEDS calibration,
    * not just ranking. Scale: everything after the shared scoring pass
    * runs on 10 bin rows; Brier is one avg, attached as a constant
    * column from a 1-row broadcast. */
  def qCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = scoredLabeled(s, dir)
    val brier = base.agg(
      round(avg(($"score" - $"is_dup") * ($"score" - $"is_dup")), 4)
        .as("brier"))
    base
      .groupBy(scoreBin($"score").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"score"), 4).as("mean_score"),
        round(avg($"is_dup".cast("double")), 4).as("frac_pos"))
      .crossJoin(broadcast(brier))
      .orderBy($"bin")
  }

  /** Curriculum schedule (q329) — the quality-ordered staging plan
    * curriculum training consumes (Bengio et al. 2009 applied the
    * data-engineering way): rank the corpus by the q87 quality score
    * DESC (clean first) and cut it into 3 stages of ~equal TOKEN mass;
    * per stage the doc/token counts, token fraction, and mean score —
    * the manifest that says what "phase 1 data" actually is. Scale
    * shape: q204's — the corpus collapses once to the ≤10⁴-row
    * rounded-score histogram, the stage cut is a cumsum over that
    * bounded grid (a histogram row assigns whole, by its
    * cumulative-before mass), and mean scores stay EXACT by summing
    * score·1e4 (already an integer after the 4dp round) times doc
    * counts as longs. */
  def qCurriculumSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    curriculumOf(Tables.documents(s, dir)
      .select(round(lit(1.0) / (lit(1.0) + exp(-qualityZ)), 4).as("score"),
        size(split($"text", " ")).cast("long").as("n_toks"))
      .groupBy($"score")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens")))
  }

  /** Schedule core over any (score, n_docs, n_tokens) histogram; split
    * out so the spec can pin the token-mass tertile cut. */
  private[graft] def curriculumOf(hist0: DataFrame): DataFrame = {
    val s = hist0.sparkSession
    import s.implicits._
    val hist = hist0
      .withColumn("score_i4",
        round(lit(1e4) * $"score").cast("long") * $"n_docs")
    val w = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.agg(sum($"n_tokens").as("tt"))
    hist
      .withColumn("cum", sum($"n_tokens").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("stage",
        least(floor(($"cum" - $"n_tokens") * 3L / $"tt") + 1L, lit(3L))
          .cast("int"))
      .groupBy($"stage")
      .agg(sum($"n_docs").as("n_docs"), sum($"n_tokens").as("n_tokens"),
        sum($"score_i4").as("si4"))
      .crossJoin(broadcast(tot))
      .select($"stage", $"n_docs", $"n_tokens",
        (floor($"n_tokens".cast("double") / $"tt" * 1e4 + 0.5) / 1e4)
          .as("token_frac"),
        (floor($"si4".cast("double") / $"n_docs" + 0.5) / 1e4)
          .as("mean_score"))
      .orderBy($"stage")
  }

  /** Quality-threshold sweep (q204): kept docs/tokens at each cutoff
    * in {0.00, 0.05, …, 1.00} — the knob-tuning curve a filter
    * threshold is actually chosen from (q180 shows three fixed gates;
    * this prices EVERY setting of one gate). Scale shape: the corpus
    * collapses ONCE to the ≤10⁴-row rounded-score histogram (score,
    * n_docs, n_tokens); the 21-threshold grid joins THAT, so the
    * sweep costs one corpus pass + a 21×|grid| broadcast join — the
    * anti-pattern it avoids is one corpus scan per threshold. */
  def qThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.documents(s, dir)
      .select(round(lit(1.0) / (lit(1.0) + exp(-qualityZ)), 4).as("score"),
        size(split($"text", " ")).cast("long").as("n_toks"))
      .groupBy($"score")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
    val tot = hist.agg(sum($"n_docs").as("td"), sum($"n_tokens").as("tt"))
    val thr = thresholdGrid(s)
    thr.join(broadcast(hist), $"score" >= $"thr")
      .groupBy($"thr")
      .agg(coalesce(sum($"n_docs"), lit(0L)).as("kept_docs"),
        coalesce(sum($"n_tokens"), lit(0L)).as("kept_tokens"))
      .unionByName( // thresholds keeping nothing would vanish from the
        // inner join — restore them as explicit zero rows
        thr.join(hist, $"score" >= $"thr", "left_anti")
          .select($"thr", lit(0L).as("kept_docs"), lit(0L).as("kept_tokens")))
      .crossJoin(broadcast(tot))
      .select($"thr", $"kept_docs", $"kept_tokens",
        round($"kept_docs" / $"td".cast("double"), 4).as("doc_share"),
        round($"kept_tokens" / $"tt".cast("double"), 4).as("token_share"))
      .orderBy($"thr")
  }

  /** The 21-row threshold grid 0.00 … 1.00 step 0.05, exact two-decimal
    * values (i/20 rounded so both engines hold identical doubles). */
  private def thresholdGrid(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0, 21).select(round($"id" / 20.0, 2).as("thr"))
  }

  /** Good–Turing frequency smoothing (q296) — Good 1953: for each
    * observed count r, the adjusted count r* = (r+1)·N_{r+1}/N_r from
    * the count-of-counts profile, the estimate behind every "how much
    * probability mass belongs to unseen tokens" answer (Katz backoff
    * reserves exactly N₁/N; q160's Kneser–Ney discount is its fixed
    * approximation). Shipping the r ≤ 10 head is the standard cut —
    * above it N_r is sparse and the raw estimator is noise (Gale &
    * Sampson 1995 smooth that tail; the head is where the mass is).
    * Scale shape: token counts (one shuffle), count-of-counts over the
    * count domain (second, grid-sized shuffle), then an 11-row spine
    * left-joins the profile and its r+1 shift — both broadcast-sized.
    * r* is NULL where N_r = 0 (no observed support, honestly absent). */
  def qGoodTuring(s: SparkSession, dir: String): DataFrame =
    goodTuringOf(Tables.documents(s, dir))

  /** Good–Turing core over any frame with a `text` column; split out
    * so the spec can pin r* on a counted-by-hand corpus. */
  private[graft] def goodTuringOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
    val counts = toks.groupBy($"t").agg(count(lit(1)).as("r"))
    val nr = counts.groupBy($"r").agg(count(lit(1)).as("n_r"))
    val grid = s.range(1, 11).select($"id".as("r"))
    grid.join(nr, Seq("r"), "left")
      .join(nr.select(($"r" - 1L).as("r"), $"n_r".as("n_r1")), Seq("r"), "left")
      .select($"r", coalesce($"n_r", lit(0L)).as("n_r"),
        round(($"r" + 1L) * coalesce($"n_r1", lit(0L)).cast("double")
          / $"n_r", 4).as("r_star"))
      .orderBy($"r")
  }

  /** q299's gradient-descent schedule: fixed rounds (oracle-unrolled,
    * the q92/q282 discipline), snapped state so both engines replay
    * the identical trajectory. */
  private val LrIters = 8
  private val LrRate = 0.5

  /** Distributed logistic-regression trainer (q299) — full-batch
    * gradient ascent on "is this document English?" from two length
    * features, the in-engine classifier trainer a data pipeline uses
    * for quality/language gates when shipping data to an external
    * trainer is overkill (fastText-style gates are trained exactly
    * this shape). Each round is ONE map-side-combined aggregate over
    * the corpus (3 gradient sums) — the textbook data-parallel GD
    * layout: at 100 TB that is a full scan per round and nothing
    * else; no driver round-trips (the weight state is a 1-row frame,
    * broadcast back). Cross-engine determinism is the q289 posture:
    * the activation is the RATIONAL sigmoid surrogate
    * σ̂(u) = 0.5 + u/(2(1+|u|)) (Elliott 1993 — division instead of
    * exp, so both engines compute identical IEEE doubles), per-row
    * gradient terms quantize to the 1e-6 grid via the floor form
    * (integer-valued doubles sum EXACTLY — no order dependence), and
    * weights snap to the 1e-9 grid each round. Lineage: the feature
    * frame checkpoints once, the weight frame every round
    * (Round10Spec's barrier guard). */
  def qLogregGd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    logregCore(Tables.documents(s, dir).select(
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2")))
  }

  private[graft] def logregCore(f0: DataFrame): DataFrame = {
    val s = f0.sparkSession
    import s.implicits._
    val f = f0.roundBarrier()
    val nF = f.agg(count(lit(1)).as("n")).roundBarrier()
    var w = s.range(1)
      .select(lit(0.0).as("a"), lit(0.0).as("b"), lit(0.0).as("c"))
      .roundBarrier()
    val u = $"a" + $"b" * $"x1" + $"c" * $"x2"
    val d = $"y" - (lit(0.5) + u / (lit(2.0) * (lit(1.0) + abs(u))))
    def snap9(col: Column): Column =
      floor(col * lit(1e9) + lit(0.5)) / lit(1e9)
    for (_ <- 1 to LrIters) {
      val g = f.crossJoin(broadcast(w)).agg(
        sum(floor(lit(1e6) * d + lit(0.5))).as("ga"),
        sum(floor(lit(1e6) * d * $"x1" + lit(0.5))).as("gb"),
        sum(floor(lit(1e6) * d * $"x2" + lit(0.5))).as("gc"))
      w = w.crossJoin(broadcast(g)).crossJoin(broadcast(nF))
        .select(
          snap9($"a" + lit(LrRate) * $"ga" / (lit(1e6) * $"n")).as("a"),
          snap9($"b" + lit(LrRate) * $"gb" / (lit(1e6) * $"n")).as("b"),
          snap9($"c" + lit(LrRate) * $"gc" / (lit(1e6) * $"n")).as("c"))
        .roundBarrier()
    }
    val acc = f.crossJoin(broadcast(w)).agg(
      sum(when((u >= 0) === ($"y" === 1.0), 1L).otherwise(0L))
        .as("n_correct"))
    w.crossJoin(broadcast(acc)).crossJoin(broadcast(nF))
      .select($"a".as("w0"), $"b".as("w1"), $"c".as("w2"), $"n",
        (floor(lit(1e4) * $"n_correct" / $"n" + lit(0.5)) / lit(1e4))
          .as("train_acc"))
  }

  /** Bin width (n_chars) for q303's isotonic calibration grid. */
  private val IsoBinWidth = 25

  /** Isotonic regression by PAV (q303) — Ayer et al. 1955 via the
    * minimax identity iso(b) = max_{i≤b} min_{j≥b} mean(y over bins
    * i..j): the distribution-free calibrator (Zadrozny & Elkan 2002)
    * that q203's fixed-bin reliability curve feeds into when the raw
    * rate wiggles non-monotonically. Here: P(lang = en | length bin)
    * fitted to be monotone in length. Scale shape: ONE corpus
    * aggregate collapses to the ≤|range/width| nonempty bins;
    * the O(B³) minimax runs as two grid joins over that bin frame —
    * bounded by the value domain, never the corpus (the q182/q294
    * grid posture, but join-shaped: no window at all). Determinism:
    * every A(i,j) is a ratio of exact integer sums, and min/max
    * selection over identical doubles is exact. */
  def qIsotonicPav(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    isotonicOf(Tables.documents(s, dir).select(
      ($"n_chars" / IsoBinWidth).cast("long").as("bin"),
      when($"lang" === "en", 1L).otherwise(0L).as("y")))
  }

  /** PAV core over any (bin, y∈{0,1}) frame; split out so the spec
    * can pin pooling on a planted violation. */
  private[graft] def isotonicOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val bins = base.groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("cy"))
    val a = bins.select($"bin".as("i"))
      .join(bins.select($"bin".as("j")), $"i" <= $"j")
      .join(bins.select($"bin".as("m"), $"n", $"cy"),
        $"m" >= $"i" && $"m" <= $"j")
      .groupBy($"i", $"j")
      .agg((sum($"cy").cast("double") / sum($"n")).as("aij"))
    val t = a.join(bins.select($"bin".as("b")), $"i" <= $"b" && $"j" >= $"b")
      .groupBy($"b", $"i").agg(min($"aij").as("mn"))
    val iso = t.groupBy($"b").agg(max($"mn").as("iso"))
    bins.join(iso, bins("bin") === iso("b"))
      .select($"bin", $"n",
        (floor(lit(1e4) * $"cy" / $"n" + 0.5) / 1e4).as("rate"),
        (floor($"iso" * 1e4 + 0.5) / 1e4).as("iso"))
      .orderBy($"bin")
  }

  /** q305's BLEU n-gram orders and candidate blocking (q31's
    * min-shingle block + MaxBlock guard, via DedupQueries). */
  private val BleuMaxBlock = 1000

  /** Pairwise BLEU-2 (q305) — Papineni et al. 2002's modified n-gram
    * precision, scored over the blocked near-dup candidate pairs: the
    * ORDER-AWARE similarity the set measures (Jaccard q31, containment
    * q159) cannot see — two docs with identical vocabulary but
    * shuffled word order share sets but not bigrams. Candidate = the
    * higher doc_id, reference = the lower; clipped counts are the
    * multiset min via per-token count joins (never an all-pairs
    * explode — pairs come from the bounded block). Reported as p1, p2
    * and their geometric mean √(p1·p2) — the brevity penalty's exp()
    * is deliberately omitted (cross-engine exp is the one
    * non-deterministic op in the formula; the lengths are published
    * instead, BP = min(1, e^{1−r/c}) is derivable downstream). */
  def qBleuPairs(s: SparkSession, dir: String): DataFrame =
    bleuPairsOf(Tables.documents(s, dir))

  /** BLEU-2 core over any (doc_id, text) frame; split out so the spec
    * can pin clipped precisions on a hand-scored edit. */
  private[graft] def bleuPairsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = filter(split($"text", " "), t => t =!= lit(""))
    val d = docs
      .select($"doc_id", toks.as("tk"),
        DedupQueries.shingles(TextOps.tokenize($"text")).as("sh"))
      .filter(size($"sh") > 0)
      .withColumn("blk", array_min($"sh"))
      .withColumn("blk_n", count(lit(1)).over(Window.partitionBy($"blk")))
      .filter($"blk_n" <= BleuMaxBlock)
      // round-16: d fans out to FOUR consumers (pairs, uni, big, lens)
      // — barrier it once instead of re-running the tokenize + shingle
      // + block-window chain per consumer (guide §5: reuse > recompute
      // when the frame is a corpus-row token table). sh is only needed
      // for blk, so it is projected away before materializing.
      .select($"doc_id", $"tk", $"blk")
      .roundBarrier()
    val pairs = d.select($"doc_id".as("a"), $"blk")
      .join(d.select($"doc_id".as("b"), $"blk"), Seq("blk"))
      .filter($"a" < $"b").select($"a", $"b")
    val uni = d.select($"doc_id", explode($"tk").as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
    val big = d.select($"doc_id", explode(zip_with(
        slice($"tk", lit(1), greatest(size($"tk") - 1, lit(0))),
        slice($"tk", lit(2), greatest(size($"tk") - 1, lit(0))),
        (x, y) => concat_ws(" ", x, y))).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
    val lens = d.select($"doc_id",
      size($"tk").cast("long").as("len1"),
      greatest(size($"tk") - 1, lit(0)).cast("long").as("len2"))
    def clipped(grams: DataFrame): DataFrame =
      pairs
        .join(grams.select($"doc_id".as("a"), $"t", $"c".as("ca")), Seq("a"))
        .join(grams.select($"doc_id".as("b"), $"t", $"c".as("cb")),
          Seq("b", "t"))
        .groupBy($"a", $"b").agg(sum(least($"ca", $"cb")).as("clip"))
    val c1 = clipped(uni).withColumnRenamed("clip", "clip1")
    val c2 = clipped(big).withColumnRenamed("clip", "clip2")
    pairs
      .join(c1, Seq("a", "b"), "left")
      .join(c2, Seq("a", "b"), "left")
      .join(lens.select($"doc_id".as("b"), $"len1", $"len2"), Seq("b"))
      .select($"a", $"b",
        (floor(lit(1e4) * coalesce($"clip1", lit(0L)) / $"len1" + 0.5)
          / 1e4).as("p1"),
        (floor(lit(1e4) * coalesce($"clip2", lit(0L)) / $"len2" + 0.5)
          / 1e4).as("p2"),
        (floor(lit(1e4) * sqrt(
          (coalesce($"clip1", lit(0L)) / $"len1")
            * (coalesce($"clip2", lit(0L)) / $"len2")) + 0.5) / 1e4)
          .as("bleu2"))
      .orderBy($"a", $"b")
  }

  /** q316's per-side token cap: the LCS DP is O(n·m) per pair, so the
    * cap bounds pair cost at 64² = 4096 cells AT ANY CORPUS SIZE — the
    * same role q31's MaxBlock plays for pair counts. ROUGE-L over the
    * first 64 tokens is the standard truncated form long-doc evals
    * run; the published lengths let a consumer see what was cut. */
  private val RougeMaxTok = 64

  /** Pairwise ROUGE-L (q316) — Lin 2004: LCS-based recall/precision/F1
    * over the blocked near-dup candidate pairs, the SUBSEQUENCE
    * companion to q305's n-gram BLEU (LCS credits in-order overlap
    * with gaps — reordered-with-insertions near-dups score here and
    * nowhere else). Reference = lower doc_id, candidate = higher
    * (q305's convention). The LCS length is computed IN-ROW by the
    * classic rolling-row DP as a nested higher-order fold (outer over
    * reference tokens carrying the previous DP row; inner over
    * candidate positions appending to the current row) — pure integer
    * arithmetic, zero extra shuffles, cost capped by [[RougeMaxTok]]².
    * The oracle replays the identical DP one cell per recursive-CTE
    * step, all pairs advancing in lockstep — the hash match proves the
    * fold IS the textbook recurrence. F1 = 2RP/(R+P), defined 0.0 on
    * zero overlap. */
  def qRougePairs(s: SparkSession, dir: String): DataFrame =
    rougePairsOf(Tables.documents(s, dir))

  /** ROUGE-L core over any (doc_id, text) frame; split out so the spec
    * can pin LCS arithmetic on hand-traced pairs. */
  private[graft] def rougePairsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = filter(split($"text", " "), t => t =!= lit(""))
    val d = docs
      .select($"doc_id",
        slice(toks, 1, RougeMaxTok).as("tk"),
        DedupQueries.shingles(TextOps.tokenize($"text")).as("sh"))
      .filter(size($"sh") > 0)
      .withColumn("blk", array_min($"sh"))
      .withColumn("blk_n", count(lit(1)).over(Window.partitionBy($"blk")))
      .filter($"blk_n" <= BleuMaxBlock)
      // round-16: d is joined on BOTH sides of the pair self-join —
      // barrier the projected frame once (q305's discipline).
      .select($"doc_id", $"tk", $"blk")
      .roundBarrier()
    val pairs = d.select($"doc_id".as("a"), $"blk", $"tk".as("ta"))
      .join(d.select($"doc_id".as("b"), $"blk", $"tk".as("tb")), Seq("blk"))
      .filter($"a" < $"b")
      // a blank-text doc can carry shingles of empty tokens yet an
      // empty filtered array; Spark's sequence(1, 0) DESCENDS, so the
      // DP must never see an empty side
      .filter(size($"ta") > 0 && size($"tb") > 0)
      .select($"a", $"b", $"ta", $"tb")
    // native two-row DP (graft.plans.LcsLength): the declarative
    // nested-fold form was O(n·m²) interpreted array copies — 107 s
    // for this pair set at sf0.1; the expression is the same
    // recurrence as a primitive loop (the oracle still replays it
    // cell-for-cell, so the hash match pins expression ≡ recurrence)
    val lcs = graft.plans.LcsLength.col($"ta", $"tb")
    val r = $"lcs" / $"len_ref"
    val p = $"lcs" / $"len_cand"
    pairs
      .select($"a", $"b",
        size($"ta").cast("long").as("len_ref"),
        size($"tb").cast("long").as("len_cand"),
        lcs.as("lcs"))
      .select($"a", $"b", $"len_ref", $"len_cand", $"lcs",
        (floor(lit(1e4) * r + 0.5) / 1e4).as("rouge_r"),
        (floor(lit(1e4) * p + 0.5) / 1e4).as("rouge_p"),
        when($"lcs" === 0L, lit(0.0)).otherwise(
          floor(lit(1e4) * lit(2.0) * r * p / (r + p) + 0.5) / 1e4)
          .as("rouge_f1"))
      .orderBy($"a", $"b")
  }

  /** q322's sample size: Self-BLEU is quadratic in the sample by
    * construction (every doc scores against every other as reference),
    * so the sample is FIXED-SIZE at any corpus scale — 20 docs = 190
    * unordered pairs of gram-count joins, the md5-rank deterministic
    * draw q70 established. */
  private val SelfBleuK = 20

  /** Self-BLEU corpus diversity (q322) — Zhu et al. 2018 (Texygen):
    * score each sampled doc as a BLEU-2 candidate against ALL other
    * sampled docs as multi-references; high mean Self-BLEU = the
    * corpus keeps writing the same thing (mode collapse in generated
    * data, boilerplate monoculture in crawled data) — the DIVERSITY
    * number next to q321's divergence-to-reference. Multi-reference
    * clipping needs max gram count over 19 references per candidate —
    * computed WITHOUT a per-pair explode via the top-2 trick: per gram
    * keep (max, runner-up, #docs at max); a candidate's reference max
    * is the runner-up iff the candidate is the UNIQUE argmax, else the
    * max. Everything is exact integer counts until the two precision
    * ratios; the sample is md5-rank-deterministic so the oracle
    * replays the draw. */
  def qSelfBleu(s: SparkSession, dir: String): DataFrame =
    selfBleuOf(Tables.documents(s, dir))

  /** Self-BLEU core over any (doc_id, text) frame; split out so the
    * spec can pin the multi-ref clipping on a crafted trio. */
  private[graft] def selfBleuOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = filter(split($"text", " "), t => t =!= lit(""))
    val sample = docs
      .select($"doc_id", toks.as("tk"), md5($"doc_id".cast("string")).as("rk"))
      .filter(size($"tk") >= 2)
      .orderBy($"rk").limit(SelfBleuK)
      .select($"doc_id", $"tk")
    def gramCounts(g: Column): DataFrame = sample
      .select($"doc_id", explode(g).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
    val uni = gramCounts($"tk")
    val big = gramCounts(zip_with(
      slice($"tk", lit(1), greatest(size($"tk") - 1, lit(0))),
      slice($"tk", lit(2), greatest(size($"tk") - 1, lit(0))),
      (x, y) => concat_ws(" ", x, y)))
    // per-gram (max, runner-up, #docs-at-max) over the SAMPLE —
    // count-at-max and runner-up need the max first, so one
    // sample-scale re-join per gram table
    def clippedOf(grams: DataFrame): DataFrame = {
      val stats = grams.groupBy($"t").agg(max($"c").as("m1"))
        .join(grams, "t")
        .groupBy($"t", $"m1")
        .agg(sum(when($"c" === $"m1", 1L).otherwise(0L)).as("n_at_max"),
          max(when($"c" < $"m1", $"c")).as("m2"))
      grams.join(stats, "t")
        .select($"doc_id", $"c",
          when($"c" === $"m1" && $"n_at_max" === 1L,
            coalesce($"m2", lit(0L))).otherwise($"m1").as("maxref"))
        .groupBy($"doc_id")
        .agg(sum(least($"c", $"maxref")).as("clip"))
    }
    val lens = sample.select($"doc_id",
      size($"tk").cast("long").as("len1"),
      (size($"tk") - 1).cast("long").as("len2"))
    val p1c = clippedOf(uni).withColumnRenamed("clip", "clip1")
    val p2c = clippedOf(big).withColumnRenamed("clip", "clip2")
    lens.join(p1c, Seq("doc_id"), "left").join(p2c, Seq("doc_id"), "left")
      .select($"doc_id", $"len1",
        (floor(lit(1e4) * coalesce($"clip1", lit(0L)) / $"len1" + 0.5)
          / 1e4).as("p1"),
        (floor(lit(1e4) * coalesce($"clip2", lit(0L)) / $"len2" + 0.5)
          / 1e4).as("p2"),
        (floor(lit(1e4) * sqrt(
          (coalesce($"clip1", lit(0L)) / $"len1")
            * (coalesce($"clip2", lit(0L)) / $"len2")) + 0.5) / 1e4)
          .as("self_bleu2"))
      .orderBy($"doc_id")
  }

  /** q323's fixed probe point: the gradient-noise read-out is taken at
    * one deterministic weight vector (not a trained one — the scale
    * estimate is about the DATA's gradient dispersion, and a fixed
    * probe keeps the whole query one pass, replayable, and comparable
    * across corpus versions). */
  private val GnsW = (0.0, 0.5, 0.5)

  /** Gradient noise scale (q323) — McCandlish et al. 2018's "simple"
    * critical-batch-size estimate B ≈ tr(Σ)/|G|² from the per-example
    * gradient covariance trace and the mean-gradient norm, over q299's
    * logistic feature map at the fixed probe [[GnsW]] — the number
    * that says how LARGE a data-parallel batch this corpus rewards
    * before gradient noise stops paying for compute. One corpus pass:
    * per-doc gradient dims quantize to 1e-6 micro-units (q299's
    * discipline — the fast sigmoid u/(2(1+|u|)) keeps exp out
    * entirely), sums and sums-of-squares accumulate as EXACT
    * decimal(38,0) (the q289 big-sum pattern — a long would overflow
    * the square sums at ~10¹² rows), and the trace/norm arithmetic is
    * closed-form on the 1-row aggregate. */
  def qGradientNoise(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gradientNoiseOf(Tables.documents(s, dir).select(
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2")))
  }

  /** GNS core over any (y, x1, x2) frame; split out so the spec can
    * pin the zero-noise and high-noise extremes. */
  private[graft] def gradientNoiseOf(f: DataFrame): DataFrame = {
    val s = f.sparkSession
    import s.implicits._
    val u = lit(GnsW._1) + lit(GnsW._2) * $"x1" + lit(GnsW._3) * $"x2"
    val d = $"y" - (lit(0.5) + u / (lit(2.0) * (lit(1.0) + abs(u))))
    def q6(c: Column): Column =
      floor(lit(1e6) * c + 0.5).cast("decimal(38,0)")
    val g = f.select(q6(d).as("g0"), q6(d * $"x1").as("g1"),
      q6(d * $"x2").as("g2"))
    val agg = g.agg(count(lit(1)).as("n"),
      sum($"g0").as("s0"), sum($"g1").as("s1"), sum($"g2").as("s2"),
      sum($"g0" * $"g0").as("q0"), sum($"g1" * $"g1").as("q1"),
      sum($"g2" * $"g2").as("q2"))
    // means/vars back in natural units: micro² cancels in b_simple
    val nD = $"n".cast("double")
    def mean(sc: Column) = sc.cast("double") / nD / 1e6
    def varOf(qc: Column, sc: Column) =
      qc.cast("double") / nD / 1e12 - mean(sc) * mean(sc)
    agg.select($"n",
      (floor(mean($"s0") * 1e6 + 0.5) / 1e6).as("g_bias"),
      (floor(mean($"s1") * 1e6 + 0.5) / 1e6).as("g_x1"),
      (floor(mean($"s2") * 1e6 + 0.5) / 1e6).as("g_x2"),
      (floor((varOf($"q0", $"s0") + varOf($"q1", $"s1")
        + varOf($"q2", $"s2")) * 1e6 + 0.5) / 1e6).as("trace_cov"),
      (floor((mean($"s0") * mean($"s0") + mean($"s1") * mean($"s1")
        + mean($"s2") * mean($"s2")) * 1e6 + 0.5) / 1e6).as("gnorm2"),
      (floor((varOf($"q0", $"s0") + varOf($"q1", $"s1")
        + varOf($"q2", $"s2"))
        / (mean($"s0") * mean($"s0") + mean($"s1") * mean($"s1")
          + mean($"s2") * mean($"s2")) * 1e4 + 0.5) / 1e4).as("b_simple"))
  }

  /** Reciprocal-rank fusion (q306) — Cormack, Clarke & Buettcher 2009:
    * fuse three quality signals (chars, tokens, distinct tokens) by
    * Σ 1/(60+rank) — the rank-space ensemble that needs no score
    * normalization and is the standard way corpus pipelines combine
    * heterogeneous quality signals into one selection order. Ranks
    * are min-ranks DERIVED FROM VALUE-GRID COUNTS (1 + count of
    * strictly-better values, one grid self-join per signal) — never a
    * corpus-wide window; the three rank maps broadcast back onto the
    * corpus and the top-20 read heap-rewrites. The fused score is a
    * 3-term expression (fixed association), not an aggregate — both
    * engines evaluate the identical tree. */
  def qRrfFusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rrfOf(Tables.documents(s, dir).select($"doc_id",
      $"n_chars".as("v1"),
      size(split($"text", " ")).cast("long").as("v2"),
      size(array_distinct(split($"text", " "))).cast("long").as("v3")))
  }

  /** RRF core over any (doc_id, v1, v2, v3) frame; split out so the
    * spec can pin the fused order on crafted rank structure. */
  private[graft] def rrfOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    def rankMap(col: String): DataFrame = {
      val g = base.groupBy(base(col).as("v")).agg(count(lit(1)).as("c"))
      g.select($"v")
        .join(g.select($"v".as("v2"), $"c"), $"v2" > $"v", "left")
        .groupBy($"v")
        .agg((lit(1L) + coalesce(sum($"c"), lit(0L))).as("rk"))
    }
    val fused = base
      .join(rankMap("v1").select($"v".as("v1"), $"rk".as("r1")), Seq("v1"))
      .join(rankMap("v2").select($"v".as("v2"), $"rk".as("r2")), Seq("v2"))
      .join(rankMap("v3").select($"v".as("v3"), $"rk".as("r3")), Seq("v3"))
      .select($"doc_id", $"r1", $"r2", $"r3",
        (floor(lit(1e6) * (lit(1.0) / (lit(60L) + $"r1")
          + lit(1.0) / (lit(60L) + $"r2")
          + lit(1.0) / (lit(60L) + $"r3")) + 0.5) / 1e6).as("rrf"))
    fused.withColumn("pos", row_number().over(
        Window.orderBy($"rrf".desc, $"doc_id".asc)))
      .filter($"pos" <= 20)
      .select($"pos", $"doc_id", $"r1", $"r2", $"r3", $"rrf")
      .orderBy($"pos")
  }

  /** Decision-stump split search (q307) — the one-level CART step
    * (Breiman et al. 1984): the best `n_chars ≤ t` threshold for
    * predicting lang = en by weighted Gini impurity, the third
    * trainer shape after q299's iterative GD and q300's closed-form
    * solve, and the building block of every boosted-stump quality
    * gate. Scale shape: one aggregate to the distinct-value grid, a
    * grid cumsum for the left/right class counts, and the argmin read
    * heap-rewrites (rn = 1); Gini is pure rational arithmetic —
    * deterministic across engines, no logs. */
  def qStumpSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    stumpOf(Tables.documents(s, dir).select($"n_chars".as("v"),
      when($"lang" === "en", 1L).otherwise(0L).as("y")))
  }

  /** Stump core over any (v, y∈{0,1}) frame; split out so the spec
    * can pin the perfect-split fixture. */
  private[graft] def stumpOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val grid = base.groupBy($"v")
      .agg(count(lit(1)).as("c"), sum($"y").as("cy"))
    val tot = grid.agg(sum($"c").as("nn"), sum($"cy").as("yy"))
    val w = Window.orderBy($"v")
    val cum = grid
      .withColumn("ln", sum($"c").over(w))
      .withColumn("ly", sum($"cy").over(w))
      .crossJoin(broadcast(tot))
      .filter($"ln" < $"nn")
    val gini = cum.select($"v", $"ln", $"ly", $"nn", $"yy",
      (($"ln" - (($"ly" * $"ly" + ($"ln" - $"ly") * ($"ln" - $"ly"))
          .cast("double") / $"ln"))
        + (($"nn" - $"ln") - ((($"yy" - $"ly") * ($"yy" - $"ly")
            + (($"nn" - $"ln") - ($"yy" - $"ly"))
              * (($"nn" - $"ln") - ($"yy" - $"ly"))).cast("double")
          / ($"nn" - $"ln")))).as("gsum"))
    val best = gini.withColumn("rn", row_number().over(
        Window.orderBy($"gsum".asc, $"v".asc)))
      .filter($"rn" <= 1)
    best.select($"v".as("threshold"),
      $"ln".as("n_left"), $"ly".as("y_left"),
      ($"nn" - $"ln").as("n_right"), ($"yy" - $"ly").as("y_right"),
      (floor(lit(1e4) * ((lit(1.0)
        - ($"yy" * $"yy" + ($"nn" - $"yy") * ($"nn" - $"yy"))
          .cast("double") / ($"nn" * $"nn"))
        - $"gsum" / $"nn") + 0.5) / 1e4).as("gini_gain"),
      (floor(lit(1e4) * (greatest($"ly", $"ln" - $"ly")
        + greatest($"yy" - $"ly", ($"nn" - $"ln") - ($"yy" - $"ly")))
        .cast("double") / $"nn" + 0.5) / 1e4).as("stump_acc"))
  }

  /** q317 round count: three boosted stumps — enough to see the
    * reweighting bite (round 2 must attack round 1's mistakes) while
    * the unrolled oracle stays reviewable. */
  private val AdaRounds = 3

  /** AdaBoost over decision stumps (q317) — Freund & Schapire 1997,
    * the canonical boosting loop run ENTIRELY on the value grid: cell
    * = (n_chars value, y = ±1 for lang = en), and because every stump
    * decision and every weight update is a pure function of the cell,
    * per-DOC weights never exist — the trainer's whole state is the
    * value-domain-bounded cell frame, `localCheckpoint`ed per round
    * (the structural-guard discipline of q299/q285). Per round: one
    * grid cumsum scores every (threshold, polarity) stump by EXACT
    * integer weighted error (weights ride as 1e-6 micro-units, so
    * error sums are longs — no float-order sensitivity), the argmin
    * collects as ONE bounded driver row (the PCA/range-shard
    * precedent), and the multiplicative reweight uses
    * m = sqrt((1−e)/e) — sqrt is IEEE-correctly-rounded in both
    * engines, so cell weights stay bit-identical (exp/ln never touch
    * the weight path). The ensemble vote accumulates integer-quantized
    * alphas; ln enters ONLY there and in the reported alpha (a 1-ulp
    * libm divergence flips a 1e-6 floor with probability ~1e-10 —
    * the q292/q308 accepted class). Output: per round, the chosen
    * stump, its weighted error, alpha, and the ensemble's running
    * train accuracy. */
  def qAdaboostStumps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    adaboostOf(Tables.documents(s, dir).select($"n_chars".as("x"),
      when($"lang" === "en", 1L).otherwise(-1L).as("y")))
  }

  /** AdaBoost core over any (x, y∈{+1,−1}) frame; split out so the
    * spec can pin round-2 reweighting on a crafted two-cut fixture. */
  private[graft] def adaboostOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val empty = s.createDataFrame(
      Seq.empty[(Int, Long, Int, Double, Double, Double)]).toDF(
      "round", "threshold", "polarity", "w_err", "alpha", "acc")
    // empty corpus: no cells, no best stump (limit(1) returns nothing)
    // — zero training rounds, not a crash (0-row sweep)
    if (base.isEmpty) return empty
    var cells = base.groupBy($"x", $"y").agg(count(lit(1)).as("c"))
      .withColumn("w", lit(1000000L))
      .withColumn("vote", lit(0L))
      .roundBarrier(true)
    val out = Seq.newBuilder[(Int, Long, Int, Double, Double, Double)]
    for (r <- 1 to AdaRounds) {
      val px = cells.groupBy($"x")
        .agg(sum(when($"y" === 1L, $"w" * $"c").otherwise(0L)).as("wp"),
          sum(when($"y" === -1L, $"w" * $"c").otherwise(0L)).as("wn"))
      val wg = Window.orderBy($"x")
      val tot = px.agg(sum($"wp").as("wpt"), sum($"wn").as("wnt"))
      val cum = px
        .withColumn("cwp", sum($"wp").over(wg))
        .withColumn("cwn", sum($"wn").over(wg))
        .crossJoin(broadcast(tot))
      val thr = cum.select($"x".as("t"), lit(1).as("pol"),
          ($"cwn" + $"wpt" - $"cwp").as("err"))
        .unionAll(cum.select($"x".as("t"), lit(-1).as("pol"),
          ($"cwp" + $"wnt" - $"cwn").as("err")))
      val bestRow = thr.crossJoin(broadcast(
          tot.select(($"wpt" + $"wnt").as("wtot"))))
        .orderBy($"err".asc, $"t".asc, $"pol".desc)
        .limit(1).collect()(0)
      val (t, pol, err, wtot) = (bestRow.getAs[Long]("t"),
        bestRow.getAs[Int]("pol"), bestRow.getAs[Long]("err"),
        bestRow.getAs[Long]("wtot"))
      // wtot = 0 (all weights floored to 0 on a perfectly-separated
      // tiny corpus): 0/0 is NaN in Scala but the oracle's clamp sees
      // NULL and floors it to 1e-9 (DuckDB greatest ignores NULL) —
      // treat the zero-mass round as zero error explicitly
      val e = math.min(math.max(
        if (wtot == 0L) 0.0 else err.toDouble / wtot, 1e-9), 1.0 - 1e-9)
      val m = math.sqrt((1.0 - e) / e)
      val aq = math.floor(0.5 * math.log((1.0 - e) / e) * 1e6).toLong
      val h = when($"x" <= t, lit(pol)).otherwise(lit(-pol)).cast("long")
      cells = cells
        .withColumn("w",
          when(h =!= $"y", floor($"w" * lit(m)))
            .otherwise(floor($"w" * lit(1.0 / m))).cast("long"))
        .withColumn("vote", $"vote" + lit(aq) * h)
        .roundBarrier(true)
      val accRow = cells.agg(
        sum(when((when($"vote" >= 0L, 1L).otherwise(-1L)) === $"y", $"c")
          .otherwise(0L)).as("ok"),
        sum($"c").as("n")).collect()(0)
      val acc = accRow.getAs[Long]("ok").toDouble / accRow.getAs[Long]("n")
      out += ((r, t, pol,
        math.floor(e * 1e6 + 0.5) / 1e6,
        math.floor(aq / 100.0 + 0.5) / 1e4,
        math.floor(acc * 1e4 + 0.5) / 1e4))
    }
    s.createDataFrame(out.result()).toDF(
      "round", "threshold", "polarity", "w_err", "alpha", "acc")
  }

  /** q324 dimensions: hashed feature space and round count. 4096
    * buckets is fastText's default-order ballpark scaled to the test
    * vocabulary; 3 rounds shows the loss moving without bloating the
    * unrolled oracle. */
  private val SlrBuckets = 4096L
  private val SlrRounds = 3
  private val SlrLr = 1.0

  /** Distributed sparse logistic regression (q324) — the fastText
    * linear shape (Joulin et al. 2017): binary lang=en classifier over
    * HASHED token features (md5-prefix mod 4096 — the engine-agnostic
    * hash family, q174's discipline), trained by full-batch GD where
    * the WEIGHT VECTOR is a DataFrame. This is the trainer q299
    * deliberately isn't: q299's gradient is one scalar frame; here
    * every round is (a) inference — the bounded 4096-row weight frame
    * BROADCASTS into the doc-feature join, per-doc margins sum as
    * EXACT nano-unit longs; (b) gradient — residuals quantize to
    * micro-units and one feature-keyed aggregate partial-combines
    * map-side (the shuffle is |features| wide, never |corpus|); (c)
    * update — pure integer arithmetic on the 4096-row frame,
    * `localCheckpoint`ed per round. Nothing in the loop depends on
    * float accumulation order, so the unrolled-CTE oracle hash-matches
    * the whole trajectory. Per round the engine reports the ensemble's
    * train accuracy, bias, active-feature count, and L1 mass. */
  def qSparseLogreg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sparseLogregOf(Tables.documents(s, dir).select($"doc_id",
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"), $"text"))
  }

  /** Sparse-GD core over any (doc_id, y, text) frame; split out so the
    * spec can pin learning on a separable vocabulary. */
  private[graft] def sparseLogregOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    // empty corpus: N = 0 makes every per-round update 0/0 and the
    // metric collects NULL — zero training rounds, not a crash
    if (base.isEmpty)
      return s.createDataFrame(
        Seq.empty[(Int, Double, Double, Long, Double)]).toDF(
        "round", "acc", "w_bias", "n_active", "w_l1")
    val docs = base.select($"doc_id", $"y").roundBarrier()
    // distinct hashed features per doc (binary presence features)
    val feats = base.select($"doc_id", explode(array_distinct(
        filter(split($"text", " "), t => t =!= lit("")))).as("t"))
      .select($"doc_id",
        pmod(conv(substring(md5($"t"), 1, 12), 16, 10).cast("long"),
          lit(SlrBuckets)).as("f"))
      .distinct()
      .roundBarrier()
    val n = docs.count()
    var w = s.range(0)
      .select($"id".as("f"), lit(0L).as("w_nano")).roundBarrier(true)
    var bNano = 0L
    // Round-16 optimization: the weight-broadcast inference join used
    // to run TWICE per round — once for the gradient's margins, once
    // for the round metric at the updated weights, which is exactly
    // the NEXT round's inference. Margins are now built once per
    // weight frame, barriered, and shared by the metric and the next
    // round's gradient (guide §1.2: don't compute things twice); the
    // two weight-frame stats collapse into one aggregate job. Same
    // integer arithmetic throughout — the unrolled oracle replay is
    // untouched.
    def marginsOf(wf: DataFrame): DataFrame =
      feats.join(broadcast(wf), Seq("f"))
        .groupBy($"doc_id").agg(sum($"w_nano").as("u_nano"))
        .roundBarrier(true)
    var uDoc = marginsOf(w)
    val out = Seq.newBuilder[(Int, Double, Double, Long, Double)]
    for (r <- 1 to SlrRounds) {
      val scored = docs.join(uDoc, Seq("doc_id"), "left")
        .select($"doc_id", $"y",
          ((coalesce($"u_nano", lit(0L)) + bNano) / 1e9).as("u"))
      val dm = scored.select($"doc_id", $"y", $"u",
        floor(lit(1e6) * ($"y" - (lit(0.5) + $"u"
          / (lit(2.0) * (lit(1.0) + abs($"u"))))) + 0.5).cast("long")
          .as("d_micro")).roundBarrier(true)
      // gradient: one feature-keyed exact-integer aggregate
      val gF = feats.join(dm.select($"doc_id", $"d_micro"), Seq("doc_id"))
        .groupBy($"f").agg(sum($"d_micro").as("g_micro"))
      val gB = dm.agg(sum($"d_micro").as("gb_micro")).collect()(0)
        .getLong(0)
      // update: Δw_nano = floor(1e3·lr·g_micro / N) — one rounding
      val step = lit(1e3 * SlrLr)
      w = w.join(gF, Seq("f"), "full")
        .select(col("f"),
          (coalesce($"w_nano", lit(0L)) +
            floor(step * coalesce($"g_micro", lit(0L)) / n).cast("long"))
            .as("w_nano"))
        .filter($"w_nano" =!= 0L)
        .roundBarrier(true)
      bNano += math.floor(1e3 * SlrLr * gB / n).toLong
      // round metrics: prediction at the UPDATED weights — the same
      // margin frame the next round's gradient consumes
      uDoc = marginsOf(w)
      val acc = uDoc
        .join(docs, Seq("doc_id"), "right")
        .select($"y", (coalesce($"u_nano", lit(0L)) + bNano).as("un"))
        .agg(sum(when(($"un" > 0L).cast("double") === $"y", 1L)
          .otherwise(0L)).as("ok"), count(lit(1)).as("nn")).collect()(0)
      val wStats = w.agg(
        coalesce(sum(abs($"w_nano")), lit(0L)).as("l1"),
        count(lit(1)).as("n_active")).collect()(0)
      out += ((r,
        math.floor(acc.getLong(0).toDouble / acc.getLong(1) * 1e4 + 0.5)
          / 1e4,
        bNano / 1e9, wStats.getLong(1), wStats.getLong(0) / 1e9))
    }
    s.createDataFrame(out.result()).toDF(
      "round", "acc", "w_bias", "n_active", "w_l1")
  }

  /** Multinomial Naive Bayes language classifier (q308) — the
    * fastText-before-fastText gate: train P(lang) · Π P(token|lang)
    * with add-one smoothing and report per-language training recall.
    * The THIRD classifier trainer (after q299's GD and q307's stump),
    * and the one whose training IS a groupBy: class priors and
    * token-class counts are two aggregates, scoring is one join of
    * the doc-token counts against the (token, lang) probability table
    * (5 classes per token — a bounded multiplier, shuffled on the
    * token key), and the per-doc argmax is a doc-PARTITIONED rank.
    * ln() is evaluated on identical doubles both engines; an argmax
    * flip would need two class scores within 1 ulp — priors differ by
    * construction. */
  def qNaiveBayes(s: SparkSession, dir: String): DataFrame =
    naiveBayesOf(Tables.documents(s, dir))

  /** NB core over any (doc_id, lang, text) frame; split out so the
    * spec can pin perfect separation on a crafted vocabulary. */
  private[graft] def naiveBayesOf(docs0: DataFrame): DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val docs = docs0.select($"doc_id", $"lang",
      filter(split($"text", " "), t => t =!= lit("")).as("tk"))
    val dt = docs.select($"doc_id", $"lang", explode($"tk").as("t"))
    val classTok = dt.groupBy($"lang".as("c"), $"t")
      .agg(count(lit(1)).as("ctc"))
    val classTot = classTok.groupBy($"c").agg(sum($"ctc").as("nc"))
    val vocab = dt.agg(countDistinct($"t").as("v"))
    val priors = docs.groupBy($"lang".as("c"))
      .agg(count(lit(1)).as("ndc"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    // P(t|c) table over vocab x classes: left-join gives the +1-only
    // smoothed mass to unseen (t, c) cells
    val probs = dt.select($"t").distinct()
      .crossJoin(classTot.join(priors, "c"))
      .join(classTok, Seq("c", "t"), "left")
      .crossJoin(broadcast(vocab))
      .select($"c", $"t",
        log((coalesce($"ctc", lit(0L)) + lit(1L)).cast("double")
          / ($"nc" + $"v")).as("lp"))
    val docTok = dt.groupBy($"doc_id", $"lang", $"t")
      .agg(count(lit(1)).as("cdt"))
    val scores = docTok.join(probs, Seq("t"))
      .groupBy($"doc_id", $"lang", $"c")
      .agg(sum($"cdt" * $"lp").as("ll"))
      .join(priors.crossJoin(broadcast(nDocs)), Seq("c"))
      .select($"doc_id", $"lang", $"c",
        ($"ll" + log($"ndc".cast("double") / $"nd")).as("score"))
    val pred = scores.withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"c".asc)))
      .filter($"rn" === 1)
    pred.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"c" === $"lang", 1L).otherwise(0L)).as("n_correct"))
      .crossJoin(broadcast(nDocs))
      .select($"lang", $"n_docs",
        (floor(lit(1e4) * $"n_docs" / $"nd" + 0.5) / 1e4).as("prior"),
        (floor(lit(1e4) * $"n_correct" / $"n_docs" + 0.5) / 1e4)
          .as("recall"))
      .orderBy($"lang")
  }

  /** q309's pinball-loss GD schedule: same snapped-trajectory
    * discipline as q299, different loss. */
  private val QrTau = 0.7
  private val QrIters = 8
  private val QrRate = 0.5

  /** Quantile regression by subgradient descent (q309) — Koenker &
    * Bassett 1978: fit the τ=0.7 conditional quantile of document
    * length against token count by minimizing pinball loss. The
    * quantile line is what length-budget planning actually needs
    * (q84's token budgets care about the P70 doc, not the mean, and
    * OLS (q300) chases outliers). Same distributed shape and
    * determinism posture as q299 — one aggregate per round; the
    * pinball subgradient is τ − 1{y < ŷ} (pure comparisons, no
    * transcendentals), per-row terms quantize to the 1e-6 grid,
    * weights snap to 1e-9. */
  def qQuantileReg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    quantileRegCore(Tables.documents(s, dir).select(
      ($"n_chars" / lit(1000.0)).as("y"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x")))
  }

  private[graft] def quantileRegCore(f0: DataFrame): DataFrame = {
    val s = f0.sparkSession
    import s.implicits._
    val f = f0.roundBarrier()
    val nF = f.agg(count(lit(1)).as("n")).roundBarrier()
    var w = s.range(1).select(lit(0.0).as("a"), lit(0.0).as("b"))
      .roundBarrier()
    def snap9(col: Column): Column =
      floor(col * lit(1e9) + lit(0.5)) / lit(1e9)
    val yhat = $"a" + $"b" * $"x"
    val g = when($"y" < yhat, lit(QrTau) - lit(1.0)).otherwise(lit(QrTau))
    for (_ <- 1 to QrIters) {
      val gr = f.crossJoin(broadcast(w)).agg(
        sum(floor(lit(1e6) * g + lit(0.5))).as("ga"),
        sum(floor(lit(1e6) * g * $"x" + lit(0.5))).as("gb"))
      w = w.crossJoin(broadcast(gr)).crossJoin(broadcast(nF))
        .select(
          snap9($"a" + lit(QrRate) * $"ga" / (lit(1e6) * $"n")).as("a"),
          snap9($"b" + lit(QrRate) * $"gb" / (lit(1e6) * $"n")).as("b"))
        .roundBarrier()
    }
    // pinball loss at the final weights, exact-quantized per row
    val lossTerm = when($"y" >= yhat, lit(QrTau) * ($"y" - yhat))
      .otherwise((lit(QrTau) - lit(1.0)) * ($"y" - yhat))
    val loss = f.crossJoin(broadcast(w)).agg(
      sum(floor(lit(1e6) * lossTerm + lit(0.5))).as("pl"))
    w.crossJoin(broadcast(loss)).crossJoin(broadcast(nF))
      .select($"a".as("w0"), $"b".as("w1"), $"n",
        (floor(lit(1e4) * ($"pl" / (lit(1e6) * $"n")) + 0.5) / 1e4)
          .as("pinball"))
  }

  /** q310's schedule — mirrors q299's discipline on the train split. */
  private val TiIters = 8
  private val TiRate = 0.5

  /** TracIn data attribution (q310) — Pruthi et al. 2020, "Estimating
    * Training Data Influence by Tracing Gradient Descent": the
    * influence of train doc i on the held-out split is
    * Σ_rounds lr · ∇ℓ_i(w_r) · ḡ_val(w_r) — docs whose gradients
    * consistently AGREE with the validation gradient are proponents
    * (keep, upweight), persistent opponents are mislabeled/noise
    * (the data-cleaning signal attribution pipelines actually act
    * on). Built on q299's deterministic trajectory, split 80/20 by
    * doc_id % 5. Scale shape is the part worth copying: train the
    * R-round trajectory first (one train aggregate + one 3-number
    * val aggregate per round — all scalar state), then attribute in
    * ONE corpus pass with the 2R scalar frames cross-joined in as
    * broadcasts and the whole R-term dot-product sum evaluated
    * in-row; the top-10 read heap-rewrites. No per-round corpus
    * mutation, no driver collect. */
  /** q338 region cuts: easy ⟺ mean true-label probability ≥ 0.6, hard
    * ⟺ ≤ 0.4 — compared in EXACT micro-unit integers (Σp_µ against
    * 0.6·R·10⁶), so the bucket boundary can never ride float dust. */
  private val CartoHiMicro = 4800000L // 0.6 · R · 10⁶ at R = 8, exact
  private val CartoLoMicro = 3200000L // 0.4 · R · 10⁶ — literal longs,
  // never derived via a double product (0.6·8e6 truncates to 4799999)

  /** Dataset cartography (q338) — Swayamdipta et al. 2020 ("Dataset
    * Cartography: Mapping and Diagnosing Datasets with Training
    * Dynamics"): replay q299's exact GD trajectory, and for every
    * training document track the TRUE-label probability at each of the
    * R rounds; its mean (confidence) and cross-round variance
    * (variability) split the corpus into easy-to-learn / ambiguous /
    * hard-to-learn regions — hard ≈ mislabeled or noisy (the curation
    * signal next to q310's TracIn, which needs a val set; cartography
    * doesn't). Scale shape: R scalar weight frames (checkpointed,
    * q299's snap9 trajectory — bit-identical cross-engine), then ONE
    * corpus pass computes all R probabilities as 1e-6-quantized longs;
    * Σp and Σp² stay exact integers per doc, the region compare is
    * integer, and the per-region means divide exact decimal(38,0)
    * sums — no float accumulates across rows anywhere. Variability is
    * reported as mean population VARIANCE of the round probabilities
    * ((R·Σp² − (Σp)²)/R² per doc — the exact-integer form; the paper
    * plots the std, a monotone transform). */
  def qCartography(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cartographyOf(Tables.documents(s, dir).select($"doc_id",
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2")))
  }

  /** The q299 trajectory with every round's weights kept: LrIters
    * 1-row frames (a_r, b_r, c_r) over any (doc_id, y, x1, x2) frame —
    * shared by cartography (q338), EL2N (q364) and forgetting events
    * (q365), which are all reads over the SAME training dynamics. */
  private def lrWeights(base: DataFrame): Seq[DataFrame] = {
    val s = base.sparkSession
    import s.implicits._
    val nF = base.agg(count(lit(1)).as("n")).roundBarrier()
    var w = s.range(1)
      .select(lit(0.0).as("a"), lit(0.0).as("b"), lit(0.0).as("c"))
      .roundBarrier()
    def snap9(col: Column): Column =
      floor(col * lit(1e9) + lit(0.5)) / lit(1e9)
    val u = $"a" + $"b" * $"x1" + $"c" * $"x2"
    val d = $"y" - (lit(0.5) + u / (lit(2.0) * (lit(1.0) + abs(u))))
    val ws = Seq.newBuilder[DataFrame]
    for (r <- 1 to LrIters) {
      val g = base.crossJoin(broadcast(w)).agg(
        sum(floor(lit(1e6) * d + lit(0.5))).as("ga"),
        sum(floor(lit(1e6) * d * $"x1" + lit(0.5))).as("gb"),
        sum(floor(lit(1e6) * d * $"x2" + lit(0.5))).as("gc"))
      w = w.crossJoin(broadcast(g)).crossJoin(broadcast(nF))
        .select(
          snap9($"a" + lit(LrRate) * $"ga" / (lit(1e6) * $"n")).as("a"),
          snap9($"b" + lit(LrRate) * $"gb" / (lit(1e6) * $"n")).as("b"),
          snap9($"c" + lit(LrRate) * $"gc" / (lit(1e6) * $"n")).as("c"))
        .roundBarrier()
      ws += w.select($"a".as(s"a$r"), $"b".as(s"b$r"), $"c".as(s"c$r"))
    }
    ws.result()
  }

  /** The per-round TRUE-label probability as a 1e-6-grid long (q338's
    * t_r), over a frame that carries y/x1/x2 + the round-r weights. */
  private def probMicroAt(r: Int): Column = {
    val ur = col(s"a$r") + col(s"b$r") * col("x1") +
      col(s"c$r") * col("x2")
    val pr = lit(0.5) + ur / (lit(2.0) * (lit(1.0) + abs(ur)))
    floor(lit(1e6) * when(col("y") === 1.0, pr).otherwise(lit(1.0) - pr)
      + lit(0.5)).cast("long")
  }

  /** Cartography core over any (doc_id, y, x1, x2) frame; split out so
    * the spec can pin the easy/hard split on a separable fixture. */
  private[graft] def cartographyOf(base0: DataFrame): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    val base = base0.roundBarrier()
    var frame = base
    for (wr <- lrWeights(base)) frame = frame.crossJoin(broadcast(wr))
    val probs = (1 to LrIters).map { r =>
      val ur = col(s"a$r") + col(s"b$r") * $"x1" + col(s"c$r") * $"x2"
      val pr = lit(0.5) + ur / (lit(2.0) * (lit(1.0) + abs(ur)))
      floor(lit(1e6) * when($"y" === 1.0, pr).otherwise(lit(1.0) - pr)
        + lit(0.5)).cast("long")
    }
    val scored = frame.select($"doc_id",
      probs.reduce(_ + _).as("sp"),
      probs.map(p => p * p).reduce(_ + _).as("sq"))
    scored
      .select($"sp",
        (lit(LrIters.toLong) * $"sq" - $"sp" * $"sp").as("vn"),
        when($"sp" >= CartoHiMicro, "easy")
          .when($"sp" <= CartoLoMicro, "hard")
          .otherwise("ambiguous").as("region"))
      .groupBy($"region")
      .agg(count(lit(1)).as("n_docs"),
        sum($"sp".cast("decimal(38,0)")).as("ssp"),
        sum($"vn".cast("decimal(38,0)")).as("svn"))
      .select($"region", $"n_docs",
        (floor(lit(1e4) * ($"ssp".cast("double")
          / (lit(LrIters * 1e6) * $"n_docs")) + 0.5) / 1e4)
          .as("mean_conf"),
        (floor(lit(1e6) * ($"svn".cast("double")
          / (lit(LrIters.toDouble * LrIters * 1e12) * $"n_docs"))
          + 0.5) / 1e6).as("mean_var"))
      .orderBy($"region")
  }

  def qTracinInfluence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tracinCore(Tables.documents(s, dir).select($"doc_id",
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2"),
      ($"doc_id" % 5 === 0).as("isval")))
  }

  /** TracIn core over any (doc_id, y, x1, x2, isval) frame; split out
    * so the spec can pin that a mislabeled train doc scores below the
    * aligned ones. */
  private[graft] def tracinCore(base0: DataFrame): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    val base = base0.roundBarrier()
    val tr = base.filter(!$"isval")
    val va = base.filter($"isval")
    val nTr = tr.agg(count(lit(1)).as("n")).roundBarrier()
    val nVa = va.agg(count(lit(1)).as("nv")).roundBarrier()
    var w = s.range(1)
      .select(lit(0.0).as("a"), lit(0.0).as("b"), lit(0.0).as("c"))
      .roundBarrier()
    def snap9(col: Column): Column =
      floor(col * lit(1e9) + lit(0.5)) / lit(1e9)
    val u = $"a" + $"b" * $"x1" + $"c" * $"x2"
    val d = $"y" - (lit(0.5) + u / (lit(2.0) * (lit(1.0) + abs(u))))
    val ws = Seq.newBuilder[DataFrame]
    val gvs = Seq.newBuilder[DataFrame]
    for (r <- 1 to TiIters) {
      ws += w.select($"a".as(s"a${r - 1}"), $"b".as(s"b${r - 1}"),
        $"c".as(s"c${r - 1}"))
      // Round-16 optimization: the validation gradient and the train
      // gradient are two conditional sums over ONE pass of the same
      // (base × w) frame — they used to be two separate scans/jobs per
      // iteration (16 jobs over 8 iters). Conditional aggregation
      // yields bit-identical sums: each branch folds exactly the rows
      // its old filter kept, in the same integer micro-units.
      val gAll = base.crossJoin(broadcast(w)).agg(
          sum(when($"isval", floor(lit(1e6) * d + lit(0.5)))).as("sa"),
          sum(when($"isval",
            floor(lit(1e6) * d * $"x1" + lit(0.5)))).as("sb"),
          sum(when($"isval",
            floor(lit(1e6) * d * $"x2" + lit(0.5)))).as("sc"),
          sum(when(!$"isval", floor(lit(1e6) * d + lit(0.5)))).as("ga"),
          sum(when(!$"isval",
            floor(lit(1e6) * d * $"x1" + lit(0.5)))).as("gb"),
          sum(when(!$"isval",
            floor(lit(1e6) * d * $"x2" + lit(0.5)))).as("gc"))
        .roundBarrier()
      gvs += gAll
        .crossJoin(broadcast(nVa))
        .select(($"sa" / (lit(1e6) * $"nv")).as(s"vga$r"),
          ($"sb" / (lit(1e6) * $"nv")).as(s"vgb$r"),
          ($"sc" / (lit(1e6) * $"nv")).as(s"vgc$r"))
      w = w.crossJoin(broadcast(gAll.select($"ga", $"gb", $"gc")))
        .crossJoin(broadcast(nTr))
        .select(
          snap9($"a" + lit(TiRate) * $"ga" / (lit(1e6) * $"n")).as("a"),
          snap9($"b" + lit(TiRate) * $"gb" / (lit(1e6) * $"n")).as("b"),
          snap9($"c" + lit(TiRate) * $"gc" / (lit(1e6) * $"n")).as("c"))
        .roundBarrier()
    }
    var frame = tr
    for (wr <- ws.result()) frame = frame.crossJoin(broadcast(wr))
    for (gv <- gvs.result()) frame = frame.crossJoin(broadcast(gv))
    val infl = (1 to TiIters).map { r =>
      val ur = col(s"a${r - 1}") + col(s"b${r - 1}") * $"x1" +
        col(s"c${r - 1}") * $"x2"
      val dr = $"y" - (lit(0.5) + ur / (lit(2.0) * (lit(1.0) + abs(ur))))
      lit(TiRate) * dr * (col(s"vga$r") + $"x1" * col(s"vgb$r")
        + $"x2" * col(s"vgc$r"))
    }.reduce(_ + _)
    frame
      .select($"doc_id", (floor(infl * lit(1e6) + 0.5) / 1e6).as("infl"))
      .withColumn("pos", row_number().over(
        Window.orderBy($"infl".desc, $"doc_id".asc)))
      .filter($"pos" <= 10)
      .select($"pos", $"doc_id", $"infl")
      .orderBy($"pos")
  }

  /** q356's Huber threshold (chars) and round count. */
  private val HuberDelta = 300.0
  private val HuberRounds = 2

  /** Huber-robust regression by IRLS (q356) — Huber 1964 via
    * iteratively reweighted least squares: q300's ridge fit chases
    * outliers (squared loss is unbounded); Huber caps each row's pull
    * at δ, the fit a quality-score regression over a heavy-tailed
    * corpus actually wants. Round 0 solves q300's ridge system
    * (weights ≡ 1); each IRLS round recomputes per-row weights
    * u = min(1, δ/|y − ŷ|) and re-solves the u-weighted normal
    * equations — the textbook W-update. Distributed shape is q300's
    * multiplied by rounds: one map-side-combined 10-moment aggregate
    * per round (weights fold INTO the aggregate — the corpus is never
    * materialized with a weight column), scalar cofactor algebra on a
    * 1-row broadcast after. Determinism: u quantizes to the 1e-6 grid
    * per row, so every weighted moment is an exact integer sum
    * (decimal(38,0) where u_µ·x·x can overflow a long SUM), w snaps
    * to 1e-9 between rounds — both engines walk identical doubles. */
  def qHuberIrls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    huberCore(Tables.documents(s, dir).select(
      size(split($"text", " ")).cast("long").as("x1"),
      size(array_distinct(split($"text", " "))).cast("long").as("x2"),
      $"n_chars".as("y")))
  }

  /** Huber-IRLS core over any integer (x1, x2, y) frame; split out so
    * the spec can pin outlier resistance on a planted law. */
  private[graft] def huberCore(base0: DataFrame): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    val base = base0.roundBarrier()
    val lam = lit(100.0) // q300's ridge stabilizer, kept per round
    def snap9(c: Column): Column =
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    // one u-weighted solve; uMicro is an exact 1e-6-grid long per row.
    // EVERY weighted moment — first moments included (ADVICE r13) —
    // routes through decimal with uMicro widened BEFORE the product:
    // u_µ·(x·x) in plain long wraps past x ≈ 3e6 per row, and the
    // first-moment long SUMs wrap once n·x̄ > 9.2e12 (real at 100 TB)
    // while DuckDB sums BIGINT into HUGEINT — a silent divergence.
    def solve(f: DataFrame, uMicro: Column): DataFrame = {
      def dm(c: Column): Column =
        sum(uMicro.cast("decimal(19,0)") * c).cast("double") / 1e6
      f.agg(
          sum(uMicro.cast("decimal(19,0)")).cast("double").as("nw"),
          count(lit(1)).as("nl"),
          dm($"x1").as("s1"),
          dm($"x2").as("s2"),
          dm($"x1" * $"x1").as("s11"),
          dm($"x1" * $"x2").as("s12"),
          dm($"x2" * $"x2").as("s22"),
          dm($"y").as("sy"),
          dm($"x1" * $"y").as("s1y"),
          dm($"x2" * $"y").as("s2y"))
        .select($"nl", ($"nw" / 1e6).as("nw"),
          $"s1", $"s2",
          $"s11", $"s12", $"s22",
          $"sy", $"s1y", $"s2y")
        .withColumn("a11", $"nw" + lam)
        .withColumn("a22", $"s11" + lam)
        .withColumn("a33", $"s22" + lam)
        .withColumn("det",
          $"a11" * ($"a22" * $"a33" - $"s12" * $"s12")
            - $"s1" * ($"s1" * $"a33" - $"s12" * $"s2")
            + $"s2" * ($"s1" * $"s12" - $"a22" * $"s2"))
        .select($"nl",
          snap9((($"a22" * $"a33" - $"s12" * $"s12") * $"sy"
            + ($"s2" * $"s12" - $"s1" * $"a33") * $"s1y"
            + ($"s1" * $"s12" - $"s2" * $"a22") * $"s2y") / $"det")
            .as("w0"),
          snap9((($"s2" * $"s12" - $"s1" * $"a33") * $"sy"
            + ($"a11" * $"a33" - $"s2" * $"s2") * $"s1y"
            + ($"s2" * $"s1" - $"a11" * $"s12") * $"s2y") / $"det")
            .as("w1"),
          snap9((($"s1" * $"s12" - $"s2" * $"a22") * $"sy"
            + ($"s2" * $"s1" - $"a11" * $"s12") * $"s1y"
            + ($"a11" * $"a22" - $"s1" * $"s1") * $"s2y") / $"det")
            .as("w2"))
    }
    var w = solve(base, lit(1000000L)).roundBarrier()
    for (_ <- 1 to HuberRounds) {
      val f = base.crossJoin(broadcast(w))
      val resid = $"y" - ($"w0" + $"w1" * $"x1" + $"w2" * $"x2")
      // |r| ≤ δ keeps full weight; the branch guard keeps the δ/|r|
      // division away from |r| = 0 (ANSI)
      val u = when(abs(resid) <= lit(HuberDelta), lit(1.0))
        .otherwise(lit(HuberDelta) / abs(resid))
      w = solve(f, floor(u * lit(1e6) + lit(0.5)).cast("long"))
        .roundBarrier()
    }
    val fin = base.crossJoin(broadcast(w))
    val resid = $"y" - ($"w0" + $"w1" * $"x1" + $"w2" * $"x2")
    fin.agg(
        count(lit(1)).as("n"),
        first($"w0").as("f0"), first($"w1").as("f1"),
        first($"w2").as("f2"),
        sum(floor(abs(resid) * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).as("ar"))
      .select($"n",
        (round($"f0", 4) + lit(0.0)).as("w0"),
        (round($"f1", 4) + lit(0.0)).as("w1"),
        (round($"f2", 4) + lit(0.0)).as("w2"),
        (round($"ar".cast("double") / when($"n" > 0L, $"n") / 1e6, 4)
          + lit(0.0)).as("mean_abs_resid"))
  }

  /** q354's grid: within-source deciles. */
  private val QnTiles = 10

  /** Discrete quantile normalization (q354) — Bolstad et al. 2003
    * (the microarray method) on the decile grid: each source's
    * document-length distribution maps onto the cross-source
    * reference curve — within each source rank-decile, the value is
    * replaced by the mean of all sources' decile means. The
    * batch-effect corrector for per-source quality/length scores
    * (q115 DETECTS per-source drift; this REMOVES it before mixing
    * compares scores across sources). Shape: one per-source window
    * (partitioned — never global), one (source, decile) aggregate,
    * one |sources|×10 reference aggregate broadcast back. Per-cell
    * means quantize to exact 1e-6-grid longs before the cross-source
    * average, so no float accumulates across rows on either engine. */
  def qQuantileNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
    val per = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars")
      .withColumn("decile", ntile(QnTiles).over(w))
      .groupBy($"source", $"decile")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("sc"))
      .withColumn("mean_mc",
        floor($"sc".cast("double") * 1e6 / $"n" + 0.5).cast("long"))
    val ref = per.groupBy($"decile")
      .agg(sum($"mean_mc").as("sm"), count(lit(1)).as("ns"))
      .select($"decile",
        floor($"sm".cast("double") / $"ns" + 0.5).cast("long")
          .as("ref_mc"))
    per.join(ref, "decile")
      .select($"source", $"decile", $"n",
        (round($"mean_mc" / 1e6, 4) + lit(0.0)).as("raw_mean"),
        (round($"ref_mc" / 1e6, 4) + lit(0.0)).as("norm_value"))
      .orderBy($"source", $"decile")
  }

  /** q364's early-training read point (EL2N is most informative a few
    * steps in — Paul et al. use ~10 epochs of 200; round 2 of 8 is the
    * same early fraction). */
  private val El2nRound = 2

  /** EL2N data pruning (q364) — Paul, Ganguli & Dziugaite 2021 ("Deep
    * Learning on a Data Diet"): the error-L2-norm score ‖p − y‖₂ read
    * EARLY in training separates prunable-easy examples (tiny error
    * almost immediately) from the ones worth training on — the
    * third training-dynamics curation signal next to q338's
    * cartography (needs the whole trajectory) and q310's TracIn
    * (needs a val set); EL2N needs two gradient steps. Built on the
    * SAME q299 trajectory (lrWeights), scored at round 2; the
    * pruning decision is "below the corpus median EL2N" — median via
    * the exact interpolated percentile (q58's pairing), everything
    * else exact micro-integer sums. Output: the two pruning classes
    * with size, mean EL2N, and positive-label share (a pruning pass
    * that silently drops one class's positives is how data diets go
    * wrong — the share column is the audit). */
  def qEl2nPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    el2nOf(Tables.documents(s, dir).select($"doc_id",
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2")))
  }

  /** EL2N core over any (doc_id, y, x1, x2) frame. */
  private[graft] def el2nOf(base0: DataFrame): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    val base = base0.roundBarrier()
    val w2 = lrWeights(base)(El2nRound - 1)
    // binary case: ‖softmax − onehot‖₂ = √2·|p_true − 1|; the √2 is a
    // monotone constant, so the score is e = 1 − p_true (micro-exact)
    val scored = base.crossJoin(broadcast(w2))
      .select($"doc_id", $"y",
        (lit(1000000L) - probMicroAt(El2nRound)).as("e"))
      .roundBarrier()
    val med = scored.agg(
      expr("percentile(e, 0.5)").as("med")).roundBarrier()
    scored.crossJoin(broadcast(med))
      .withColumn("pruned", coalesce($"e" < $"med", lit(false)))
      .groupBy($"pruned")
      .agg(count(lit(1)).as("n_docs"),
        sum($"e").as("se"),
        sum(($"y" === 1.0).cast("long")).as("npos"))
      .select($"pruned", $"n_docs",
        (floor(lit(1e4) * $"se".cast("double")
          / (lit(1e6) * $"n_docs") + 0.5) / 1e4).as("mean_el2n"),
        (floor(lit(1e4) * $"npos".cast("double") / $"n_docs" + 0.5)
          / 1e4).as("pos_share"))
      .orderBy($"pruned")
  }

  /** Forgetting events (q365) — Toneva et al. 2019 ("An Empirical
    * Study of Example Forgetting during Deep Neural Network
    * Learning"): per example, count the correct→incorrect transitions
    * along the training trajectory; UNFORGETTABLE examples (learned
    * once, never forgotten) are the safely prunable mass, examples
    * that are never learned or keep being forgotten carry the signal
    * (or the label noise — q338's `hard` region from a different
    * angle). Same lrWeights trajectory; "correct at round r" is the
    * exact integer compare p_µ ≥ 500 000, so transition counting can
    * never ride float dust. One corpus pass with 8 broadcast weight
    * rows; per-class exact-integer aggregates. */
  def qForgetting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    forgettingOf(Tables.documents(s, dir).select($"doc_id",
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2")))
  }

  /** Forgetting core over any (doc_id, y, x1, x2) frame. */
  private[graft] def forgettingOf(base0: DataFrame): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    val base = base0.roundBarrier()
    var frame = base
    for (wr <- lrWeights(base)) frame = frame.crossJoin(broadcast(wr))
    val corr = (1 to LrIters).map(r =>
      when(probMicroAt(r) >= lit(500000L), 1L).otherwise(0L))
    val nForget = (2 to LrIters).map(r =>
      when(corr(r - 2) === 1L && corr(r - 1) === 0L, 1L)
        .otherwise(0L)).reduce(_ + _)
    val learned = corr.reduce(_ + _) > 0L
    frame
      .select($"doc_id",
        nForget.as("nf"),
        probMicroAt(LrIters).as("pfin"),
        when(!learned, "never_learned")
          .when(nForget === 0L, "unforgettable")
          .otherwise("forgettable").as("class"))
      .groupBy($"class")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nf").as("snf"),
        sum($"pfin").as("spf"))
      .select($"class", $"n_docs",
        (floor(lit(1e4) * $"snf".cast("double") / $"n_docs" + 0.5)
          / 1e4).as("mean_forget_events"),
        (floor(lit(1e4) * $"spf".cast("double")
          / (lit(1e6) * $"n_docs") + 0.5) / 1e4).as("mean_final_prob"))
      .orderBy($"class")
  }

  /** Self-influence / memorization proxy (q366) — Pruthi et al.
    * 2020's TracIn self-influence Σ_r η·‖∇ℓ_i(w_r)‖², the tractable
    * stand-in for Feldman & Zhang 2020's memorization score: examples
    * whose OWN gradients stay large across training are atypical or
    * memorized — the long-tail/mislabeled mass a curation pass
    * reviews first (and the privacy-risk ranking: memorized examples
    * are the extraction-prone ones). Completes the training-dynamics
    * quartet on the shared lrWeights trajectory: q338 maps regions,
    * q364 reads one early step, q365 counts transitions, q366 ranks
    * by gradient energy — four curation signals, ONE trajectory fit.
    * For the 3-parameter model ‖∇ℓ_i‖² = d²·(1 + x1² + x2²) exactly;
    * per-round terms quantize to 1e-6 longs so the ranking never
    * rides float dust; top-10 reads through the heap rewrite. */
  def qSelfInfluence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    selfInfluenceOf(Tables.documents(s, dir).select($"doc_id",
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      ($"n_chars" / lit(1000.0)).as("x1"),
      (size(split($"text", " ")).cast("double") / lit(100.0)).as("x2")))
  }

  /** Self-influence core over any (doc_id, y, x1, x2) frame. */
  private[graft] def selfInfluenceOf(base0: DataFrame): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    val base = base0.roundBarrier()
    var frame = base
    for (wr <- lrWeights(base)) frame = frame.crossJoin(broadcast(wr))
    val si = (1 to LrIters).map { r =>
      val ur = col(s"a$r") + col(s"b$r") * $"x1" + col(s"c$r") * $"x2"
      val dr = $"y" - (lit(0.5) + ur / (lit(2.0) * (lit(1.0) + abs(ur))))
      floor(lit(1e6) * lit(LrRate) * dr * dr *
        (lit(1.0) + $"x1" * $"x1" + $"x2" * $"x2") + lit(0.5))
        .cast("long")
    }.reduce(_ + _)
    frame.select($"doc_id", si.as("sim"))
      .withColumn("pos", row_number().over(
        Window.orderBy($"sim".desc, $"doc_id".asc)))
      .filter($"pos" <= 10)
      .select($"pos", $"doc_id",
        ($"sim" / 1e6).as("self_influence"))
      .orderBy($"pos")
  }

  private def selfInfluenceSql: String = {
    val us = (1 to LrIters).map(r =>
      s"w$r.a + w$r.b * f.x1 + w$r.c * f.x2 AS u$r").mkString(",\n|    ")
    val crossWs = (1 to LrIters).map(r => s"CROSS JOIN w$r").mkString(" ")
    val ts = (1 to LrIters).map(r =>
      s"""CAST(floor(1e6 * $LrRate
         |      * (y - (0.5 + u$r / (2.0 * (1.0 + abs(u$r)))))
         |      * (y - (0.5 + u$r / (2.0 * (1.0 + abs(u$r)))))
         |      * (1.0 + x1 * x1 + x2 * x2) + 0.5) AS BIGINT)
         |      AS t$r""".stripMargin).mkString(",\n|    ")
    val siSum = (1 to LrIters).map(r => s"t$r").mkString(" + ")
    s"""WITH $lrChainCtes,
      |fid AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE)
      |      AS y,
      |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
      |    CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS x2
      |  FROM documents),
      |scored AS (
      |  SELECT f.doc_id, f.y, f.x1, f.x2,
      |    $us
      |  FROM fid f $crossWs),
      |terms AS (
      |  SELECT doc_id,
      |    $ts
      |  FROM scored),
      |doc AS (SELECT doc_id, ($siSum) AS sim FROM terms),
      |rk AS (
      |  SELECT doc_id, sim, row_number() OVER (
      |    ORDER BY sim DESC, doc_id ASC) AS pos
      |  FROM doc)
      |SELECT CAST(pos AS INTEGER) AS pos, doc_id,
      |  sim / 1e6 AS self_influence
      |FROM rk WHERE pos <= 10 ORDER BY pos""".stripMargin
  }

  /** q362's persistence parameter and evaluation depth; the p^(d−1)
    * weights ship as Scala-computed double literals so both engines
    * hold identical constants (java Math.pow vs libm pow can differ
    * in the last ulp). */
  private val RboP = 0.9
  private val RboDepth = 20
  private val RboW: Seq[Double] =
    (1 to RboDepth).map(d => math.pow(RboP, d - 1))

  /** Rank-biased overlap (q362) — Webber, Moffat & Zobel 2010: the
    * top-weighted agreement measure between two INDEFINITE rankings,
    * RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·|A_{:d} ∩ B_{:d}|/d — the metric
    * for "did my ranker change meaningfully" that Kendall/Spearman
    * (q314/q295) get wrong for rankings where only the head matters
    * (a swap at rank 2 should cost more than one at rank 19). Here:
    * the corpus ranked by length vs by lexical richness (distinct
    * tokens), truncated at depth 20 with p = 0.9. Scale shape: two
    * heap-rewritten global top-20s (never a full sort), their join
    * collapses to ONE ≤20-element aggregated array, and every depth's
    * intersection size is an in-row filter over it — the depth fold is
    * a fixed 20-term expression tree, identical on both engines, so no
    * accumulation-order issue exists. */
  def qRbo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"n_chars",
      size(array_distinct(split($"text", " "))).as("ntok"))
    def top(c: Column, name: String): DataFrame = docs
      .withColumn("rk", row_number().over(
        Window.orderBy(c.desc, $"doc_id".asc)))
      .filter($"rk" <= RboDepth)
      .select($"doc_id", $"rk".cast("long").as(name))
    val common = top($"n_chars", "ra").join(top($"ntok", "rb"), "doc_id")
    // empty-intersection corpora: DuckDB's list() over zero rows is
    // NULL where Spark's collect_list is [] — coalesce on BOTH engines
    val carr = common
      .agg(collect_list(struct($"ra", $"rb")).as("prs0"))
      .select(coalesce($"prs0",
        array().cast("array<struct<ra:bigint,rb:bigint>>")).as("prs"))
    def xAt(d: Int): Column = size(filter($"prs",
      p => p.getField("ra") <= lit(d.toLong) &&
        p.getField("rb") <= lit(d.toLong)))
    val rbo = (1 to RboDepth).map(d =>
      lit(RboW(d - 1)) * xAt(d).cast("double") / lit(d.toDouble))
      .reduce(_ + _) * lit(1.0 - RboP)
    carr.select(
      xAt(5).cast("long").as("overlap_5"),
      xAt(10).cast("long").as("overlap_10"),
      xAt(RboDepth).cast("long").as("overlap_20"),
      (round(rbo, 4) + lit(0.0)).as("rbo"))
  }

  /** q357's bucket count — 2^6, small enough that collisions are the
    * POINT (the query reports them). */
  private val FhBuckets = 64

  /** Feature hashing (q357) — Weinberger et al. 2009's hashing trick:
    * terms map to a FIXED 64-slot feature space via a hash bucket and
    * a ± sign hash (the sign makes collisions cancel in expectation —
    * the trick that keeps the estimator unbiased), the featurizer
    * that replaces an unbounded vocabulary→index dictionary at 100 TB
    * (no vocab broadcast, no OOV path — q164's problem dissolves).
    * Published per bucket: distinct colliding terms, token mass, and
    * the signed sum whose |·| ≪ mass signals heavy cancellation.
    * Zero joins — one explode + one 64-group aggregate; the md5
    * bucket/sign replays verbatim in SQL. */
  def qFeatureHashing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = md5(concat(lit("fh:"), $"term"))
    Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .select($"term",
        pmod(conv(substring(h, 1, 6), 16, 10).cast("long"),
          lit(FhBuckets.toLong)).as("bucket"),
        when(substring(h, 7, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1L))
          .otherwise(lit(-1L)).as("sign"))
      .groupBy($"bucket")
      .agg(countDistinct($"term").as("n_terms"),
        count(lit(1)).as("n_tokens"),
        sum($"sign").as("signed_sum"))
      .orderBy($"bucket")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q354_quantile_norm" -> (qQuantileNorm _),
      "q362_rbo" -> (qRbo _),
      "q364_el2n_pruning" -> (qEl2nPruning _),
      "q365_forgetting" -> (qForgetting _),
      "q366_self_influence" -> (qSelfInfluence _),
      "q356_huber_irls" -> (qHuberIrls _),
      "q357_feature_hashing" -> (qFeatureHashing _),
      "q296_good_turing" -> (qGoodTuring _),
      "q299_logreg_gd" -> (qLogregGd _),
      "q338_cartography" -> (qCartography _),
      "q308_naive_bayes" -> (qNaiveBayes _),
      "q309_quantile_reg" -> (qQuantileReg _),
      "q310_tracin_influence" -> (qTracinInfluence _),
      "q303_isotonic_pav" -> (qIsotonicPav _),
      "q305_bleu_pairs" -> (qBleuPairs _),
      "q306_rrf_fusion" -> (qRrfFusion _),
      "q307_stump_split" -> (qStumpSplit _),
      "q316_rouge_pairs" -> (qRougePairs _),
      "q317_adaboost_stumps" -> (qAdaboostStumps _),
      "q319_mcnemar_gates" -> (qMcnemarGates _),
      "q320_brier_decomposition" -> (qBrierDecomposition _),
      "q322_self_bleu" -> (qSelfBleu _),
      "q323_gradient_noise" -> (qGradientNoise _),
      "q324_sparse_logreg" -> (qSparseLogreg _),
      "q329_curriculum_schedule" -> (qCurriculumSchedule _),
      "q332_bh_drift_screen" -> (qBhDriftScreen _),
      "q202_ess_audit" -> (qEssAudit _),
      "q203_calibration" -> (qCalibration _),
      "q204_threshold_sweep" -> (qThresholdSweep _),
      "q201_auc_eval" -> (qAucEval _),
      "q194_psi_drift" -> (qPsiDrift _),
      "q142_quality_calibrate" -> (qQualityCalibrate _),
      "q125_bm25" -> (qBm25 _),
      "q247_prf_expansion" -> (qPrfExpansion _),
      "q252_neg_sampling" -> (qNegSampling _),
      "q253_youden" -> (qYoudenThreshold _),
      "q115_source_drift" -> (qSourceDrift _),
      "q114_dsir_select" -> (qDsirSelect _),
      "q71_tfidf_topk"  -> (qTfidfTopk _),
      "q72_unigram_nll" -> (qUnigramNll _),
      "q87_quality_classifier" -> (qQualityClassifier _),
      "q238_gate_kappa" -> (qGateKappa _),
      "q93_bigram_nll"  -> (qBigramNll _),
      "q160_kn_bigram"  -> (qKneserNeyNll _),
      "q228_ppmi_sim"   -> (qPpmiSim _),
      "q165_feature_mi" -> (qFeatureMi _),
      "q178_robust_z"   -> (qRobustZ _),
      "q182_ks_drift"   -> (qKsDrift _),
      "q101_ppl_routing" -> (qPerplexityRouting _),
      "q104_dsir_weights" -> (qDsirWeights _),
      "q277_doremi_reweight" -> (qDoremiReweight _),
      "q380_quartile_mixing" -> (qQuartileMixing _),
      "q391_doremi_iter2"   -> (qDoremiIter2 _),
      "q280_dedup_quality_skew" -> (qDedupQualitySkew _),
      "q282_jm_interpolation" -> (qJmInterpolation _),
    )

  /** Shared oracle CTE chain ending in `lab(doc_id, score, is_dup)` —
    * the q87 sigmoid score with q199's near-dup membership label;
    * q201 (AUC) and q203 (calibration) both build on it. */
  private def labCtesSql: String = {
    val stop16 = Stop16.map(w => s"'$w'").mkString("(", ", ", ")")
    s"""${DedupQueries.bruteforcePairsCte},
      |mem AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_a AS doc_id FROM p WHERE i * 5 >= (na + nb - i) * 4
      |    UNION ALL
      |    SELECT doc_b AS doc_id FROM p
      |    WHERE i * 5 >= (na + nb - i) * 4)),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_words,
      |    str_split(text, ' ') AS tk, text
      |  FROM documents),
      |z AS (
      |  SELECT doc_id,
      |    $Wb + $Wl * ln(1.0 + n_words)
      |      + $Ww * (list_sum(list_transform(tk,
      |          x -> CAST(length(x) AS DOUBLE))) / n_words)
      |      + $Ws * (CAST(len(list_filter(tk, x -> x IN $stop16))
      |          AS DOUBLE) / n_words)
      |      + $Wu * coalesce(
      |          CAST(length(text) - length(regexp_replace(text,
      |            '[A-Z]', '', 'g')) AS DOUBLE)
      |            / nullif(length(text), 0), 0.0) AS z
      |  FROM f),
      |lab AS (
      |  SELECT z.doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score,
      |    CASE WHEN mem.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      |  FROM z LEFT JOIN mem ON z.doc_id = mem.doc_id)""".stripMargin
  }

  /** Shared oracle CTE chain ending in `weights(doc_id, n_grams,
    * dsir_logw)` — q104 selects it directly, q114 builds the
    * budgeted selection on top. */
  private val dsirOracleCtes: String =
    """WITH d AS (
        |  SELECT doc_id, lang, str_split(text, ' ') AS tk FROM documents),
        |uni AS (
        |  SELECT doc_id, lang, unnest(tk) AS g FROM d),
        |bi AS (
        |  SELECT doc_id, lang, tk[i] || ' ' || tk[i+1] AS g
        |  FROM (SELECT doc_id, lang, tk,
        |          unnest(range(1, len(tk))) AS i FROM d)),
        |grams AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('dsir:' || g), 1, 6))::BIGINT % 1024 AS b
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |raw AS (SELECT b, count(*) AS c_raw FROM grams GROUP BY b),
        |tgt AS (SELECT b, count(*) AS c_tgt FROM grams
        |        WHERE lang = 'en' GROUP BY b),
        |nr AS (SELECT sum(c_raw) AS n_raw FROM raw),
        |nt AS (SELECT coalesce(sum(c_tgt), 0) AS n_tgt FROM tgt),
        |ratio AS (
        |  SELECT raw.b,
        |    ln((coalesce(c_tgt, 0) + 0.5) / (n_tgt + 512.0))
        |      - ln((c_raw + 0.5) / (n_raw + 512.0)) AS llr
        |  FROM raw LEFT JOIN tgt USING (b)
        |  CROSS JOIN nr CROSS JOIN nt),
        |weights AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    round(avg(llr), 4) + 0.0 AS dsir_logw
        |  FROM grams JOIN ratio USING (b)
        |  GROUP BY doc_id)""".stripMargin

  /** One unrolled AdaBoost round as chained CTEs (the q92/q110
    * unrolled-iteration oracle pattern): stump scores from the same
    * integer cumsums, the same (err, t, pol DESC) argmin, the same
    * sqrt-only weight path and floor quantizations as the engine. */
  private def adaRoundCteSql(i: Int): String = {
    val p = i - 1
    s"""px$i AS (
       |  SELECT x,
       |    CAST(sum(CASE WHEN y = 1 THEN w * c ELSE 0 END) AS BIGINT)
       |      AS wp,
       |    CAST(sum(CASE WHEN y = -1 THEN w * c ELSE 0 END) AS BIGINT)
       |      AS wn
       |  FROM cells$p GROUP BY x),
       |cum$i AS (
       |  SELECT x,
       |    CAST(sum(wp) OVER (ORDER BY x) AS BIGINT) AS cwp,
       |    CAST(sum(wn) OVER (ORDER BY x) AS BIGINT) AS cwn
       |  FROM px$i),
       |tot$i AS (
       |  SELECT CAST(sum(wp) AS BIGINT) AS wpt,
       |    CAST(sum(wn) AS BIGINT) AS wnt FROM px$i),
       |thr$i AS (
       |  SELECT x AS t, 1 AS pol,
       |    CAST(cwn + wpt - cwp AS BIGINT) AS err
       |  FROM cum$i CROSS JOIN tot$i
       |  UNION ALL
       |  SELECT x, -1, CAST(cwp + wnt - cwn AS BIGINT)
       |  FROM cum$i CROSS JOIN tot$i),
       |best$i AS (
       |  SELECT t, pol, err FROM thr$i
       |  ORDER BY err, t, pol DESC LIMIT 1),
       |st$i AS (
       |  SELECT t, pol, err,
       |    least(greatest(CAST(err AS DOUBLE) / (wpt + wnt), 1e-9),
       |      1 - 1e-9) AS e
       |  FROM best$i CROSS JOIN tot$i),
       |st2$i AS (
       |  SELECT *, sqrt((1 - e) / e) AS m,
       |    CAST(floor(0.5 * ln((1 - e) / e) * 1e6) AS BIGINT) AS aq
       |  FROM st$i),
       |cells$i AS (
       |  SELECT x, y, c,
       |    CAST(floor(w * CASE WHEN
       |        (CASE WHEN x <= s.t THEN s.pol ELSE -s.pol END) <> y
       |      THEN s.m ELSE 1.0 / s.m END) AS BIGINT) AS w,
       |    vote + s.aq
       |      * (CASE WHEN x <= s.t THEN s.pol ELSE -s.pol END) AS vote
       |  FROM cells$p CROSS JOIN st2$i s),
       |acc$i AS (
       |  SELECT CAST(sum(CASE WHEN
       |      (CASE WHEN vote >= 0 THEN 1 ELSE -1 END) = y
       |      THEN c ELSE 0 END) AS BIGINT) AS ok,
       |    CAST(sum(c) AS BIGINT) AS n
       |  FROM cells$i)""".stripMargin
  }

  private def adaboostSql: String = {
    val rounds = (1 to 3).map(adaRoundCteSql).mkString(",\n")
    val rows = (1 to 3).map { i =>
      s"""SELECT $i AS round, st2$i.t AS threshold,
         |  st2$i.pol AS polarity,
         |  floor(st2$i.e * 1e6 + 0.5) / 1e6 AS w_err,
         |  floor(st2$i.aq / 100.0 + 0.5) / 1e4 AS alpha,
         |  floor(CAST(acc$i.ok AS DOUBLE) / acc$i.n * 1e4 + 0.5) / 1e4
         |    AS acc
         |FROM st2$i CROSS JOIN acc$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cells0 AS (
       |  SELECT CAST(n_chars AS BIGINT) AS x,
       |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |    CAST(count(*) AS BIGINT) AS c,
       |    CAST(1000000 AS BIGINT) AS w, CAST(0 AS BIGINT) AS vote
       |  FROM documents GROUP BY 1, 2),
       |$rounds
       |$rows
       |ORDER BY round""".stripMargin
  }

  /** One unrolled sparse-GD round (q324): inference in exact
    * nano-units, micro-quantized residuals, feature-keyed integer
    * gradient, floor-stepped update — the engine's arithmetic
    * verbatim. */
  private def slrRoundCteSql(i: Int): String = {
    val p = i - 1
    s"""u$i AS (
       |  SELECT d.doc_id, d.y,
       |    (coalesce(wsum.u, 0) + (SELECT b FROM b$p)) / 1e9 AS u
       |  FROM docs d LEFT JOIN (
       |    SELECT feats.doc_id, CAST(sum(w$p.w_nano) AS BIGINT) AS u
       |    FROM feats JOIN w$p ON feats.f = w$p.f
       |    GROUP BY feats.doc_id) wsum
       |  ON d.doc_id = wsum.doc_id),
       |dm$i AS (
       |  SELECT doc_id,
       |    CAST(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
       |      + 0.5) AS BIGINT) AS d_micro
       |  FROM u$i),
       |gf$i AS (
       |  SELECT f, CAST(sum(d_micro) AS BIGINT) AS g_micro
       |  FROM feats JOIN dm$i ON feats.doc_id = dm$i.doc_id
       |  GROUP BY f),
       |gb$i AS (SELECT CAST(sum(d_micro) AS BIGINT) AS g FROM dm$i),
       |w$i AS (
       |  SELECT coalesce(w$p.f, gf$i.f) AS f,
       |    CAST(coalesce(w$p.w_nano, 0)
       |      + floor(1e3 * $SlrLr * coalesce(gf$i.g_micro, 0)
       |          / (SELECT n FROM nn)) AS BIGINT) AS w_nano
       |  FROM w$p FULL JOIN gf$i ON w$p.f = gf$i.f
       |  WHERE CAST(coalesce(w$p.w_nano, 0)
       |    + floor(1e3 * $SlrLr * coalesce(gf$i.g_micro, 0)
       |        / (SELECT n FROM nn)) AS BIGINT) <> 0),
       |b$i AS (
       |  SELECT (SELECT b FROM b$p)
       |    + CAST(floor(1e3 * $SlrLr * (SELECT g FROM gb$i)
       |        / (SELECT n FROM nn)) AS BIGINT) AS b),
       |acc$i AS (
       |  SELECT CAST(sum(CASE WHEN
       |      (CASE WHEN coalesce(wsum.u, 0) + (SELECT b FROM b$i) > 0
       |        THEN 1.0 ELSE 0.0 END) = d.y THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ok,
       |    CAST(count(*) AS BIGINT) AS nn2
       |  FROM docs d LEFT JOIN (
       |    SELECT feats.doc_id, CAST(sum(w$i.w_nano) AS BIGINT) AS u
       |    FROM feats JOIN w$i ON feats.f = w$i.f
       |    GROUP BY feats.doc_id) wsum
       |  ON d.doc_id = wsum.doc_id),
       |st$i AS (
       |  SELECT $i AS round,
       |    floor(CAST(ok AS DOUBLE) / nn2 * 1e4 + 0.5) / 1e4 AS acc,
       |    (SELECT b FROM b$i) / 1e9 AS w_bias,
       |    (SELECT CAST(count(*) AS BIGINT) FROM w$i) AS n_active,
       |    (SELECT CAST(coalesce(sum(abs(w_nano)), 0) AS BIGINT)
       |      FROM w$i) / 1e9 AS w_l1
       |  FROM acc$i)""".stripMargin
  }

  private def sparseLogregSql: String = {
    val rounds = (1 to SlrRounds).map(slrRoundCteSql).mkString(",\n")
    // empty corpus ⇒ zero training rounds (the engine's early exit) —
    // without the guard the unrolled CTEs still emit one NULL-stats
    // row per round
    val rows = (1 to SlrRounds).map(i =>
        s"SELECT * FROM st$i WHERE (SELECT n FROM nn) > 0")
      .mkString("\nUNION ALL\n")
    s"""WITH docs AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |feats AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(t), 1, 12))::BIGINT % $SlrBuckets AS f
       |  FROM (SELECT doc_id, unnest(list_distinct(list_filter(
       |    str_split(text, ' '), x -> x <> ''))) AS t FROM documents)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS f,
       |  CAST(NULL AS BIGINT) AS w_nano WHERE false),
       |b0 AS (SELECT CAST(0 AS BIGINT) AS b),
       |$rounds
       |$rows
       |ORDER BY round""".stripMargin
  }

  /** q356's oracle: the IRLS rounds unrolled — each round is one
    * u-weighted 10-moment aggregate (exact integer sums; u on the
    * 1e-6 grid) + the q300 cofactor solve, w snapped to 1e-9, exactly
    * the engine's tree. */
  private def huberIrlsSql: String = {
    // one weighted solve: rows of `src` must expose x1, x2, y and the
    // 1e-6-grid weight column um; emits w$i(w0, w1, w2)
    def solve(i: Int, src: String): String =
      s"""m$i AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nl,
        |    CAST(sum(um) AS DOUBLE) / 1e6 AS nw,
        |    CAST(sum(um * x1) AS DOUBLE) / 1e6 AS s1,
        |    CAST(sum(um * x2) AS DOUBLE) / 1e6 AS s2,
        |    CAST(sum(um * x1 * x1) AS DOUBLE) / 1e6 AS s11,
        |    CAST(sum(um * x1 * x2) AS DOUBLE) / 1e6 AS s12,
        |    CAST(sum(um * x2 * x2) AS DOUBLE) / 1e6 AS s22,
        |    CAST(sum(um * y) AS DOUBLE) / 1e6 AS sy,
        |    CAST(sum(um * x1 * y) AS DOUBLE) / 1e6 AS s1y,
        |    CAST(sum(um * x2 * y) AS DOUBLE) / 1e6 AS s2y
        |  FROM $src),
        |k$i AS (
        |  SELECT *, nw + 100.0 AS a11, s11 + 100.0 AS a22,
        |    s22 + 100.0 AS a33 FROM m$i),
        |d$i AS (
        |  SELECT *,
        |    a11 * (a22 * a33 - s12 * s12)
        |      - s1 * (s1 * a33 - s12 * s2)
        |      + s2 * (s1 * s12 - a22 * s2) AS det
        |  FROM k$i),
        |w$i AS (
        |  SELECT nl,
        |    floor((((a22 * a33 - s12 * s12) * sy
        |      + (s2 * s12 - s1 * a33) * s1y
        |      + (s1 * s12 - s2 * a22) * s2y) / det) * 1e9 + 0.5) / 1e9
        |      AS w0,
        |    floor((((s2 * s12 - s1 * a33) * sy
        |      + (a11 * a33 - s2 * s2) * s1y
        |      + (s2 * s1 - a11 * s12) * s2y) / det) * 1e9 + 0.5) / 1e9
        |      AS w1,
        |    floor((((s1 * s12 - s2 * a22) * sy
        |      + (s2 * s1 - a11 * s12) * s1y
        |      + (a11 * a22 - s1 * s1) * s2y) / det) * 1e9 + 0.5) / 1e9
        |      AS w2
        |  FROM d$i)""".stripMargin
    val rounds = (1 to HuberRounds).map { i =>
      s"""r$i AS (
        |  SELECT b.x1, b.x2, b.y,
        |    CAST(floor((CASE
        |      WHEN abs(b.y - (w.w0 + w.w1 * b.x1 + w.w2 * b.x2))
        |        <= $HuberDelta THEN 1.0
        |      ELSE $HuberDelta
        |        / abs(b.y - (w.w0 + w.w1 * b.x1 + w.w2 * b.x2))
        |      END) * 1e6 + 0.5) AS BIGINT) AS um
        |  FROM b CROSS JOIN w${i - 1} w),
        |${solve(i, s"r$i")}""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (
      |  SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
      |    CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT)
      |      AS x2,
      |    n_chars AS y
      |  FROM documents),
      |b0 AS (SELECT *, CAST(1000000 AS BIGINT) AS um FROM b),
      |${solve(0, "b0")},
      |$rounds
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n,
      |  round(w0, 4) + 0.0 AS w0, round(w1, 4) + 0.0 AS w1,
      |  round(w2, 4) + 0.0 AS w2,
      |  round(CAST((SELECT sum(CAST(floor(abs(b.y - (w.w0 + w.w1 * b.x1
      |      + w.w2 * b.x2)) * 1e6 + 0.5) AS BIGINT))
      |    FROM b CROSS JOIN w$HuberRounds w) AS DOUBLE)
      |    / nullif((SELECT count(*) FROM b), 0) / 1e6, 4) + 0.0
      |    AS mean_abs_resid
      |FROM w$HuberRounds""".stripMargin
  }

  /** The q299/q338 trajectory as CTEs (f, nn, w0, g1/w1 … gR/wR) —
    * the q364/q365 oracles read different statistics off the same
    * unrolled chain. */
  private def lrChainCtes: String = {
    def rd(p: String, c: String): String =
      s"""g$c AS (
        |  SELECT
        |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
        |      + 0.5)) AS ga,
        |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
        |      * x1 + 0.5)) AS gb,
        |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
        |      * x2 + 0.5)) AS gc
        |  FROM (SELECT f.y, f.x1, f.x2,
        |      w$p.a + w$p.b * f.x1 + w$p.c * f.x2 AS u
        |    FROM f CROSS JOIN w$p)),
        |w$c AS (
        |  SELECT
        |    floor((w$p.a + $LrRate * g$c.ga / (1e6 * nn.n)) * 1e9
        |      + 0.5) / 1e9 AS a,
        |    floor((w$p.b + $LrRate * g$c.gb / (1e6 * nn.n)) * 1e9
        |      + 0.5) / 1e9 AS b,
        |    floor((w$p.c + $LrRate * g$c.gc / (1e6 * nn.n)) * 1e9
        |      + 0.5) / 1e9 AS c
        |  FROM w$p CROSS JOIN g$c CROSS JOIN nn)""".stripMargin
    val rounds = (1 to LrIters)
      .map(i => rd((i - 1).toString, i.toString)).mkString(",\n")
    s"""f AS (
      |  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE)
      |      AS y,
      |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
      |    CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS x2
      |  FROM documents),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
      |w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b,
      |  CAST(0 AS DOUBLE) AS c),
      |$rounds""".stripMargin
  }

  /** t_r: the round-r true-label probability as a micro long (q338's
    * term form), over a row exposing y and u$r. */
  private def lrTermSql(r: Int): String =
    s"""CAST(floor(1e6 * (CASE WHEN y = 1.0
       |      THEN (0.5 + u$r / (2.0 * (1.0 + abs(u$r))))
       |      ELSE 1.0 - (0.5 + u$r / (2.0 * (1.0 + abs(u$r)))) END)
       |      + 0.5) AS BIGINT) AS t$r""".stripMargin

  private def el2nSql: String =
    s"""WITH $lrChainCtes,
      |scored AS (
      |  SELECT f.y, w$El2nRound.a + w$El2nRound.b * f.x1
      |    + w$El2nRound.c * f.x2 AS u$El2nRound
      |  FROM f CROSS JOIN w$El2nRound),
      |terms AS (SELECT y, ${lrTermSql(El2nRound)} FROM scored),
      |e AS (SELECT y, 1000000 - t$El2nRound AS e FROM terms),
      |med AS (SELECT quantile_cont(e, 0.5) AS med FROM e),
      |dec AS (
      |  SELECT y, e, coalesce(e < med, FALSE) AS pruned
      |  FROM e CROSS JOIN med)
      |SELECT pruned, CAST(count(*) AS BIGINT) AS n_docs,
      |  floor(1e4 * CAST(sum(e) AS DOUBLE) / (1e6 * count(*)) + 0.5)
      |    / 1e4 AS mean_el2n,
      |  floor(1e4 * CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*) + 0.5) / 1e4 AS pos_share
      |FROM dec GROUP BY pruned ORDER BY pruned""".stripMargin

  private def forgettingSql: String = {
    val us = (1 to LrIters).map(r =>
      s"w$r.a + w$r.b * f.x1 + w$r.c * f.x2 AS u$r").mkString(",\n|    ")
    val crossWs = (1 to LrIters).map(r => s"CROSS JOIN w$r").mkString(" ")
    val ts = (1 to LrIters).map(lrTermSql).mkString(",\n|    ")
    val nf = (2 to LrIters).map(r =>
      s"CASE WHEN t${r - 1} >= 500000 AND t$r < 500000 THEN 1 ELSE 0 END")
      .mkString("\n|      + ")
    val learned = (1 to LrIters).map(r => s"t$r >= 500000")
      .mkString(" OR ")
    s"""WITH $lrChainCtes,
      |scored AS (
      |  SELECT f.y,
      |    $us
      |  FROM f $crossWs),
      |terms AS (
      |  SELECT y,
      |    $ts
      |  FROM scored),
      |doc AS (
      |  SELECT
      |    ($nf) AS nf,
      |    ($learned) AS learned,
      |    t$LrIters AS pfin
      |  FROM terms),
      |cls AS (
      |  SELECT CASE WHEN NOT learned THEN 'never_learned'
      |    WHEN nf = 0 THEN 'unforgettable'
      |    ELSE 'forgettable' END AS class, nf, pfin
      |  FROM doc)
      |SELECT class, CAST(count(*) AS BIGINT) AS n_docs,
      |  floor(1e4 * CAST(sum(nf) AS DOUBLE) / count(*) + 0.5) / 1e4
      |    AS mean_forget_events,
      |  floor(1e4 * CAST(sum(pfin) AS DOUBLE) / (1e6 * count(*))
      |    + 0.5) / 1e4 AS mean_final_prob
      |FROM cls GROUP BY class ORDER BY class""".stripMargin
  }

  /** q362's oracle: same two top-20s, same ≤20-element pair list, the
    * identical fixed 20-term weight tree (weights printed from the
    * SAME Scala doubles the engine lits). */
  private def rboSql: String = {
    def xAt(d: Int): String =
      s"len(list_filter(prs, p -> p.ra <= $d AND p.rb <= $d))"
    val terms = (1 to RboDepth).map(d =>
      s"${RboW(d - 1)} * CAST(${xAt(d)} AS DOUBLE) / ${d.toDouble}")
      .mkString("\n|      + ")
    s"""WITH docs AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT)
      |      AS ntok
      |  FROM documents),
      |ta AS (
      |  SELECT doc_id, CAST(rk AS BIGINT) AS ra FROM (
      |    SELECT doc_id, row_number() OVER (
      |      ORDER BY n_chars DESC, doc_id) AS rk FROM docs)
      |  WHERE rk <= $RboDepth),
      |tb AS (
      |  SELECT doc_id, CAST(rk AS BIGINT) AS rb FROM (
      |    SELECT doc_id, row_number() OVER (
      |      ORDER BY ntok DESC, doc_id) AS rk FROM docs)
      |  WHERE rk <= $RboDepth),
      |cm AS (SELECT ra, rb FROM ta JOIN tb USING (doc_id)),
      |arr AS (
      |  SELECT coalesce(list({'ra': ra, 'rb': rb}),
      |    []::STRUCT(ra BIGINT, rb BIGINT)[]) AS prs
      |  FROM cm)
      |SELECT
      |  CAST(${xAt(5)} AS BIGINT) AS overlap_5,
      |  CAST(${xAt(10)} AS BIGINT) AS overlap_10,
      |  CAST(${xAt(RboDepth)} AS BIGINT) AS overlap_20,
      |  round(($terms) * ${1.0 - RboP}, 4) + 0.0 AS rbo
      |FROM arr""".stripMargin
  }

  override def oracleSql: Map[String, String] = Map(
    "q362_rbo" -> rboSql,
    "q364_el2n_pruning" -> el2nSql,
    "q365_forgetting" -> forgettingSql,
    "q366_self_influence" -> selfInfluenceSql,
    // q354: ntile replays identically (both engines deal the first
    // n mod 10 deciles the extra row); per-cell means quantize to
    // 1e-6 longs before the cross-source average
    "q354_quantile_norm" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    ntile(10) OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS decile
        |  FROM documents),
        |per AS (
        |  SELECT source, CAST(decile AS BIGINT) AS decile,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(floor(CAST(sum(n_chars) AS DOUBLE) * 1e6 / count(*)
        |      + 0.5) AS BIGINT) AS mean_mc
        |  FROM d GROUP BY source, decile),
        |ref AS (
        |  SELECT decile,
        |    CAST(floor(CAST(sum(mean_mc) AS DOUBLE) / count(*) + 0.5)
        |      AS BIGINT) AS ref_mc
        |  FROM per GROUP BY decile)
        |SELECT source, decile, n,
        |  round(mean_mc / 1e6, 4) + 0.0 AS raw_mean,
        |  round(ref_mc / 1e6, 4) + 0.0 AS norm_value
        |FROM per JOIN ref USING (decile)
        |ORDER BY source, decile""".stripMargin,
    // q356: the unrolled IRLS replay
    "q356_huber_irls" -> huberIrlsSql,
    // q357: md5 bucket/sign replayed verbatim; % and pmod agree on
    // non-negative operands
    "q357_feature_hashing" ->
      """WITH t AS (
        |  SELECT unnest(str_split(text, ' ')) AS term FROM documents),
        |h AS (
        |  SELECT term,
        |    ('0x' || substr(md5('fh:' || term), 1, 6))::BIGINT % 64
        |      AS bucket,
        |    CASE WHEN substr(md5('fh:' || term), 7, 1) IN
        |      ('0', '1', '2', '3', '4', '5', '6', '7')
        |    THEN 1 ELSE -1 END AS sign
        |  FROM t WHERE term <> '')
        |SELECT bucket, CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(sign) AS BIGINT) AS signed_sum
        |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q317_adaboost_stumps" -> adaboostSql,
    "q324_sparse_logreg" -> sparseLogregSql,
    "q329_curriculum_schedule" -> {
      val stop16 = Stop16.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_words,
        |    str_split(text, ' ') AS tk, text
        |  FROM documents),
        |z AS (
        |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_toks,
        |    $Wb + $Wl * ln(1.0 + n_words)
        |      + $Ww * (list_sum(list_transform(tk,
        |          x -> CAST(length(x) AS DOUBLE))) / n_words)
        |      + $Ws * (CAST(len(list_filter(tk, x -> x IN $stop16))
        |          AS DOUBLE) / n_words)
        |      + $Wu * coalesce(
        |          CAST(length(text) - length(regexp_replace(text,
        |            '[A-Z]', '', 'g')) AS DOUBLE)
        |            / nullif(length(text), 0), 0.0) AS z
        |  FROM f),
        |hist AS (
        |  SELECT round(1.0 / (1.0 + exp(-z)), 4) AS score,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM z GROUP BY 1),
        |h2 AS (
        |  SELECT *,
        |    CAST(round(1e4 * score) AS BIGINT) * n_docs AS score_i4,
        |    CAST(sum(n_tokens) OVER (ORDER BY score DESC) AS BIGINT)
        |      AS cum
        |  FROM hist),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM hist),
        |st AS (
        |  SELECT CAST(least(
        |      floor((cum - n_tokens) * 3 / t.tt) + 1, 3) AS INTEGER)
        |      AS stage,
        |    n_docs, n_tokens, score_i4
        |  FROM h2 CROSS JOIN t)
        |SELECT stage, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  floor(CAST(sum(n_tokens) AS DOUBLE) / t.tt * 1e4 + 0.5) / 1e4
        |    AS token_frac,
        |  floor(CAST(sum(score_i4) AS DOUBLE) / sum(n_docs) + 0.5) / 1e4
        |    AS mean_score
        |FROM st CROSS JOIN t
        |GROUP BY stage, t.tt ORDER BY stage""".stripMargin
    },
    "q322_self_bleu" ->
      s"""WITH sample AS (
        |  SELECT doc_id,
        |    list_filter(str_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents
        |  WHERE len(list_filter(str_split(text, ' '), x -> x <> '')) >= 2
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT $SelfBleuK),
        |uni AS (
        |  SELECT doc_id, u.t AS t, CAST(count(*) AS BIGINT) AS c
        |  FROM sample, unnest(tk) u(t) GROUP BY doc_id, u.t),
        |big AS (
        |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS t,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM sample, unnest(range(1, len(tk))) v(i) GROUP BY 1, 2),
        |us AS (
        |  SELECT uni.t, s.m1,
        |    CAST(sum(CASE WHEN c = m1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_at_max,
        |    max(CASE WHEN c < m1 THEN c END) AS m2
        |  FROM uni JOIN (SELECT t, max(c) AS m1 FROM uni GROUP BY t) s
        |    ON uni.t = s.t
        |  GROUP BY uni.t, s.m1),
        |bs AS (
        |  SELECT big.t, s.m1,
        |    CAST(sum(CASE WHEN c = m1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_at_max,
        |    max(CASE WHEN c < m1 THEN c END) AS m2
        |  FROM big JOIN (SELECT t, max(c) AS m1 FROM big GROUP BY t) s
        |    ON big.t = s.t
        |  GROUP BY big.t, s.m1),
        |uc AS (
        |  SELECT doc_id, CAST(sum(least(c,
        |    CASE WHEN c = m1 AND n_at_max = 1 THEN coalesce(m2, 0)
        |      ELSE m1 END)) AS BIGINT) AS clip1
        |  FROM uni JOIN us ON uni.t = us.t GROUP BY doc_id),
        |bc AS (
        |  SELECT doc_id, CAST(sum(least(c,
        |    CASE WHEN c = m1 AND n_at_max = 1 THEN coalesce(m2, 0)
        |      ELSE m1 END)) AS BIGINT) AS clip2
        |  FROM big JOIN bs ON big.t = bs.t GROUP BY doc_id),
        |lens AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS len1,
        |    CAST(len(tk) - 1 AS BIGINT) AS len2
        |  FROM sample)
        |SELECT l.doc_id, l.len1,
        |  floor(1e4 * coalesce(uc.clip1, 0) / l.len1 + 0.5) / 1e4 AS p1,
        |  floor(1e4 * coalesce(bc.clip2, 0) / l.len2 + 0.5) / 1e4 AS p2,
        |  floor(1e4 * sqrt((coalesce(uc.clip1, 0) / l.len1)
        |    * (coalesce(bc.clip2, 0) / l.len2)) + 0.5) / 1e4
        |    AS self_bleu2
        |FROM lens l
        |LEFT JOIN uc ON l.doc_id = uc.doc_id
        |LEFT JOIN bc ON l.doc_id = bc.doc_id
        |ORDER BY l.doc_id""".stripMargin,
    "q323_gradient_noise" -> {
      val (w0, w1, w2) = GnsW
      s"""WITH f AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    n_chars / 1000.0 AS x1,
        |    len(str_split(text, ' ')) / 100.0 AS x2
        |  FROM documents),
        |ud AS (
        |  SELECT y, x1, x2, $w0 + $w1 * x1 + $w2 * x2 AS u FROM f),
        |dd AS (
        |  SELECT y - (0.5 + u / (2.0 * (1.0 + abs(u)))) AS d, x1, x2
        |  FROM ud),
        |g AS (
        |  SELECT CAST(floor(1e6 * d + 0.5) AS HUGEINT) AS g0,
        |    CAST(floor(1e6 * d * x1 + 0.5) AS HUGEINT) AS g1,
        |    CAST(floor(1e6 * d * x2 + 0.5) AS HUGEINT) AS g2
        |  FROM dd),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(g0) AS s0, sum(g1) AS s1, sum(g2) AS s2,
        |    sum(g0 * g0) AS q0, sum(g1 * g1) AS q1, sum(g2 * g2) AS q2
        |  FROM g),
        |e AS (
        |  SELECT n,
        |    CAST(s0 AS DOUBLE) / n / 1e6 AS m0,
        |    CAST(s1 AS DOUBLE) / n / 1e6 AS m1,
        |    CAST(s2 AS DOUBLE) / n / 1e6 AS m2,
        |    CAST(q0 AS DOUBLE) / n / 1e12 AS e0,
        |    CAST(q1 AS DOUBLE) / n / 1e12 AS e1,
        |    CAST(q2 AS DOUBLE) / n / 1e12 AS e2
        |  FROM agg)
        |SELECT n,
        |  floor(m0 * 1e6 + 0.5) / 1e6 AS g_bias,
        |  floor(m1 * 1e6 + 0.5) / 1e6 AS g_x1,
        |  floor(m2 * 1e6 + 0.5) / 1e6 AS g_x2,
        |  floor(((e0 - m0 * m0) + (e1 - m1 * m1) + (e2 - m2 * m2))
        |    * 1e6 + 0.5) / 1e6 AS trace_cov,
        |  floor((m0 * m0 + m1 * m1 + m2 * m2) * 1e6 + 0.5) / 1e6
        |    AS gnorm2,
        |  floor(((e0 - m0 * m0) + (e1 - m1 * m1) + (e2 - m2 * m2))
        |    / (m0 * m0 + m1 * m1 + m2 * m2) * 1e4 + 0.5) / 1e4
        |    AS b_simple
        |FROM e""".stripMargin
    },
    // q316: the LCS DP replayed ONE CELL per recursive step, every
    // pair advancing in lockstep; prev[k] = dp[i-1][k-1], cur grows
    // left-to-right, rows roll when j wraps — cell-for-cell the
    // engine's nested fold
    "q316_rouge_pairs" ->
      s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, str_split(text, ' ') AS rawtk,
        |    list_filter(str_split(text, ' '), x -> x <> '')[1:$RougeMaxTok]
        |      AS tk
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, rawtk AS tk0,
        |    unnest(range(1, len(rawtk) - 1)) AS i
        |  FROM t),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list(tk0[i] || ' ' || tk0[i+1] || ' '
        |      || tk0[i+2])) AS sh
        |  FROM idx GROUP BY doc_id),
        |bb AS (
        |  SELECT doc_id, list_aggregate(sh, 'min') AS blk,
        |    count(*) OVER (PARTITION BY list_aggregate(sh, 'min'))
        |      AS blk_n
        |  FROM sh WHERE len(sh) > 0),
        |fd AS (SELECT doc_id, blk FROM bb WHERE blk_n <= $BleuMaxBlock),
        |pt AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, ta.tk AS ta, tb.tk AS tb
        |  FROM fd x JOIN fd y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |  JOIN t ta ON ta.doc_id = x.doc_id
        |  JOIN t tb ON tb.doc_id = y.doc_id
        |  WHERE len(ta.tk) > 0 AND len(tb.tk) > 0),
        |rec AS (
        |  SELECT a, b, ta, tb, CAST(1 AS BIGINT) AS i,
        |    CAST(0 AS BIGINT) AS j,
        |    list_transform(range(1, len(tb) + 2),
        |      x -> CAST(0 AS BIGINT)) AS prev,
        |    [CAST(0 AS BIGINT)] AS cur
        |  FROM pt
        |  UNION ALL
        |  SELECT a, b, ta, tb,
        |    CASE WHEN j + 1 = len(tb) THEN i + 1 ELSE i END,
        |    CASE WHEN j + 1 = len(tb) THEN 0 ELSE j + 1 END,
        |    CASE WHEN j + 1 = len(tb) THEN list_append(cur, v)
        |      ELSE prev END,
        |    CASE WHEN j + 1 = len(tb) THEN [CAST(0 AS BIGINT)]
        |      ELSE list_append(cur, v) END
        |  FROM (
        |    SELECT *,
        |      CASE WHEN tb[j + 1] = ta[i] THEN prev[j + 1] + 1
        |        ELSE greatest(prev[j + 2], cur[len(cur)]) END AS v
        |    FROM rec WHERE i <= len(ta))),
        |fin AS (
        |  SELECT a, b, CAST(len(ta) AS BIGINT) AS len_ref,
        |    CAST(len(tb) AS BIGINT) AS len_cand,
        |    prev[len(tb) + 1] AS lcs
        |  FROM rec WHERE i = len(ta) + 1)
        |SELECT a, b, len_ref, len_cand, lcs,
        |  floor(1e4 * lcs / len_ref + 0.5) / 1e4 AS rouge_r,
        |  floor(1e4 * lcs / len_cand + 0.5) / 1e4 AS rouge_p,
        |  CASE WHEN lcs = 0 THEN 0.0 ELSE
        |    floor(1e4 * 2.0 * (lcs / len_ref) * (lcs / len_cand)
        |      / (lcs / len_ref + lcs / len_cand) + 0.5) / 1e4
        |  END AS rouge_f1
        |FROM fin ORDER BY a, b""".stripMargin,
    "q308_naive_bayes" ->
      """WITH docs AS (
        |  SELECT doc_id, lang,
        |    list_filter(str_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |dt AS (SELECT doc_id, lang, unnest(tk) AS t FROM docs),
        |ct AS (
        |  SELECT lang AS c, t, CAST(count(*) AS BIGINT) AS ctc
        |  FROM dt GROUP BY 1, 2),
        |ctot AS (SELECT c, CAST(sum(ctc) AS BIGINT) AS nc FROM ct GROUP BY c),
        |vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM dt),
        |priors AS (
        |  SELECT lang AS c, CAST(count(*) AS BIGINT) AS ndc
        |  FROM docs GROUP BY lang),
        |ndocs AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM docs),
        |vt AS (SELECT DISTINCT t FROM dt),
        |probs AS (
        |  SELECT ctot.c, vt.t,
        |    ln(CAST(coalesce(ct.ctc, 0) + 1 AS DOUBLE)
        |      / (ctot.nc + vocab.v)) AS lp
        |  FROM vt CROSS JOIN ctot
        |  LEFT JOIN ct ON ct.c = ctot.c AND ct.t = vt.t
        |  CROSS JOIN vocab),
        |dtc AS (
        |  SELECT doc_id, lang, t, CAST(count(*) AS BIGINT) AS cdt
        |  FROM dt GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT dtc.doc_id, dtc.lang, p.c, sum(dtc.cdt * p.lp) AS ll
        |  FROM dtc JOIN probs p ON dtc.t = p.t
        |  GROUP BY 1, 2, 3),
        |sc2 AS (
        |  SELECT sc.doc_id, sc.lang, sc.c,
        |    sc.ll + ln(CAST(pr.ndc AS DOUBLE) / nd.nd) AS score
        |  FROM sc JOIN priors pr ON sc.c = pr.c CROSS JOIN ndocs nd),
        |pred AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, c ASC) AS rn
        |  FROM sc2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  floor(1e4 * count(*) / nd.nd + 0.5) / 1e4 AS prior,
        |  floor(1e4 * sum(CASE WHEN c = lang THEN 1 ELSE 0 END)
        |    / count(*) + 0.5) / 1e4 AS recall
        |FROM pred CROSS JOIN ndocs nd
        |WHERE rn = 1
        |GROUP BY lang, nd.nd ORDER BY lang""".stripMargin,
    // q309: unrolled pinball-GD rounds; every float literal is forced
    // to DOUBLE so both engines run identical IEEE trees (0.7 as a
    // DECIMAL would round differently than the double 0.7).
    "q309_quantile_reg" -> {
      val tau = s"CAST($QrTau AS DOUBLE)"
      def rd(p: String, c: String): String =
        s"""g$c AS (
          |  SELECT
          |    sum(floor(1e6 * (CASE WHEN f.y < w.a + w.b * f.x
          |      THEN $tau - 1.0 ELSE $tau END) + 0.5)) AS ga,
          |    sum(floor(1e6 * (CASE WHEN f.y < w.a + w.b * f.x
          |      THEN $tau - 1.0 ELSE $tau END) * f.x + 0.5)) AS gb
          |  FROM f CROSS JOIN w$p w),
          |w$c AS (
          |  SELECT
          |    floor((w.a + $QrRate * g$c.ga / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS a,
          |    floor((w.b + $QrRate * g$c.gb / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS b
          |  FROM w$p w CROSS JOIN g$c CROSS JOIN nn)""".stripMargin
      val rounds = (1 to QrIters)
        .map(i => rd((i - 1).toString, i.toString)).mkString(",\n")
      s"""WITH f AS (
        |  SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS y,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS x
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b),
        |$rounds,
        |loss AS (
        |  SELECT sum(floor(1e6 * (CASE WHEN f.y >= w.a + w.b * f.x
        |    THEN $tau * (f.y - (w.a + w.b * f.x))
        |    ELSE ($tau - 1.0) * (f.y - (w.a + w.b * f.x)) END)
        |    + 0.5)) AS pl
        |  FROM f CROSS JOIN w$QrIters w)
        |SELECT w$QrIters.a AS w0, w$QrIters.b AS w1, nn.n,
        |  floor(1e4 * (loss.pl / (1e6 * nn.n)) + 0.5) / 1e4 AS pinball
        |FROM w$QrIters CROSS JOIN loss CROSS JOIN nn""".stripMargin
    },
    // q310: the q299-style unrolled trajectory on the train split,
    // per-round mean validation gradients, then the 8-term TracIn dot
    // product per train doc — the same expression tree the engine
    // evaluates in-row.
    "q310_tracin_influence" -> {
      def sig(u: String) = s"(0.5 + $u / (2.0 * (1.0 + abs($u))))"
      def rd(p: String, c: String): String = {
        val u = s"w.a + w.b * f.x1 + w.c * f.x2"
        val d = s"(f.y - ${sig(s"($u)")})"
        s"""gvs$c AS (
          |  SELECT
          |    sum(floor(1e6 * $d + 0.5)) AS sa,
          |    sum(floor(1e6 * $d * f.x1 + 0.5)) AS sb,
          |    sum(floor(1e6 * $d * f.x2 + 0.5)) AS sc
          |  FROM va f CROSS JOIN w$p w),
          |gv$c AS (
          |  SELECT gvs$c.sa / (1e6 * nv.nv) AS vga,
          |    gvs$c.sb / (1e6 * nv.nv) AS vgb,
          |    gvs$c.sc / (1e6 * nv.nv) AS vgc
          |  FROM gvs$c CROSS JOIN nv),
          |g$c AS (
          |  SELECT
          |    sum(floor(1e6 * $d + 0.5)) AS ga,
          |    sum(floor(1e6 * $d * f.x1 + 0.5)) AS gb,
          |    sum(floor(1e6 * $d * f.x2 + 0.5)) AS gc
          |  FROM tr f CROSS JOIN w$p w),
          |w$c AS (
          |  SELECT
          |    floor((w.a + $TiRate * g$c.ga / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS a,
          |    floor((w.b + $TiRate * g$c.gb / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS b,
          |    floor((w.c + $TiRate * g$c.gc / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS c
          |  FROM w$p w CROSS JOIN g$c CROSS JOIN nn)""".stripMargin
      }
      val rounds = (1 to TiIters)
        .map(i => rd((i - 1).toString, i.toString)).mkString(",\n")
      val terms = (1 to TiIters).map { r =>
        val u = s"(w${r - 1}.a + w${r - 1}.b * tr.x1 + w${r - 1}.c * tr.x2)"
        s"""($TiRate * (tr.y - ${sig(u)})
           | * (gv$r.vga + tr.x1 * gv$r.vgb + tr.x2 * gv$r.vgc))"""
          .stripMargin
      }.mkString("\n + ")
      val crosses = (0 until TiIters).map(r => s"CROSS JOIN w$r")
        .mkString(" ") + " " +
        (1 to TiIters).map(r => s"CROSS JOIN gv$r").mkString(" ")
      s"""WITH f0 AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
        |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS x2,
        |    doc_id % 5 = 0 AS isval
        |  FROM documents),
        |tr AS (SELECT * FROM f0 WHERE NOT isval),
        |va AS (SELECT * FROM f0 WHERE isval),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM va),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b,
        |  CAST(0 AS DOUBLE) AS c),
        |$rounds,
        |infl AS (
        |  SELECT tr.doc_id,
        |    floor(($terms) * 1e6 + 0.5) / 1e6 AS infl
        |  FROM tr $crosses),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY infl DESC, doc_id ASC)
        |    AS pos
        |  FROM infl)
        |SELECT pos, doc_id, infl FROM ranked
        |WHERE pos <= 10 ORDER BY pos""".stripMargin
    },
    "q303_isotonic_pav" ->
      s"""WITH base AS (
        |  SELECT n_chars // $IsoBinWidth AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |bins AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS cy
        |  FROM base GROUP BY bin),
        |a AS (
        |  SELECT bi.bin AS i, bj.bin AS j,
        |    CAST(sum(bm.cy) AS DOUBLE) / sum(bm.n) AS aij
        |  FROM bins bi JOIN bins bj ON bi.bin <= bj.bin
        |  JOIN bins bm ON bm.bin >= bi.bin AND bm.bin <= bj.bin
        |  GROUP BY bi.bin, bj.bin),
        |t AS (
        |  SELECT bb.bin AS b, a.i, min(a.aij) AS mn
        |  FROM a JOIN bins bb ON a.i <= bb.bin AND a.j >= bb.bin
        |  GROUP BY bb.bin, a.i),
        |iso AS (SELECT b, max(mn) AS iso FROM t GROUP BY b)
        |SELECT bins.bin, bins.n,
        |  floor(1e4 * bins.cy / bins.n + 0.5) / 1e4 AS rate,
        |  floor(iso.iso * 1e4 + 0.5) / 1e4 AS iso
        |FROM bins JOIN iso ON bins.bin = iso.b
        |ORDER BY bins.bin""".stripMargin,
    "q305_bleu_pairs" ->
      s"""WITH t AS (
        |  SELECT doc_id, str_split(text, ' ') AS rawtk,
        |    list_filter(str_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, rawtk AS tk0, unnest(range(1, len(rawtk) - 1)) AS i
        |  FROM t),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list(tk0[i] || ' ' || tk0[i+1] || ' ' || tk0[i+2]))
        |      AS sh
        |  FROM idx GROUP BY doc_id),
        |bb AS (
        |  SELECT doc_id, list_aggregate(sh, 'min') AS blk,
        |    count(*) OVER (PARTITION BY list_aggregate(sh, 'min')) AS blk_n
        |  FROM sh WHERE len(sh) > 0),
        |fd AS (SELECT doc_id, blk FROM bb WHERE blk_n <= $BleuMaxBlock),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM fd x JOIN fd y ON x.blk = y.blk AND x.doc_id < y.doc_id),
        |uni AS (
        |  SELECT t.doc_id, u.t AS g, count(*) AS c
        |  FROM t, unnest(tk) u(t)
        |  WHERE t.doc_id IN (SELECT doc_id FROM fd)
        |  GROUP BY t.doc_id, u.t),
        |big AS (
        |  SELECT t.doc_id, tk[i] || ' ' || tk[i+1] AS g, count(*) AS c
        |  FROM t, unnest(range(1, len(tk))) v(i)
        |  WHERE t.doc_id IN (SELECT doc_id FROM fd)
        |  GROUP BY t.doc_id, tk[i] || ' ' || tk[i+1]),
        |lens AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS len1,
        |    CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS len2
        |  FROM t),
        |c1 AS (
        |  SELECT p.a, p.b, CAST(sum(least(ua.c, ub.c)) AS BIGINT) AS clip1
        |  FROM pairs p
        |  JOIN uni ua ON ua.doc_id = p.a
        |  JOIN uni ub ON ub.doc_id = p.b AND ub.g = ua.g
        |  GROUP BY p.a, p.b),
        |c2 AS (
        |  SELECT p.a, p.b, CAST(sum(least(ba.c, bb2.c)) AS BIGINT) AS clip2
        |  FROM pairs p
        |  JOIN big ba ON ba.doc_id = p.a
        |  JOIN big bb2 ON bb2.doc_id = p.b AND bb2.g = ba.g
        |  GROUP BY p.a, p.b)
        |SELECT p.a, p.b,
        |  floor(1e4 * coalesce(c1.clip1, 0) / l.len1 + 0.5) / 1e4 AS p1,
        |  floor(1e4 * coalesce(c2.clip2, 0) / l.len2 + 0.5) / 1e4 AS p2,
        |  floor(1e4 * sqrt((coalesce(c1.clip1, 0) / l.len1)
        |    * (coalesce(c2.clip2, 0) / l.len2)) + 0.5) / 1e4 AS bleu2
        |FROM pairs p
        |LEFT JOIN c1 ON p.a = c1.a AND p.b = c1.b
        |LEFT JOIN c2 ON p.a = c2.a AND p.b = c2.b
        |JOIN lens l ON p.b = l.doc_id
        |ORDER BY p.a, p.b""".stripMargin,
    "q306_rrf_fusion" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars AS v1,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS v2,
        |    CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS v3
        |  FROM documents),
        |g1 AS (SELECT v1 AS v, count(*) AS c FROM base GROUP BY v1),
        |r1 AS (
        |  SELECT x.v, 1 + CAST(coalesce(sum(y.c), 0) AS BIGINT) AS rk
        |  FROM g1 x LEFT JOIN g1 y ON y.v > x.v GROUP BY x.v),
        |g2 AS (SELECT v2 AS v, count(*) AS c FROM base GROUP BY v2),
        |r2 AS (
        |  SELECT x.v, 1 + CAST(coalesce(sum(y.c), 0) AS BIGINT) AS rk
        |  FROM g2 x LEFT JOIN g2 y ON y.v > x.v GROUP BY x.v),
        |g3 AS (SELECT v3 AS v, count(*) AS c FROM base GROUP BY v3),
        |r3 AS (
        |  SELECT x.v, 1 + CAST(coalesce(sum(y.c), 0) AS BIGINT) AS rk
        |  FROM g3 x LEFT JOIN g3 y ON y.v > x.v GROUP BY x.v),
        |fused AS (
        |  SELECT b.doc_id, r1.rk AS r1, r2.rk AS r2, r3.rk AS r3,
        |    floor(1e6 * (CAST(1 AS DOUBLE) / (60 + r1.rk)
        |      + CAST(1 AS DOUBLE) / (60 + r2.rk)
        |      + CAST(1 AS DOUBLE) / (60 + r3.rk)) + 0.5) / 1e6 AS rrf
        |  FROM base b
        |  JOIN r1 ON b.v1 = r1.v
        |  JOIN r2 ON b.v2 = r2.v
        |  JOIN r3 ON b.v3 = r3.v),
        |rk AS (
        |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
        |    AS pos
        |  FROM fused)
        |SELECT pos, doc_id, r1, r2, r3, rrf FROM rk
        |WHERE pos <= 20 ORDER BY pos""".stripMargin,
    "q307_stump_split" ->
      """WITH base AS (
        |  SELECT n_chars AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |grid AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS cy
        |  FROM base GROUP BY v),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS nn,
        |    CAST(sum(cy) AS BIGINT) AS yy FROM grid),
        |cum AS (
        |  SELECT v,
        |    CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS ln,
        |    CAST(sum(cy) OVER (ORDER BY v) AS BIGINT) AS ly
        |  FROM grid),
        |cand AS (
        |  SELECT cum.v, cum.ln, cum.ly, tot.nn, tot.yy,
        |    (cum.ln - CAST(cum.ly * cum.ly
        |        + (cum.ln - cum.ly) * (cum.ln - cum.ly) AS DOUBLE)
        |      / cum.ln)
        |    + ((tot.nn - cum.ln)
        |      - CAST((tot.yy - cum.ly) * (tot.yy - cum.ly)
        |          + ((tot.nn - cum.ln) - (tot.yy - cum.ly))
        |            * ((tot.nn - cum.ln) - (tot.yy - cum.ly)) AS DOUBLE)
        |        / (tot.nn - cum.ln)) AS gsum
        |  FROM cum CROSS JOIN tot WHERE cum.ln < tot.nn),
        |best AS (
        |  SELECT *, row_number() OVER (ORDER BY gsum ASC, v ASC) AS rn
        |  FROM cand)
        |SELECT v AS threshold, ln AS n_left, ly AS y_left,
        |  nn - ln AS n_right, yy - ly AS y_right,
        |  floor(1e4 * ((1.0 - CAST(yy * yy + (nn - yy) * (nn - yy)
        |      AS DOUBLE) / (nn * nn)) - gsum / nn) + 0.5) / 1e4
        |    AS gini_gain,
        |  floor(1e4 * CAST(greatest(ly, ln - ly)
        |    + greatest(yy - ly, (nn - ln) - (yy - ly)) AS DOUBLE)
        |    / nn + 0.5) / 1e4 AS stump_acc
        |FROM best WHERE rn <= 1""".stripMargin,
    // q299: the same 8 rounds unrolled as CTEs — rational sigmoid,
    // 1e-6-grid gradient quantization (exact double sums), 1e-9-grid
    // weight snap; every float op is the identical IEEE tree.
    // q338: q299's trajectory CTEs, every round's weights kept; the
    // per-doc round probabilities quantize to micro-longs so Σp / Σp²
    // and the region compare are exact integers (engine code's form)
    "q338_cartography" -> {
      def rd(p: String, c: String): String =
        s"""g$c AS (
          |  SELECT
          |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
          |      + 0.5)) AS ga,
          |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
          |      * x1 + 0.5)) AS gb,
          |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
          |      * x2 + 0.5)) AS gc
          |  FROM (SELECT f.y, f.x1, f.x2,
          |      w$p.a + w$p.b * f.x1 + w$p.c * f.x2 AS u
          |    FROM f CROSS JOIN w$p)),
          |w$c AS (
          |  SELECT
          |    floor((w$p.a + $LrRate * g$c.ga / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS a,
          |    floor((w$p.b + $LrRate * g$c.gb / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS b,
          |    floor((w$p.c + $LrRate * g$c.gc / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS c
          |  FROM w$p CROSS JOIN g$c CROSS JOIN nn)""".stripMargin
      val rounds = (1 to LrIters)
        .map(i => rd((i - 1).toString, i.toString)).mkString(",\n")
      val crossWs = (1 to LrIters).map(r => s"CROSS JOIN w$r").mkString(" ")
      val us = (1 to LrIters).map(r =>
        s"w$r.a + w$r.b * f.x1 + w$r.c * f.x2 AS u$r").mkString(",\n|    ")
      val ts = (1 to LrIters).map(r =>
        s"""CAST(floor(1e6 * (CASE WHEN y = 1.0
           |      THEN (0.5 + u$r / (2.0 * (1.0 + abs(u$r))))
           |      ELSE 1.0 - (0.5 + u$r / (2.0 * (1.0 + abs(u$r)))) END)
           |      + 0.5) AS BIGINT) AS t$r""".stripMargin)
        .mkString(",\n|    ")
      val spSum = (1 to LrIters).map(r => s"t$r").mkString(" + ")
      val sqSum = (1 to LrIters).map(r => s"t$r * t$r").mkString(" + ")
      s"""WITH f AS (
        |  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE)
        |      AS y,
        |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS x2
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b,
        |  CAST(0 AS DOUBLE) AS c),
        |$rounds,
        |scored AS (
        |  SELECT f.y,
        |    $us
        |  FROM f $crossWs),
        |terms AS (
        |  SELECT
        |    $ts
        |  FROM scored),
        |doc AS (
        |  SELECT ($spSum) AS sp, ($sqSum) AS sq FROM terms),
        |reg AS (
        |  SELECT sp, $LrIters * sq - sp * sp AS vn,
        |    CASE WHEN sp >= $CartoHiMicro THEN 'easy'
        |      WHEN sp <= $CartoLoMicro THEN 'hard'
        |      ELSE 'ambiguous' END AS region
        |  FROM doc)
        |SELECT region, CAST(count(*) AS BIGINT) AS n_docs,
        |  floor(1e4 * (CAST(sum(sp) AS DOUBLE)
        |    / (${LrIters}000000.0 * count(*))) + 0.5) / 1e4 AS mean_conf,
        |  floor(1e6 * (CAST(sum(vn) AS DOUBLE)
        |    / (${LrIters.toLong * LrIters}000000000000.0 * count(*)))
        |    + 0.5) / 1e6 AS mean_var
        |FROM reg GROUP BY region ORDER BY region""".stripMargin
    },
    "q299_logreg_gd" -> {
      def rd(p: String, c: String): String =
        s"""g$c AS (
          |  SELECT
          |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
          |      + 0.5)) AS ga,
          |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
          |      * x1 + 0.5)) AS gb,
          |    sum(floor(1e6 * (y - (0.5 + u / (2.0 * (1.0 + abs(u)))))
          |      * x2 + 0.5)) AS gc
          |  FROM (SELECT f.y, f.x1, f.x2,
          |      w$p.a + w$p.b * f.x1 + w$p.c * f.x2 AS u
          |    FROM f CROSS JOIN w$p)),
          |w$c AS (
          |  SELECT
          |    floor((w$p.a + $LrRate * g$c.ga / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS a,
          |    floor((w$p.b + $LrRate * g$c.gb / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS b,
          |    floor((w$p.c + $LrRate * g$c.gc / (1e6 * nn.n)) * 1e9
          |      + 0.5) / 1e9 AS c
          |  FROM w$p CROSS JOIN g$c CROSS JOIN nn)""".stripMargin
      val rounds = (1 to LrIters)
        .map(i => rd((i - 1).toString, i.toString)).mkString(",\n")
      s"""WITH f AS (
        |  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
        |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS x2
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b,
        |  CAST(0 AS DOUBLE) AS c),
        |$rounds,
        |acc AS (
        |  SELECT CAST(sum(CASE WHEN (u >= 0) = (y = 1.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |  FROM (SELECT f.y,
        |      w$LrIters.a + w$LrIters.b * f.x1 + w$LrIters.c * f.x2 AS u
        |    FROM f CROSS JOIN w$LrIters))
        |SELECT w$LrIters.a AS w0, w$LrIters.b AS w1, w$LrIters.c AS w2,
        |  nn.n, floor(1e4 * acc.n_correct / nn.n + 0.5) / 1e4 AS train_acc
        |FROM w$LrIters CROSS JOIN acc CROSS JOIN nn""".stripMargin
    },
    "q296_good_turing" ->
      """WITH toks AS (
        |  SELECT unnest(str_split(text, ' ')) AS t FROM documents),
        |counts AS (
        |  SELECT t, count(*) AS r FROM toks WHERE t <> '' GROUP BY t),
        |nr AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM counts GROUP BY r),
        |grid AS (SELECT unnest(range(1, 11)) AS r)
        |SELECT g.r, coalesce(nr.n_r, 0) AS n_r,
        |  round((g.r + 1) * CAST(coalesce(nr1.n_r, 0) AS DOUBLE) / nr.n_r,
        |    4) AS r_star
        |FROM grid g
        |LEFT JOIN nr ON g.r = nr.r
        |LEFT JOIN nr nr1 ON g.r + 1 = nr1.r
        |ORDER BY g.r""".stripMargin,
    "q228_ppmi_sim" ->
      """WITH t AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
        |idx AS (
        |  SELECT doc_id, tk, unnest(range(2, len(tk) + 1)) AS i FROM t),
        |bi AS (
        |  SELECT tk[i - 1] AS prev, tk[i] AS term FROM idx
        |  WHERE tk[i - 1] <> tk[i]),
        |pc AS (
        |  SELECT w, c, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT prev AS w, term AS c FROM bi
        |    UNION ALL SELECT term, prev FROM bi)
        |  GROUP BY w, c HAVING count(*) >= 3),
        |wm AS (SELECT w, CAST(sum(n) AS BIGINT) AS cw FROM pc GROUP BY w),
        |cm AS (SELECT c, CAST(sum(n) AS BIGINT) AS cc FROM pc GROUP BY c),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM pc),
        |ppmi AS (
        |  SELECT pc.w, pc.c,
        |    greatest(0.0, ln((CAST(pc.n AS DOUBLE) * tot.t)
        |      / (CAST(wm.cw AS DOUBLE) * cm.cc))) AS p
        |  FROM pc JOIN wm USING (w) JOIN cm USING (c) CROSS JOIN tot),
        |pp AS (SELECT * FROM ppmi WHERE p > 0),
        |norms AS (SELECT w, sum(p * p) AS n2 FROM pp GROUP BY w),
        |sims AS (
        |  SELECT x.w AS wa, y.w AS wb, sum(x.p * y.p) AS dotp
        |  FROM pp x JOIN pp y ON x.c = y.c AND x.w < y.w
        |  GROUP BY x.w, y.w),
        |cosed AS (
        |  SELECT sims.wa, sims.wb,
        |    sims.dotp / (sqrt(na.n2) * sqrt(nb.n2)) AS sim
        |  FROM sims
        |  JOIN norms na ON na.w = sims.wa
        |  JOIN norms nb ON nb.w = sims.wb),
        |ranked AS (
        |  SELECT wa, wb, sim, CAST(row_number() OVER (
        |    ORDER BY round(sim, 6) DESC, wa ASC, wb ASC) AS INTEGER)
        |    AS rk
        |  FROM cosed)
        |SELECT rk, wa, wb, round(sim, 4) AS sim
        |FROM ranked WHERE rk <= 15 ORDER BY rk""".stripMargin,
    // q142: decile assignment replayed by counting the source's
    // quantile_cont cutpoints strictly below the score, BOTH rounded to
    // the suite's 4-decimal grid first — raw-double comparison flips a
    // whole decile when the engines' interpolations differ at the ulp.
    "q194_psi_drift" ->
      """WITH d AS (SELECT source, n_chars FROM documents),
        |cuts AS (
        |  SELECT quantile_cont(n_chars,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs
        |  FROM d),
        |binned AS (
        |  SELECT source, len(list_filter(cs, c -> n_chars > c)) + 1 AS bin
        |  FROM d CROSS JOIN cuts),
        |per AS (
        |  SELECT source, bin, CAST(count(*) AS BIGINT) AS n_sb
        |  FROM binned GROUP BY 1, 2),
        |gtot AS (SELECT bin, sum(n_sb) AS n_b FROM per GROUP BY bin),
        |tots AS (SELECT source, sum(n_sb) AS n_s FROM per GROUP BY source),
        |tot AS (SELECT sum(n_b) AS n_tot FROM gtot),
        |grid AS (
        |  SELECT t.source, t.n_s, g.n_b, coalesce(p.n_sb, 0) AS obs, n_tot
        |  FROM tots t
        |  CROSS JOIN (SELECT unnest(range(1, 11)) AS bin) gs
        |  LEFT JOIN per p ON p.source = t.source AND p.bin = gs.bin
        |  JOIN gtot g ON g.bin = gs.bin
        |  CROSS JOIN tot),
        |scored AS (
        |  SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
        |    round(sum(
        |      (((obs + 0.5) / (n_s + 5.0))
        |        - ((n_b - obs + 0.5) / (n_tot - n_s + 5.0)))
        |      * ln(((obs + 0.5) / (n_s + 5.0))
        |        / ((n_b - obs + 0.5) / (n_tot - n_s + 5.0)))), 4) + 0.0
        |      AS psi
        |  FROM grid GROUP BY source)
        |SELECT source, n_docs, psi,
        |  CASE WHEN psi < 0.10 THEN 'stable'
        |       WHEN psi < 0.25 THEN 'moderate'
        |       ELSE 'major_shift' END AS band
        |FROM scored ORDER BY source""".stripMargin,
    "q142_quality_calibrate" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    (1.0 - len(list_filter(str_split(text, ' '),
        |        t -> t IN ${TextOps.stopwordsSqlList}))
        |      / CAST(len(str_split(text, ' ')) AS DOUBLE))
        |    * least(1.0, len(str_split(text, ' ')) / 100.0) AS q
        |  FROM documents),
        |cuts AS (
        |  SELECT source,
        |    quantile_cont(q, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs
        |  FROM t GROUP BY source)
        |SELECT doc_id, t.source, round(q, 4) AS quality,
        |  CAST(len(list_filter(cs, c -> round(q, 4) > round(c, 4)))
        |    AS INTEGER) AS decile,
        |  (len(list_filter(cs, c -> round(q, 4) > round(c, 4))) >= 5)
        |    AS kept
        |FROM t JOIN cuts USING (source) ORDER BY doc_id""".stripMargin,
    "q252_neg_sampling" ->
      """WITH tc AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> '' GROUP BY term),
        |tot AS (SELECT sum(pow(c, 0.75)) AS z FROM tc),
        |cum AS (
        |  SELECT term, c, pow(c, 0.75) / z AS p,
        |    sum(pow(c, 0.75)) OVER (ORDER BY c DESC, term
        |      ROWS UNBOUNDED PRECEDING) / z AS cum_p
        |  FROM tc CROSS JOIN tot),
        |sl AS (
        |  SELECT *,
        |    CAST(floor(cum_p * 1000000) AS BIGINT)
        |      - CAST(floor((cum_p - p) * 1000000) AS BIGINT) AS slots
        |  FROM cum),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY c DESC, term)
        |    AS INTEGER) AS rk
        |  FROM sl)
        |SELECT rk, term, c, round(p, 6) AS p, slots
        |FROM ranked WHERE rk <= 30 ORDER BY rk""".stripMargin,
    "q253_youden" ->
      s"""WITH $labCtesSql,
        |hist AS (
        |  SELECT score, CAST(sum(is_dup) AS BIGINT) AS np,
        |    CAST(sum(1 - is_dup) AS BIGINT) AS nn
        |  FROM lab GROUP BY score),
        |tot AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |    CAST(sum(nn) AS BIGINT) AS n_neg
        |  FROM hist),
        |grid AS (SELECT unnest(range(0, 21)) * 0.05 AS t),
        |agg AS (
        |  SELECT t, CAST(coalesce(sum(np), 0) AS BIGINT) AS tp,
        |    CAST(coalesce(sum(nn), 0) AS BIGINT) AS fp
        |  FROM grid LEFT JOIN hist ON hist.score <= grid.t
        |  GROUP BY t),
        |sc AS (
        |  SELECT t, tp, fp, CAST(tp AS DOUBLE) / n_pos AS tpr,
        |    CAST(fp AS DOUBLE) / n_neg AS fpr
        |  FROM agg CROSS JOIN tot),
        |best AS (
        |  SELECT max(round(tpr - fpr, 4) + 0.0) AS best_j FROM sc)
        |SELECT round(t, 2) AS t, tp, fp, round(tpr, 4) AS tpr,
        |  round(fpr, 4) AS fpr,
        |  round(tpr - fpr, 4) + 0.0 AS youden_j,
        |  coalesce((round(tpr - fpr, 4) + 0.0) = best_j, FALSE) AS selected
        |FROM sc CROSS JOIN best ORDER BY t""".stripMargin,
    "q247_prf_expansion" -> {
      val qTerms = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
      s"""WITH toks0 AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks0 GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tfq AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks0
        |  WHERE term IN $qTerms
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tfq GROUP BY term),
        |cq AS (
        |  SELECT tfq.doc_id, tfq.term,
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |      (tf * 2.2::DOUBLE) /
        |      (tf + 1.2::DOUBLE * (0.25 + 0.75 * dl / avgdl)) AS c
        |  FROM tfq JOIN dfreq USING (term) JOIN dl USING (doc_id)
        |  CROSS JOIN stats),
        |sc AS (
        |  SELECT doc_id,
        |    coalesce(max(CASE WHEN term = 'spark'  THEN c END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'window' THEN c END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'merge'  THEN c END), 0.0)
        |      AS score
        |  FROM cq GROUP BY doc_id),
        |topd AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY score DESC,
        |      doc_id) AS rk FROM sc)
        |  WHERE rk <= 10),
        |toks AS (SELECT doc_id, term FROM toks0 WHERE term <> ''),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |dfall AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM toks)
        |  GROUP BY term),
        |rel AS (
        |  SELECT t.term, CAST(count(*) AS BIGINT) AS tf_rel,
        |    CAST(count(DISTINCT t.doc_id) AS BIGINT) AS df_rel
        |  FROM toks t JOIN topd USING (doc_id)
        |  WHERE t.term NOT IN $qTerms
        |    AND t.term NOT IN ${TextOps.stopwordsSqlList}
        |  GROUP BY t.term),
        |scored AS (
        |  SELECT rel.term, tf_rel, df_rel, dfall.df,
        |    tf_rel * (ln((nd.n + 1.0) / (dfall.df + 1.0)) + 1.0)
        |      AS score
        |  FROM rel JOIN dfall USING (term) CROSS JOIN nd),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    ORDER BY round(score, 6) DESC, term ASC) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT rk, term, tf_rel, df_rel, df, round(score, 4) AS score
        |FROM ranked WHERE rk <= 8 ORDER BY rk""".stripMargin
    },
    "q125_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'window', 'merge')
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |c AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |      (tf * 2.2::DOUBLE) /
        |      (tf + 1.2::DOUBLE * (0.25 + 0.75 * dl / avgdl)) AS c
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
        |  CROSS JOIN stats),
        |sc AS (
        |  SELECT doc_id,
        |    coalesce(max(CASE WHEN term = 'spark'  THEN c END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'window' THEN c END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'merge'  THEN c END), 0.0)
        |      AS score
        |  FROM c GROUP BY doc_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM sc)
        |SELECT rk, doc_id, round(score, 4) AS score
        |FROM ranked WHERE rk <= 10 ORDER BY rk""".stripMargin,
    "q104_dsir_weights" ->
      s"""$dsirOracleCtes
        |SELECT doc_id, n_grams, dsir_logw
        |FROM weights ORDER BY doc_id""".stripMargin,
    "q282_jm_interpolation" -> {
      def em(t: Int): String =
        s"""l$t AS (
          |  SELECT round(sum(m * (l * pb) / (l * pb + (1 - l) * pu))
          |    / sum(m), 9) AS l
          |  FROM hob CROSS JOIN l${t - 1}),
          |n$t AS (
          |  SELECT round(sum(-ln(l * pb + (1 - l) * pu) * m) / sum(m), 4)
          |    AS nll
          |  FROM hob CROSS JOIN l$t)""".stripMargin
      val tail = (1 to JmIters).map(t =>
        s"UNION ALL SELECT $t, (SELECT round(l, 6) FROM l$t), " +
          s"(SELECT nll FROM n$t)").mkString("\n|")
      s"""WITH raw AS MATERIALIZED (
        |  SELECT doc_id, i AS pos, tk[i] AS t0
        |  FROM (SELECT doc_id, str_split(text, ' ') AS tk,
        |          unnest(range(1, len(tk) + 1)) AS i FROM documents)),
        |trvoc AS (
        |  SELECT t0 FROM (
        |    SELECT t0, row_number() OVER (
        |      ORDER BY count(*) DESC, t0 ASC) AS vrk
        |    FROM raw WHERE doc_id % 10 <> 0 GROUP BY t0)
        |  WHERE vrk <= $ScoreTopV),
        |toks AS MATERIALIZED (
        |  SELECT r.doc_id, r.pos,
        |    CASE WHEN v.t0 IS NULL THEN '$UnkToken' ELSE r.t0 END AS term
        |  FROM raw r LEFT JOIN trvoc v USING (t0)),
        |trbi AS MATERIALIZED (
        |  SELECT prev, term FROM (
        |    SELECT doc_id, lag(term) OVER (
        |      PARTITION BY doc_id ORDER BY pos) AS prev, term
        |    FROM toks WHERE doc_id % 10 <> 0)
        |  WHERE prev IS NOT NULL),
        |uni AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS c_w
        |  FROM toks WHERE doc_id % 10 <> 0 GROUP BY term),
        |n AS (SELECT CAST(sum(c_w) AS DOUBLE) AS n FROM uni),
        |bc AS MATERIALIZED (
        |  SELECT prev, term, CAST(count(*) AS BIGINT) AS c_bi
        |  FROM trbi GROUP BY prev, term),
        |cx AS (SELECT prev, sum(c_bi) AS c_ctx FROM bc GROUP BY prev),
        |hob0 AS (
        |  SELECT prev, term, CAST(count(*) AS BIGINT) AS m FROM (
        |    SELECT doc_id, lag(term) OVER (
        |      PARTITION BY doc_id ORDER BY pos) AS prev, term
        |    FROM toks WHERE doc_id % 10 = 0)
        |  WHERE prev IS NOT NULL GROUP BY prev, term),
        |hob AS MATERIALIZED (
        |  SELECT * FROM (
        |    SELECT CAST(h.m AS DOUBLE) AS m,
        |      coalesce(CAST(c_bi AS DOUBLE) / c_ctx, 0.0) AS pb,
        |      coalesce(c_w, 0) / n.n AS pu
        |    FROM hob0 h LEFT JOIN bc USING (prev, term)
        |    LEFT JOIN cx USING (prev) LEFT JOIN uni USING (term)
        |    CROSS JOIN n)
        |  WHERE pu > 0),
        |l0 AS (SELECT 0.5 AS l),
        |n0 AS (
        |  SELECT round(sum(-ln(l * pb + (1 - l) * pu) * m) / sum(m), 4)
        |    AS nll
        |  FROM hob CROSS JOIN l0),
        |${(1 to JmIters).map(em).mkString(",\n|")}
        |SELECT CAST(iter AS INTEGER) AS iter, lambda, heldout_nll
        |FROM (
        |  SELECT 0 AS iter, (SELECT round(l, 6) FROM l0) AS lambda,
        |    (SELECT nll FROM n0) AS heldout_nll
        |  $tail)
        |ORDER BY iter""".stripMargin
    },
    "q277_doremi_reweight" ->
      s"""$foldedToksCtes,
        |freq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY term),
        |tot AS (SELECT sum(cnt) AS total FROM freq),
        |per_src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |    avg(-ln(CAST(cnt AS DOUBLE) / total)) AS m_nll
        |  FROM toks JOIN freq USING (term) CROSS JOIN tot
        |  GROUP BY source),
        |ref AS (
        |  SELECT sum(m_nll * n_tokens) / sum(n_tokens) AS ref_nll,
        |    CAST(sum(n_tokens) AS DOUBLE) AS tok_all,
        |    CAST(count(*) AS DOUBLE) AS k
        |  FROM per_src),
        |scored AS (
        |  SELECT source, n_tokens, m_nll,
        |    n_tokens / tok_all AS w_old,
        |    greatest(0.0, m_nll - ref_nll) AS excess, k
        |  FROM per_src CROSS JOIN ref),
        |sc2 AS (
        |  SELECT *, w_old * exp($DoremiEta * excess) AS raw FROM scored),
        |z AS (SELECT sum(raw) AS z FROM sc2)
        |SELECT source, n_tokens, round(m_nll, 4) AS mean_nll,
        |  round(excess, 4) + 0.0 AS excess_nll,
        |  round(w_old, 4) AS w_old,
        |  round(${1.0 - DoremiSmooth} * raw / z + $DoremiSmooth / k, 4)
        |    AS w_new
        |FROM sc2 CROSS JOIN z ORDER BY source""".stripMargin,
    // q380/q391 shared chain is quartileScoredCtes (below the map).
    // q380: the DoReMi update replayed over (source, quartile) cells;
    // the per-doc NLL quantizes per token before summing, so the
    // ntile order key is an exact-integer-derived double both engines
    "q380_quartile_mixing" ->
      s"""$quartileScoredCtes,
        |sc2 AS (
        |  SELECT *, w_old * exp($DoremiEta * excess) AS raw
        |  FROM scored),
        |z AS (SELECT sum(raw) AS z FROM sc2)
        |SELECT source, CAST(quartile AS BIGINT) AS quartile, n_docs,
        |  n_tokens, round(m_nll, 4) AS mean_nll,
        |  round(excess, 4) + 0.0 AS excess_nll,
        |  round(w_old, 4) AS w_old,
        |  round(${1.0 - DoremiSmooth} * raw / z + $DoremiSmooth / k, 4)
        |    AS w_new
        |FROM sc2 CROSS JOIN z ORDER BY source, quartile""".stripMargin,
    // q391: two unrolled update rounds on the same cell chain; each
    // round's raw mass quantizes to the 1e-12 grid before its Z sum
    // (exact-integer normalizer — see qDoremiIter2).
    "q391_doremi_iter2" ->
      s"""$quartileScoredCtes,
        |b AS (
        |  SELECT source, quartile, n_tokens, excess, k,
        |    w_old AS w0, exp($DoremiEta * excess) AS boost
        |  FROM scored),
        |r1 AS (
        |  SELECT *, CAST(floor(w0 * boost * 1e12 + 0.5) AS BIGINT)
        |    AS rq1 FROM b),
        |z1 AS (SELECT CAST(sum(rq1) AS BIGINT) AS zq1 FROM r1),
        |s1 AS (
        |  SELECT *, ${1.0 - DoremiSmooth} * (CAST(rq1 AS DOUBLE) / zq1)
        |    + $DoremiSmooth / k AS w1
        |  FROM r1 CROSS JOIN z1),
        |r2 AS (
        |  SELECT *, CAST(floor(w1 * boost * 1e12 + 0.5) AS BIGINT)
        |    AS rq2 FROM s1),
        |z2 AS (SELECT CAST(sum(rq2) AS BIGINT) AS zq2 FROM r2),
        |s2 AS (
        |  SELECT *, ${1.0 - DoremiSmooth} * (CAST(rq2 AS DOUBLE) / zq2)
        |    + $DoremiSmooth / k AS w2
        |  FROM r2 CROSS JOIN z2)
        |SELECT source, CAST(quartile AS BIGINT) AS quartile, n_tokens,
        |  round(excess, 4) + 0.0 AS excess_nll,
        |  round(w0, 4) AS w0, round(w1, 4) AS w1, round(w2, 4) AS w2,
        |  round(w2 - w1, 4) + 0.0 AS delta2
        |FROM s2 ORDER BY source, quartile""".stripMargin,
    "q280_dedup_quality_skew" -> {
      s"""WITH $labCtesSql,
        |cls AS (
        |  SELECT is_dup, CAST(count(*) AS BIGINT) AS n_docs,
        |    sum(score) AS s1, sum(score * score) AS s2
        |  FROM lab GROUP BY is_dup),
        |st AS (
        |  SELECT is_dup, n_docs, s1 / n_docs AS m,
        |    CASE WHEN n_docs > 1
        |      THEN (s2 - s1 * s1 / n_docs) / (n_docs - 1) END AS v
        |  FROM cls),
        |d AS (
        |  SELECT (sum(CASE WHEN is_dup = 1 THEN m END)
        |      - sum(CASE WHEN is_dup = 0 THEN m END))
        |    / sqrt((sum(CASE WHEN is_dup = 1 THEN (n_docs - 1) * v END)
        |        + sum(CASE WHEN is_dup = 0 THEN (n_docs - 1) * v END))
        |      / (sum(n_docs) - 2)) AS d
        |  FROM st)
        |SELECT CAST(is_dup AS BIGINT) AS is_dup, n_docs,
        |  round(m, 4) AS mean_score,
        |  round(sqrt(v), 4) AS sd_score,
        |  round(d, 4) + 0.0 AS cohens_d
        |FROM st CROSS JOIN d ORDER BY is_dup""".stripMargin
    },
    "q115_source_drift" ->
      s"""$foldedToksCtes,
        |sc AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_sw
        |  FROM toks GROUP BY source, term),
        |cc AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS c_w
        |  FROM toks GROUP BY term),
        |tot AS (
        |  SELECT CAST(sum(c_w) AS BIGINT) AS n_c,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM cc),
        |ns AS (
        |  SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s
        |  FROM sc GROUP BY source),
        |grid AS (
        |  SELECT ns.source, ns.n_s, cc.term, cc.c_w, sc.c_sw, tot.n_c, tot.v
        |  FROM ns CROSS JOIN cc
        |  LEFT JOIN sc ON sc.source = ns.source AND sc.term = cc.term
        |  CROSS JOIN tot)
        |SELECT source, max(n_s) AS n_tokens,
        |  round(sum(
        |    ((coalesce(c_sw, 0) + 0.5) / (n_s + 0.5 * v)) *
        |    ln(((coalesce(c_sw, 0) + 0.5) / (n_s + 0.5 * v))
        |       / ((c_w + 0.5) / (n_c + 0.5 * v)))), 4) + 0.0 AS kl
        |FROM grid GROUP BY source ORDER BY source""".stripMargin,
    "q114_dsir_select" ->
      s"""$dsirOracleCtes,
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT w.doc_id, n_tokens, dsir_logw,
        |    CAST(sum(n_tokens) OVER (ORDER BY dsir_logw DESC, w.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM weights w JOIN t USING (doc_id))
        |SELECT doc_id, n_tokens, dsir_logw, cum_tokens
        |FROM c WHERE cum_tokens <= 10000
        |ORDER BY cum_tokens""".stripMargin,
    "q71_tfidf_topk" ->
      s"""$foldedToksCtes,
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY doc_id, term),
        |df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, score, CAST(rk AS INTEGER) AS rk
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "q72_unigram_nll" ->
      s"""$foldedToksCtes,
        |freq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY term),
        |tot AS (SELECT sum(cnt) AS total FROM freq)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 4) AS nll
        |FROM toks JOIN freq USING (term) CROSS JOIN tot
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q101_ppl_routing" ->
      s"""$foldedToksCtes,
        |freq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY term),
        |tot AS (SELECT sum(cnt) AS total FROM freq),
        |nll AS (
        |  -- round to 4 BEFORE the tercile: the engine side consumes
        |  -- q72's rounded scores, and tercile membership must not ride
        |  -- on sub-rounding digits
        |  SELECT doc_id,
        |    round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 4) AS nll
        |  FROM toks JOIN freq USING (term) CROSS JOIN tot
        |  GROUP BY doc_id),
        |t AS (
        |  SELECT d.lang, n.nll,
        |    ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY n.nll, n.doc_id) AS tercile
        |  FROM nll n JOIN documents d USING (doc_id))
        |SELECT lang,
        |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(nll), 4) AS mean_nll,
        |  round(max(nll), 4) AS max_nll
        |FROM t GROUP BY lang, bucket
        |ORDER BY lang, bucket""".stripMargin,
    // q332: q182's diff chain unrounded, then Smirnov p + BH step-up
    "q332_bh_drift_screen" ->
      s"""WITH d AS (SELECT source, n_chars FROM documents),
        |grid AS (SELECT DISTINCT n_chars FROM d),
        |srcs AS (SELECT DISTINCT source FROM d),
        |cnts AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        |  FROM d GROUP BY source, n_chars),
        |filled AS (
        |  SELECT s.source, g.n_chars, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN grid g
        |  LEFT JOIN cnts c ON c.source = s.source
        |    AND c.n_chars = g.n_chars),
        |cum AS (
        |  SELECT source, n_chars, c,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM filled),
        |overall AS (
        |  SELECT n_chars,
        |    sum(call) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctot
        |  FROM (SELECT n_chars, CAST(count(*) AS BIGINT) AS call
        |        FROM d GROUP BY n_chars)),
        |ns AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ns
        |  FROM d GROUP BY source),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM d),
        |diffs AS (
        |  SELECT cum.source, ns.ns, t.n_all,
        |    abs(cum.cs / CAST(ns.ns AS DOUBLE)
        |      - (o.ctot - cum.cs) / CAST(t.n_all - ns.ns AS DOUBLE))
        |      AS diff
        |  FROM cum JOIN overall o USING (n_chars)
        |  JOIN ns USING (source) CROSS JOIN tot t),
        |ks AS (
        |  SELECT source, max(ns) AS ns, max(n_all) AS n_all,
        |    max(diff) AS dmax
        |  FROM diffs GROUP BY source),
        |pv AS (
        |  SELECT source, ns, dmax,
        |    least(1.0, 2.0 * exp(-2.0
        |      * (CAST(ns * (n_all - ns) AS DOUBLE) / n_all)
        |      * dmax * dmax)) AS p
        |  FROM ks),
        |ranked AS (
        |  SELECT *, count(*) OVER () AS m,
        |    row_number() OVER (ORDER BY p, source) AS rk
        |  FROM pv),
        |k AS (
        |  SELECT coalesce(max(CASE WHEN p <= rk * $BhAlpha / m
        |    THEN rk END), 0) AS k
        |  FROM ranked)
        |SELECT source, CAST(ns AS BIGINT) AS n_docs,
        |  floor(dmax * 1e4 + 0.5) / 1e4 AS d_stat,
        |  floor(p * 1e6 + 0.5) / 1e6 AS p_value,
        |  CAST(rk AS INTEGER) AS rank,
        |  rk <= k.k AS reject
        |FROM ranked CROSS JOIN k ORDER BY rank""".stripMargin,
    "q182_ks_drift" ->
      """WITH d AS (SELECT source, n_chars FROM documents),
        |grid AS (SELECT DISTINCT n_chars FROM d),
        |srcs AS (SELECT DISTINCT source FROM d),
        |cnts AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        |  FROM d GROUP BY source, n_chars),
        |filled AS (
        |  SELECT s.source, g.n_chars, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN grid g
        |  LEFT JOIN cnts c ON c.source = s.source
        |    AND c.n_chars = g.n_chars),
        |cum AS (
        |  SELECT source, n_chars, c,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM filled),
        |overall AS (
        |  SELECT n_chars,
        |    sum(call) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctot
        |  FROM (SELECT n_chars, CAST(count(*) AS BIGINT) AS call
        |        FROM d GROUP BY n_chars)),
        |ns AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ns
        |  FROM d GROUP BY source),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM d),
        |diffs AS (
        |  SELECT cum.source, ns.ns,
        |    abs(cum.cs / CAST(ns.ns AS DOUBLE)
        |      - (o.ctot - cum.cs) / CAST(t.n_all - ns.ns AS DOUBLE))
        |      AS diff
        |  FROM cum JOIN overall o USING (n_chars)
        |  JOIN ns USING (source) CROSS JOIN tot t)
        |SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
        |  round(max(diff), 4) AS d_stat
        |FROM diffs GROUP BY source ORDER BY source""".stripMargin,
    "q178_robust_z" -> {
      val stops = TextOps.stopwordsSqlList
      s"""WITH b AS (
        |  SELECT doc_id, source,
        |    round((1.0 - len(list_filter(str_split(text, ' '), t -> t IN $stops))
        |      / CAST(len(str_split(text, ' ')) AS DOUBLE))
        |     * least(1.0, len(str_split(text, ' ')) / 100.0), 4) AS q
        |  FROM documents),
        |med AS (
        |  SELECT source, quantile_cont(q, 0.5) AS med FROM b
        |  GROUP BY source),
        |dev AS (
        |  SELECT b.doc_id, b.source, b.q, abs(b.q - med.med) AS dev,
        |    med.med
        |  FROM b JOIN med USING (source)),
        |mad AS (
        |  SELECT source, quantile_cont(dev, 0.5) AS mad FROM dev
        |  GROUP BY source),
        |z AS (
        |  SELECT d.doc_id, d.source, d.q,
        |    CASE WHEN m.mad > 0
        |         THEN round((d.q - d.med) / ($MadSigma * m.mad), 4) + 0.0
        |         ELSE 0.0 END AS z
        |  FROM dev d JOIN mad m USING (source))
        |SELECT doc_id, source, q, z, abs(z) > 3.0 AS outlier
        |FROM z ORDER BY doc_id""".stripMargin
    },
    "q165_feature_mi" -> {
      val feats = Seq(
        ("f_long", "n_chars > 300"),
        ("f_short", "n_chars < 150"),
        ("f_spark", "text LIKE '%spark%'"),
        ("f_the", "text LIKE '% the %'"))
      val aggCols = feats.map { case (nm, cond) =>
        s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS nf_$nm,\n" +
          s"    CAST(sum(CASE WHEN ($cond) AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n11_$nm"
      }.mkString(",\n|    ")
      def term(c: String, a: String, b: String) =
        s"CASE WHEN $c > 0 THEN ($c / CAST(n AS DOUBLE)) * " +
          s"ln(CAST($c AS DOUBLE) * n / (($a) * ($b))) ELSE 0.0 END"
      val rows = feats.map { case (nm, _) =>
        val nf = s"nf_$nm"; val n11 = s"n11_$nm"
        val n10 = s"($nf - $n11)"; val n01 = s"(ny - $n11)"
        val n00 = s"(n - $nf - ny + $n11)"
        s"""SELECT '$nm' AS feature, $nf AS n_f, $n11 AS n11,
           |    round(${term(n11, nf, "ny")}
           |      + ${term(n10, nf, "(n - ny)")}
           |      + ${term(n01, s"(n - $nf)", "ny")}
           |      + ${term(n00, s"(n - $nf)", "(n - ny)")}, 4) + 0.0 AS mi
           |  FROM agg""".stripMargin
      }.mkString("\n|  UNION ALL\n|  ")
      s"""WITH agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ny,
        |    $aggCols
        |  FROM documents)
        |SELECT * FROM (
        |  $rows)
        |ORDER BY feature""".stripMargin
    },
    "q160_kn_bigram" ->
      s"""$foldedToksCtes,
        |bi AS (
        |  SELECT doc_id, prev, term FROM (
        |    SELECT doc_id, lag(term) OVER (
        |      PARTITION BY doc_id ORDER BY pos) AS prev, term
        |    FROM toks)
        |  WHERE prev IS NOT NULL),
        |bc AS (
        |  SELECT prev, term, CAST(count(*) AS BIGINT) AS c_bi
        |  FROM bi GROUP BY prev, term),
        |cx AS (
        |  SELECT prev, sum(c_bi) AS c_ctx,
        |    CAST(count(*) AS BIGINT) AS n_follow
        |  FROM bc GROUP BY prev),
        |ct AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS n_prec
        |  FROM bc GROUP BY term),
        |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bc)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(-ln(
        |    greatest(c_bi - $KnD, 0.0) / c_ctx
        |      + ($KnD * n_follow / c_ctx) * (n_prec / n_types))), 4)
        |    AS kn_nll
        |FROM bi JOIN bc USING (prev, term) JOIN cx USING (prev)
        |  JOIN ct USING (term) CROSS JOIN nt
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q93_bigram_nll" ->
      s"""$foldedToksCtes,
        |bi AS (
        |  SELECT doc_id, prev, term FROM (
        |    SELECT doc_id, lag(term) OVER (
        |      PARTITION BY doc_id ORDER BY pos) AS prev, term
        |    FROM toks)
        |  WHERE prev IS NOT NULL),
        |bc AS (
        |  SELECT prev, term, CAST(count(*) AS BIGINT) AS c_bi
        |  FROM bi GROUP BY prev, term),
        |cc AS (SELECT prev, sum(c_bi) AS c_ctx FROM bc GROUP BY prev),
        |v AS (
        |  SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(-ln((c_bi + 1.0) / (c_ctx + v))), 4) AS nll
        |FROM bi JOIN bc USING (prev, term) JOIN cc USING (prev) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q202_ess_audit" ->
      s"""$dsirOracleCtes,
        |ww AS (
        |  SELECT w.doc_id, exp(dsir_logw) AS w, d.lang
        |  FROM weights w JOIN documents d USING (doc_id))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(sum(w) * sum(w) / sum(w * w), 4) AS ess,
        |  round(sum(w) * sum(w) / sum(w * w) / count(*), 4) AS ess_ratio
        |FROM ww GROUP BY lang ORDER BY lang""".stripMargin,
    "q203_calibration" -> {
      s"""WITH $labCtesSql,
        |brier AS (
        |  SELECT round(avg((score - is_dup) * (score - is_dup)), 4)
        |    AS brier
        |  FROM lab)
        |SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(score), 4) AS mean_score,
        |  round(avg(CAST(is_dup AS DOUBLE)), 4) AS frac_pos,
        |  any_value(brier) AS brier
        |FROM lab CROSS JOIN brier
        |GROUP BY 1 ORDER BY bin""".stripMargin
    },
    "q204_threshold_sweep" -> {
      val stop16 = Stop16.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_words,
        |    str_split(text, ' ') AS tk, text
        |  FROM documents),
        |z AS (
        |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_toks,
        |    $Wb + $Wl * ln(1.0 + n_words)
        |      + $Ww * (list_sum(list_transform(tk,
        |          x -> CAST(length(x) AS DOUBLE))) / n_words)
        |      + $Ws * (CAST(len(list_filter(tk, x -> x IN $stop16))
        |          AS DOUBLE) / n_words)
        |      + $Wu * coalesce(
        |          CAST(length(text) - length(regexp_replace(text,
        |            '[A-Z]', '', 'g')) AS DOUBLE)
        |            / nullif(length(text), 0), 0.0) AS z
        |  FROM f),
        |hist AS (
        |  SELECT round(1.0 / (1.0 + exp(-z)), 4) AS score,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM z GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS td,
        |    CAST(sum(n_tokens) AS BIGINT) AS tt
        |  FROM hist),
        |grid AS (
        |  SELECT round(i / 20.0, 2) AS thr
        |  FROM generate_series(0, 20) t(i)),
        |kept AS (
        |  SELECT thr,
        |    CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS kept_docs,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS kept_tokens
        |  FROM grid LEFT JOIN hist ON score >= thr
        |  GROUP BY thr)
        |SELECT thr, kept_docs, kept_tokens,
        |  round(kept_docs / CAST(td AS DOUBLE), 4) AS doc_share,
        |  round(kept_tokens / CAST(tt AS DOUBLE), 4) AS token_share
        |FROM kept CROSS JOIN tot ORDER BY thr""".stripMargin
    },
    "q201_auc_eval" -> {
      s"""WITH $labCtesSql,
        |per AS (
        |  SELECT score, CAST(sum(is_dup) AS BIGINT) AS np,
        |    CAST(sum(1 - is_dup) AS BIGINT) AS nn
        |  FROM lab GROUP BY score),
        |cum AS (
        |  SELECT score, np, nn,
        |    coalesce(CAST(sum(nn) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum_nn
        |  FROM per)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(nn) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
        |    round(CAST(sum(np * (2 * cum_nn + nn)) AS DOUBLE)
        |      / (2.0 * sum(np) * sum(nn)), 4) END AS auc,
        |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
        |    round(CAST(sum(np * (2 * cum_nn + nn)) AS DOUBLE)
        |      / (CAST(sum(np) AS DOUBLE) * sum(nn)) - 1.0, 4) + 0.0
        |    END AS gini_coef
        |FROM cum""".stripMargin
    },
    // q319: identical gate replay as q238, different statistic — only
    // the discordant cells feed the test
    "q319_mcnemar_gates" -> {
      val stop16 = Stop16.map(w => s"'$w'").mkString("(", ", ", ")")
      val stop8 = QualityQueries.Stop8.map(w => s"'$w'")
        .mkString("[", ", ", "]")
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_words,
        |    str_split(text, ' ') AS tk,
        |    text
        |  FROM documents),
        |gate AS (
        |  SELECT doc_id,
        |    (len(tk) BETWEEN 50 AND 100000
        |      AND round(list_sum(list_transform(tk,
        |        x -> CAST(length(x) AS DOUBLE))) / len(tk), 4)
        |        BETWEEN 3.0 AND 10.0
        |      AND round(CAST(len(regexp_extract_all(text, '#')) +
        |        len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
        |        / len(tk), 4) <= 0.1
        |      AND len(list_intersect(list_distinct(tk), $stop8)) >= 2)
        |      AS passes,
        |    (1.0 / (1.0 + exp(-($Wb + $Wl * ln(1.0 + n_words)
        |      + $Ww * (list_sum(list_transform(tk,
        |          x -> CAST(length(x) AS DOUBLE))) / n_words)
        |      + $Ws * (CAST(len(list_filter(tk, x -> x IN $stop16))
        |          AS DOUBLE) / n_words)
        |      + $Wu * coalesce(
        |          CAST(length(text) - length(regexp_replace(text,
        |            '[A-Z]', '', 'g')) AS DOUBLE)
        |            / nullif(length(text), 0), 0.0)))) >= 0.5) AS keep
        |  FROM f),
        |cells AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN passes AND NOT keep THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT passes AND keep THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM gate)
        |SELECT n, b, c,
        |  floor(1e4 * (b - c) * (b - c) / nullif(b + c, 0) + 0.5) / 1e4
        |    AS chi2,
        |  floor(1e4 * (abs(b - c) - 1) * (abs(b - c) - 1)
        |    / nullif(b + c, 0) + 0.5) / 1e4 AS chi2_cc
        |FROM cells""".stripMargin
    },
    // q320: same lab frame as q203, bin sums folded in cell order
    "q320_brier_decomposition" -> {
      s"""WITH $labCtesSql,
        |bins AS (
        |  SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
        |    CAST(count(*) AS BIGINT) AS nk, sum(score) AS sk,
        |    CAST(sum(CAST(is_dup AS BIGINT)) AS BIGINT) AS yk
        |  FROM lab GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(is_dup AS BIGINT)) AS BIGINT) AS ny,
        |    avg((score - is_dup) * (score - is_dup)) AS brier
        |  FROM lab),
        |bs AS (
        |  SELECT list({'bin': bin, 'nk': nk, 'sk': sk, 'yk': yk}
        |    ORDER BY bin) AS bs FROM bins),
        |st AS (
        |  SELECT n, ny, brier, bs, CAST(ny AS DOUBLE) / n AS ybar
        |  FROM bs CROSS JOIN tot)
        |SELECT n, floor(ybar * 1e4 + 0.5) / 1e4 AS y_bar,
        |  floor(list_reduce(list_prepend(0.0,
        |    list_transform(bs, b -> b.nk *
        |      (b.sk / b.nk - CAST(b.yk AS DOUBLE) / b.nk)
        |      * (b.sk / b.nk - CAST(b.yk AS DOUBLE) / b.nk))),
        |    (a, x) -> a + x) / n * 1e4 + 0.5) / 1e4 AS reliability,
        |  floor(list_reduce(list_prepend(0.0,
        |    list_transform(bs, b -> b.nk *
        |      (CAST(b.yk AS DOUBLE) / b.nk - ybar)
        |      * (CAST(b.yk AS DOUBLE) / b.nk - ybar))),
        |    (a, x) -> a + x) / n * 1e4 + 0.5) / 1e4 AS resolution,
        |  floor(ybar * (1.0 - ybar) * 1e4 + 0.5) / 1e4 AS uncertainty,
        |  floor(brier * 1e4 + 0.5) / 1e4 AS brier
        |FROM st""".stripMargin
    },
    "q238_gate_kappa" -> {
      val stop16 = Stop16.map(w => s"'$w'").mkString("(", ", ", ")")
      val stop8 = QualityQueries.Stop8.map(w => s"'$w'")
        .mkString("[", ", ", "]")
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_words,
        |    str_split(text, ' ') AS tk,
        |    text
        |  FROM documents),
        |gate AS (
        |  SELECT doc_id,
        |    (len(tk) BETWEEN 50 AND 100000
        |      AND round(list_sum(list_transform(tk,
        |        x -> CAST(length(x) AS DOUBLE))) / len(tk), 4)
        |        BETWEEN 3.0 AND 10.0
        |      AND round(CAST(len(regexp_extract_all(text, '#')) +
        |        len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
        |        / len(tk), 4) <= 0.1
        |      AND len(list_intersect(list_distinct(tk), $stop8)) >= 2)
        |      AS passes,
        |    (1.0 / (1.0 + exp(-($Wb + $Wl * ln(1.0 + n_words)
        |      + $Ww * (list_sum(list_transform(tk,
        |          x -> CAST(length(x) AS DOUBLE))) / n_words)
        |      + $Ws * (CAST(len(list_filter(tk, x -> x IN $stop16))
        |          AS DOUBLE) / n_words)
        |      + $Wu * coalesce(
        |          CAST(length(text) - length(regexp_replace(text,
        |            '[A-Z]', '', 'g')) AS DOUBLE)
        |            / nullif(length(text), 0), 0.0)))) >= 0.5) AS keep
        |  FROM f),
        |cells AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN passes AND keep THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN passes AND NOT keep THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN NOT passes AND keep THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN NOT passes AND NOT keep THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM gate)
        |SELECT n, n11, n10, n01, n00,
        |  round((n11 + n00) / CAST(n AS DOUBLE), 4) AS p_obs,
        |  round(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |    / (CAST(n AS DOUBLE) * n), 4) AS p_exp,
        |  round(((n11 + n00) / CAST(n AS DOUBLE)
        |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |        / (CAST(n AS DOUBLE) * n))
        |    / (1.0 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |        / (CAST(n AS DOUBLE) * n)), 4) + 0.0 AS kappa
        |FROM cells""".stripMargin
    },
    "q87_quality_classifier" -> {
      val stop16 = Stop16.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS DOUBLE) AS n_words,
        |    str_split(text, ' ') AS tk,
        |    text
        |  FROM documents),
        |z AS (
        |  SELECT doc_id, n_words,
        |    $Wb + $Wl * ln(1.0 + n_words)
        |      + $Ww * (list_sum(list_transform(tk,
        |          x -> CAST(length(x) AS DOUBLE))) / n_words)
        |      + $Ws * (CAST(len(list_filter(tk, x -> x IN $stop16))
        |          AS DOUBLE) / n_words)
        |      + $Wu * coalesce(
        |          CAST(length(text) - length(regexp_replace(text,
        |            '[A-Z]', '', 'g')) AS DOUBLE)
        |            / nullif(length(text), 0), 0.0) AS z
        |  FROM f)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(1.0 / (1.0 + exp(-z)), 4) AS score,
        |  (1.0 / (1.0 + exp(-z)) >= 0.5) AS keep
        |FROM z ORDER BY doc_id""".stripMargin
    },
  )
}
