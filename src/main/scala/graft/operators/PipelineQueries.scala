package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryModule
import graft.functions.{SentimentOps, TextOps}
import graft.pipelines.{RedditPipeline, RssPipeline, TwitterPipeline}
import graft.sources.Tables

/** Lexicon-UDF operators (P1 VADER, P3 demojize, P10 TF keywords) and the
  * three end-to-end pipeline re-hosts, exposed as driver queries.
  * Reference-shaped records are synthesized from the driver's tables
  * (the corpus has no tweets/posts/feeds); `insert_date` columns are
  * dropped from outputs for determinism.
  */
object PipelineQueries extends QueryModule {

  /** P10, in-row form (`b` twin, plan comparison only): per-doc top-5
    * unigram TF keywords inside array expressions. Catalyst does not CSE
    * across lambda boundaries, so the tokenize chain replicates in the
    * plan — measured ~5× slower than the shuffle form at sf0.1 (28s vs
    * 6s), and it degrades with document length. Same output, same oracle. */
  def qKeywordsTfInRow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = filter(
      TextOps.dropStopwords(TextOps.tokenize(TextOps.cleanText($"text"))),
      t => t =!= "")
    // staged projections so CollapseProject keeps `toks` materialized
    // once per row (see qBigramsTopkInRow for the rationale)
    Tables.documents(s, dir)
      .select($"doc_id", toks.as("toks"))
      .filter(size($"toks") > 0)
      .select($"doc_id", slice(array_sort(
        transform(array_distinct($"toks"), u =>
          struct((-size(filter($"toks", t => t === u))).as("nc"), u.as("t")))),
        1, 5).as("top5"))
      .select($"doc_id",
        array_join(transform($"top5", x => x.getField("t")), " ")
          .as("keywords"))
      .orderBy($"doc_id")
  }

  /** P10 (default, shuffle form): per-doc top-5 unigram TF keywords via
    * explode → count → window — map-side partial agg + WindowGroupLimit;
    * the shape that survives unbounded documents. */
  def qKeywordsTf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir).select($"doc_id",
      explode(TextOps.dropStopwords(TextOps.tokenize(TextOps.cleanText($"text"))))
        .as("t"))
      .filter($"t" =!= "")
    val counts = toks.groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"doc_id").orderBy($"c".desc, $"t".asc)
    counts.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .groupBy($"doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"rk", $"t"))),
        p => p.getField("t")), " ").as("keywords"))
      .orderBy($"doc_id")
  }

  /** P1: VADER sentiment over documents (no oracle — rule engine; fidelity
    * pinned by VaderSpec fixtures). */
  def qSentiment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("sentiment", SentimentOps.vader($"text"))
      .select($"doc_id",
        $"sentiment.negative".as("negative"),
        $"sentiment.neutral".as("neutral"),
        $"sentiment.positive".as("positive"),
        $"sentiment.compound".as("compound"))
      .orderBy($"doc_id")
  }

  /** P1's lexicon half as a DISTRIBUTED broadcast join — no UDF: explode
    * VADER-tokenized words (whitespace split, tokens > 1 char), score
    * against the lexicon table, raw lowercase form first (emoticons like
    * ":)" live in the lexicon with punctuation) then the punct-stripped
    * form — exactly the engine's two-step lookup. Oracled with the
    * lexicon embedded as a DuckDB VALUES literal (the q41-planes trick;
    * round-3 verdict #6), which makes the lexicon path a green
    * CORRECTNESS row; the rule engine (negation, boosters, idioms)
    * remains fixture-tested in VaderSpec. At 100 TB this is the shape a
    * lexicon scorer should have anyway: a broadcast hash join against a
    * few-thousand-row dim table, fully codegen'd, one partial-agg
    * shuffle of (doc_id, sum, count). */
  def qLexiconSentiment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lex = graft.functions.Vader.lexiconEntries.toDF("w", "v")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", "\\s+")).as("t"))
      .filter(length($"t") > 1)
      .select($"doc_id", lower($"t").as("raw"))
      .withColumn("stripped", regexp_replace($"raw",
        "^[^\\p{L}\\p{N}]+|[^\\p{L}\\p{N}]+$", ""))
    toks
      .join(broadcast(lex.select($"w".as("raw"), $"v".as("v_raw"))),
        Seq("raw"), "left")
      .join(broadcast(lex.select($"w".as("stripped"), $"v".as("v_str"))),
        Seq("stripped"), "left")
      .select($"doc_id", coalesce($"v_raw", $"v_str").as("v"))
      .groupBy($"doc_id")
      // + 0.0: opposing lexicon values can cancel to a ±1e-16 residue
      // whose rounded sign (-0.0 vs 0.0) differs between engines
      .agg(count($"v").as("n_hits"),
        (round(sum($"v"), 4) + lit(0.0)).as("lex_sum"))
      .orderBy($"doc_id")
  }

  /** P3: demojize. The corpus is emoji-free, so the oracle asserts the
    * identity property (demojize(emoji-free) == input) — real emoji
    * behavior is pinned by EmojiSpec fixtures. */
  def qDemojize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", graft.functions.Emoji.demojizeCol($"text").as("demojized"))
      .orderBy($"doc_id")
  }

  /** E1 re-host input: tweets synthesized from events. */
  private def twitterResult(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tweets = Tables.events(s, dir).select(
      $"event_id".cast("string").as("tweet_id"),
      concat(lit("event "), $"event_type", lit(" #"), $"event_type",
        lit(" value "), $"value".cast("string")).as("text"),
      concat(date_format($"ts", "yyyy-MM-dd HH:mm:ss"), lit("+0000"))
        .as("created_at"),
      map(lit("views"), $"value".cast("string")).as("metrics"),
      map(lit("name"), concat(lit("user_"), $"user_id")).as("author"),
      $"event_type".as("trend"))
    TwitterPipeline(tweets)
  }

  /** E1 re-host, deterministic projection (oracled): ids, parsed dates,
    * trend, extracted hashtags. `text` stays out — its `value` rendering
    * (Spark double→string) is not oracle-portable; the VADER half lives
    * in q52b. */
  def qTwitterPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    twitterResult(s, dir)
      .select($"tweet_id", $"created_at", $"trend",
        // array_join: the driver's pandas compare can't hash raw arrays
        array_join($"hashtags", " ").as("hashtags"))
      .orderBy($"tweet_id")
  }

  /** E1 re-host, enrichment half (rows-only: VADER + double-rendered
    * text). */
  def qTwitterSentiment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    twitterResult(s, dir)
      .select($"tweet_id", $"text", $"sentiment.compound".as("compound"))
      .orderBy($"tweet_id")
  }

  /** E2 re-host input: posts synthesized from documents (comments = two
    * slices of the text so cross-comment bigrams exercise the chain). */
  private def redditPosts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id".cast("string").as("id"),
      concat(lit("doc "), $"doc_id", lit(" from "), $"source").as("title"),
      map(lit("name"), $"source").as("author"),
      lit("2024-03-01 12:00:00").as("created"),
      ($"n_chars" % 1000).cast("int").as("score"),
      lit(0.9).as("upvote_ratio"),
      map(lit("subreddit"), $"lang").as("reddit"),
      array(
        struct(substring($"text", 1, 200).as("text")),
        struct(substring($"text", 201, 10000).as("text"))).as("comments"))
  }

  /** E2 re-host, deterministic projection (oracled): the full pipeline
    * runs, but only the SQL-reproducible columns are emitted — keywords,
    * parsed dates, ids. The VADER half lives in q53b. */
  def qRedditPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    RedditPipeline(redditPosts(s, dir))
      .drop("insert_date")
      .select($"id", $"title", $"created", $"score",
        array_join($"keywords", " ").as("keywords"))
      .orderBy($"id")
  }

  /** E2 re-host, enrichment half (rows-only: VADER is rule-engine
    * Scala, pinned by VaderSpec fixtures rather than DuckDB). */
  def qRedditSentiment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    RedditPipeline(redditPosts(s, dir))
      .select($"id", $"sentiment.compound".as("compound"),
        transform($"comments", c => c.getField("sentiment").getField("compound"))
          .cast("string").as("comment_compounds"))
      .orderBy($"id")
  }

  /** E3 re-host input: feeds synthesized from documents; every 10th link
    * is already "seen" and must be dropped by the anti-join. */
  private def rssFeeds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    docs.select(
      $"source".as("feed_source"),
      concat(lit("article "), $"doc_id").as("title"),
      concat(lit("https://feeds.example/"), $"doc_id").as("link"),
      when($"doc_id" % 2 === 0,
        concat(lit("Mon, 04 Mar 2024 10:30:00 "),
          when($"doc_id" % 4 === 0, lit("+0100")).otherwise(lit("GMT"))))
        .otherwise(lit(null.asInstanceOf[String])).as("published"),
      when($"doc_id" % 2 === 1,
        array(lit(2024), lit(3), lit(4), lit(10), lit(30), lit(0),
          lit(0), lit(64), lit(-1)))
        .otherwise(lit(null)).as("published_parsed"),
      when($"doc_id" % 3 === 0, concat(lit("<p>summary of "), $"doc_id",
        lit("</p>"))).otherwise(lit(null.asInstanceOf[String])).as("summary"),
      concat(lit("<html><body><p>"), $"text", lit("</p></body></html>"))
        .as("content"))
  }

  private def rssResult(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feeds = rssFeeds(s, dir)
    val seen = feeds.filter(expr("CAST(substring(link, 23) AS BIGINT) % 10 = 0"))
      .select($"link")
    RssPipeline(feeds, seen)
  }

  /** E3 re-host, deterministic projection (oracled): seen-link anti-join,
    * HTML strip, TF tags, parsed publish dates. The sentence-scored
    * summary half lives in q54b. */
  def qRssPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rssResult(s, dir)
      .select($"link", $"title", $"published",
        array_join($"tags", " ").as("tags"))
      .orderBy($"link")
  }

  /** E3 re-host, summary half (rows-only: the sentence scorer's
    * tie-breaks are pinned by SummarizeSpec, not DuckDB). */
  def qRssSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rssResult(s, dir)
      .select($"link", $"summary")
      .orderBy($"link")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_keywords_tf"     -> (qKeywordsTf _),
    "q18b_keywords_inrow" -> (qKeywordsTfInRow _),
    "q50_sentiment"       -> (qSentiment _),
    "q50a_lexicon_sentiment" -> (qLexiconSentiment _),
    "q51_demojize"        -> (qDemojize _),
    "q52_twitter_pipeline" -> (qTwitterPipeline _),
    "q52b_twitter_sentiment" -> (qTwitterSentiment _),
    "q53_reddit_pipeline" -> (qRedditPipeline _),
    "q53b_reddit_sentiment" -> (qRedditSentiment _),
    "q54_rss_pipeline"    -> (qRssPipeline _),
    "q54b_rss_summary"    -> (qRssSummary _),
  )

  override def oracleSql: Map[String, String] = {
    val stops = TextOps.stopwordsSqlList
    val cleanSql = TextOps.cleanTextSql
    Map(
      "q18_keywords_tf" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(str_split($cleanSql, ' '),
           |    t -> t NOT IN $stops AND t <> '')) AS t
           |  FROM documents),
           |counts AS (
           |  SELECT doc_id, t, count(*) AS c FROM toks GROUP BY doc_id, t),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, t ASC) AS rk FROM counts)
           |SELECT doc_id, string_agg(t, ' ' ORDER BY rk) AS keywords
           |FROM ranked WHERE rk <= 5
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "q18b_keywords_inrow" -> // same contract as q18 → same oracle
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(str_split($cleanSql, ' '),
           |    t -> t NOT IN $stops AND t <> '')) AS t
           |  FROM documents),
           |counts AS (
           |  SELECT doc_id, t, count(*) AS c FROM toks GROUP BY doc_id, t),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, t ASC) AS rk FROM counts)
           |SELECT doc_id, string_agg(t, ' ' ORDER BY rk) AS keywords
           |FROM ranked WHERE rk <= 5
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "q50_sentiment" -> {
        // Rule-replay oracle (round-16 verdict #4): the VADER scoring
        // state machine re-implemented in SQL over the same constant
        // tables — two-step lexicon lookup (raw lowercase, then
        // punct-stripped), booster token gate, ALL-CAPS emphasis,
        // distance-1 booster scalar + negation flip (lexicon-skip
        // respected), the "least" check, "but"-clause re-weighting,
        // !/? punctuation emphasis, alpha-15 normalization, and the
        // exact round3/round4 (floor(x*k + 0.5)/k == Java Math.round)
        // arithmetic. RESTRICTED GRAMMAR, documented: look-back
        // distances 2-3 (decay 0.95/0.9, never-so/this, without-doubt)
        // and the idiom / booster-phrase windows are NOT replayed —
        // the corpus vocabulary (31 words, audited via the q18 token
        // domain) contains no booster, no negation, no idiom bigram,
        // so those branches are dead on every input row; any drift
        // surfaces as a hash mismatch, never silently. Per-token
        // sentiments on this corpus are exact doubles (only
        // fast=+1.0 / slow=-1.0 hit), so SUM order cannot perturb
        // the rounded outputs.
        val lexValues = graft.functions.Vader.lexiconEntries
          .map { case (w, v) => s"('${w.replace("'", "''")}',$v)" }
          .mkString(",")
        val boostValues = graft.functions.Vader.boosterEntries
          .map { case (w, v) => s"('${w.replace("'", "''")}',$v)" }
          .mkString(",")
        val negValues = graft.functions.Vader.negationEntries
          .map(w => s"('${w.replace("'", "''")}')").mkString(",")
        s"""WITH lex AS (
           |  SELECT w, CAST(v AS DOUBLE) AS v FROM (VALUES $lexValues) t(w, v)),
           |boost AS (
           |  SELECT w, CAST(v AS DOUBLE) AS v FROM (VALUES $boostValues) t(w, v)),
           |negs AS (SELECT w FROM (VALUES $negValues) t(w)),
           |t0 AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(text, '\\s+'),
           |      t -> length(t) > 1) AS toks
           |  FROM documents),
           |tok AS (
           |  SELECT doc_id, unnest(toks) AS tk,
           |    unnest(range(1, len(toks) + 1)) AS i
           |  FROM t0),
           |fl AS (
           |  SELECT doc_id, i, tk, lower(tk) AS lw,
           |    regexp_replace(lower(tk),
           |      '^[^\\p{L}\\p{N}]+|[^\\p{L}\\p{N}]+$$', '', 'g') AS st,
           |    (regexp_matches(tk, '\\p{L}') AND tk = upper(tk)
           |      AND tk <> lower(tk)) AS isup
           |  FROM tok),
           |fj AS (
           |  SELECT f.*, lr.v AS v_raw,
           |    coalesce(lr.v, ls.v) AS base,
           |    (bg.w IS NOT NULL) AS gate_boost,
           |    br.v AS b_raw,
           |    (nn.w IS NOT NULL OR f.lw LIKE '%n''t') AS is_neg
           |  FROM fl f
           |  LEFT JOIN lex lr ON f.lw = lr.w
           |  LEFT JOIN lex ls ON f.st = ls.w
           |  LEFT JOIN boost bg ON f.st = bg.w
           |  LEFT JOIN boost br ON f.lw = br.w
           |  LEFT JOIN negs nn ON f.lw = nn.w),
           |sq AS (
           |  SELECT *,
           |    sum(CASE WHEN isup THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id) AS n_caps,
           |    count(*) OVER (PARTITION BY doc_id) AS n_toks,
           |    lag(lw) OVER win AS p_lw,
           |    lag(v_raw IS NOT NULL) OVER win AS p_inlex,
           |    lag(b_raw) OVER win AS p_boost,
           |    lag(is_neg) OVER win AS p_neg,
           |    lag(isup) OVER win AS p_isup,
           |    lag(lw, 2) OVER win AS pp_lw
           |  FROM fj
           |  WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
           |vals AS (
           |  SELECT doc_id, i, lw,
           |    CASE WHEN gate_boost OR base IS NULL THEN 0.0
           |      ELSE base + CASE WHEN (n_caps > 0 AND n_caps < n_toks)
           |          AND isup
           |        THEN CASE WHEN base > 0 THEN 0.733 ELSE -0.733 END
           |        ELSE 0.0 END END AS v0,
           |    CASE WHEN NOT gate_boost AND base IS NOT NULL
           |        AND p_lw IS NOT NULL AND NOT coalesce(p_inlex, false)
           |      THEN (v0 + CASE WHEN p_boost IS NOT NULL THEN
           |          ((CASE WHEN v0 < 0 THEN -p_boost ELSE p_boost END)
           |           + CASE WHEN (n_caps > 0 AND n_caps < n_toks)
           |               AND p_isup
           |             THEN CASE WHEN v0 > 0 THEN 0.733 ELSE -0.733 END
           |             ELSE 0.0 END) * 1.0
           |          ELSE 0.0 END)
           |        * CASE WHEN coalesce(p_neg, false) THEN -0.74
           |            ELSE 1.0 END
           |      ELSE v0 END AS v1,
           |    CASE WHEN NOT gate_boost AND base IS NOT NULL
           |        AND p_lw = 'least'
           |        AND coalesce(pp_lw, '') NOT IN ('at', 'very')
           |      THEN v1 * -0.74 ELSE v1 END AS v2
           |  FROM sq),
           |butp AS (
           |  SELECT doc_id, min(i) AS bi FROM vals WHERE lw = 'but'
           |  GROUP BY doc_id),
           |fin AS (
           |  SELECT v.doc_id,
           |    CASE WHEN b.bi IS NOT NULL AND v.i < b.bi THEN v.v2 * 0.5
           |         WHEN b.bi IS NOT NULL AND v.i > b.bi THEN v.v2 * 1.5
           |         ELSE v.v2 END AS sv
           |  FROM vals v LEFT JOIN butp b USING (doc_id)),
           |agg AS (
           |  SELECT doc_id, sum(sv) AS ssum,
           |    sum(CASE WHEN sv > 0 THEN sv + 1 ELSE 0.0 END) AS pos0,
           |    sum(CASE WHEN sv < 0 THEN sv - 1 ELSE 0.0 END) AS neg0,
           |    CAST(sum(CASE WHEN sv = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           |      AS neu
           |  FROM fin GROUP BY doc_id),
           |pu AS (
           |  SELECT doc_id,
           |    least(length(text) - length(replace(text, '!', '')), 4)
           |      * 0.292
           |    + CASE WHEN (length(text) - length(replace(text, '?', '')))
           |          > 1
           |        THEN CASE WHEN (length(text)
           |            - length(replace(text, '?', ''))) <= 3
           |          THEN (length(text) - length(replace(text, '?', '')))
           |            * 0.18
           |          ELSE 0.96 END
           |        ELSE 0.0 END AS punct
           |  FROM documents),
           |m AS (
           |  SELECT a.doc_id,
           |    CASE WHEN a.ssum > 0 THEN a.ssum + p.punct
           |         WHEN a.ssum < 0 THEN a.ssum - p.punct
           |         ELSE a.ssum END AS sump,
           |    CASE WHEN a.pos0 > abs(a.neg0) THEN a.pos0 + p.punct
           |         ELSE a.pos0 END AS posp,
           |    CASE WHEN a.pos0 < abs(a.neg0) THEN a.neg0 - p.punct
           |         ELSE a.neg0 END AS negp,
           |    a.neu
           |  FROM agg a JOIN pu p USING (doc_id)),
           |r AS (
           |  SELECT doc_id, posp, negp, neu,
           |    posp + abs(negp) + neu AS total,
           |    greatest(-1.0, least(1.0,
           |      sump / sqrt(sump * sump + 15.0))) AS comp
           |  FROM m)
           |SELECT d.doc_id,
           |  coalesce(CASE WHEN r.total <> 0
           |    THEN floor(abs(r.negp) / r.total * 1000 + 0.5) / 1000 END,
           |    0.0) + 0.0 AS negative,
           |  coalesce(CASE WHEN r.total <> 0
           |    THEN floor(r.neu / r.total * 1000 + 0.5) / 1000 END,
           |    0.0) + 0.0 AS neutral,
           |  coalesce(CASE WHEN r.total <> 0
           |    THEN floor(r.posp / r.total * 1000 + 0.5) / 1000 END,
           |    0.0) + 0.0 AS positive,
           |  coalesce(CASE WHEN r.total <> 0
           |    THEN floor(r.comp * 10000 + 0.5) / 10000 END, 0.0) + 0.0
           |    AS compound
           |FROM documents d LEFT JOIN r USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      },
      "q50a_lexicon_sentiment" -> {
        // the full lexicon as a VALUES literal — same trick as q41's
        // hyperplanes: engine constants are replayable in SQL
        val values = graft.functions.Vader.lexiconEntries
          .map { case (w, v) => s"('${w.replace("'", "''")}',$v)" }
          .mkString(",")
        s"""WITH lex AS (
           |  SELECT w, CAST(v AS DOUBLE) AS v FROM (VALUES $values) t(w, v)),
           |tok AS (
           |  SELECT doc_id, lower(t) AS raw
           |  FROM (SELECT doc_id,
           |          unnest(regexp_split_to_array(text, '\\s+')) AS t
           |        FROM documents)
           |  WHERE length(t) > 1),
           |st AS (
           |  SELECT doc_id, raw,
           |    regexp_replace(raw,
           |      '^[^\\p{L}\\p{N}]+|[^\\p{L}\\p{N}]+$$', '', 'g') AS stripped
           |  FROM tok),
           |sc AS (
           |  SELECT s.doc_id, coalesce(lr.v, ls.v) AS v
           |  FROM st s
           |  LEFT JOIN lex lr ON s.raw = lr.w
           |  LEFT JOIN lex ls ON s.stripped = ls.w)
           |SELECT doc_id, count(v) AS n_hits,
           |  round(sum(v), 4) + 0.0 AS lex_sum
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
      "q51_demojize" ->
        """SELECT doc_id, text AS demojized
          |FROM documents ORDER BY doc_id""".stripMargin,
      // E1 deterministic projection: the date parse collapses to a
      // second-truncated ts (the parse rules are oracled by q20-q22) and
      // hashtags to the one planted '#<event_type>' tag.
      "q52_twitter_pipeline" ->
        """SELECT CAST(event_id AS VARCHAR) AS tweet_id,
          |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS created_at,
          |  event_type AS trend,
          |  event_type AS hashtags
          |FROM events ORDER BY tweet_id""".stripMargin,
      // E2 deterministic projection: the comment slices, the cross-comment
      // bigram keyword chain (demojize is identity on this emoji-free
      // corpus — asserted by q51), and the constant created date.
      "q53_reddit_pipeline" -> {
        val c1 = TextOps.cleanTextSqlOn("substr(text, 1, 200)")
        val c2 = TextOps.cleanTextSqlOn("substr(text, 201, 10000)")
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(str_split($c1, ' '), t -> t NOT IN $stops)
           |    || list_filter(str_split($c2, ' '), t -> t NOT IN $stops) AS tk
           |  FROM documents),
           |idx AS (
           |  SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks),
           |pairs AS (
           |  SELECT doc_id, least(tk[i], tk[i+1]) AS a,
           |         greatest(tk[i], tk[i+1]) AS b FROM idx),
           |counts AS (
           |  SELECT doc_id, a, b, count(*) AS c FROM pairs GROUP BY doc_id, a, b),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, a ASC, b ASC) AS rk FROM counts),
           |top AS (SELECT * FROM ranked WHERE rk <= 5),
           |flat AS (
           |  SELECT doc_id, rk*2+1 AS ord, a AS w FROM top
           |  UNION ALL SELECT doc_id, rk*2+2, b FROM top),
           |dedup AS (
           |  SELECT doc_id, w, min(ord) AS ord FROM flat GROUP BY doc_id, w),
           |kw AS (
           |  SELECT doc_id, string_agg(w, ' ' ORDER BY ord) AS keywords
           |  FROM dedup GROUP BY doc_id)
           |SELECT CAST(d.doc_id AS VARCHAR) AS id,
           |  'doc ' || d.doc_id || ' from ' || d.source AS title,
           |  TIMESTAMP '2024-03-01 12:00:00' AS created,
           |  CAST(d.n_chars % 1000 AS INT) AS score,
           |  kw.keywords
           |FROM documents d LEFT JOIN kw ON kw.doc_id = d.doc_id
           |ORDER BY id""".stripMargin
      },
      // E3 deterministic projection: seen-link anti-join (doc_id % 10),
      // TF top-10 tags over the tag-stripped content (= text), and the
      // date branch collapsed to its constant results (the parse rules
      // themselves are oracled by q20-q22).
      "q54_rss_pipeline" ->
        s"""WITH fresh AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
           |tok AS (
           |  SELECT doc_id, unnest(list_filter(
           |    str_split_regex(lower(text), '[^a-z0-9'']+'),
           |    t -> t <> '' AND t NOT IN $stops)) AS t
           |  FROM fresh),
           |counts AS (
           |  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, t ASC) AS rk FROM counts),
           |tags AS (
           |  SELECT doc_id, string_agg(t, ' ' ORDER BY rk) AS tags
           |  FROM ranked WHERE rk <= 10 GROUP BY doc_id)
           |SELECT 'https://feeds.example/' || f.doc_id AS link,
           |  'article ' || f.doc_id AS title,
           |  CASE WHEN f.doc_id % 2 = 1 THEN TIMESTAMP '2024-03-04 10:30:00'
           |       WHEN f.doc_id % 4 = 0 THEN TIMESTAMP '2024-03-04 09:30:00'
           |       ELSE TIMESTAMP '2024-03-04 10:30:00' END AS published,
           |  tags.tags
           |FROM fresh f LEFT JOIN tags ON tags.doc_id = f.doc_id
           |ORDER BY link""".stripMargin,
      // Full replay of the sentence-scored summary (Summarize
      // .summaryColWith): TF tags as in q54, kws = tags ∪ title tokens,
      // sentences split AFTER [.!?]+whitespace (DuckDB's RE2 has no
      // lookbehind, so the split point is materialized as a chr(1)
      // separator first — identical pieces as long as text lacks \x01),
      // score = |distinct sentence tokens ∩ kws|, top-5 by (score desc,
      // pos asc) re-emitted in document order. Feed summaries
      // (doc_id % 3 = 0) win over the computed one, HTML-stripped.
      "q54b_rss_summary" ->
        s"""WITH fresh AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
           |tok AS (
           |  SELECT doc_id, unnest(list_filter(
           |    str_split_regex(lower(text), '[^a-z0-9'']+'),
           |    t -> t <> '' AND t NOT IN $stops)) AS t
           |  FROM fresh),
           |counts AS (
           |  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, t ASC) AS rk FROM counts),
           |tags AS (
           |  SELECT doc_id, list(t ORDER BY rk) AS tags
           |  FROM ranked WHERE rk <= 10 GROUP BY doc_id),
           |kw AS (
           |  SELECT f.doc_id,
           |    coalesce(tags.tags, CAST([] AS VARCHAR[])) ||
           |      list_filter(str_split_regex(
           |          lower('article ' || f.doc_id), '[^a-z0-9'']+'),
           |        t -> t <> '' AND t NOT IN $stops) AS kws
           |  FROM fresh f LEFT JOIN tags ON tags.doc_id = f.doc_id),
           |sraw AS (
           |  SELECT doc_id, unnest(sl) AS s0,
           |    generate_subscripts(sl, 1) AS rawpos
           |  FROM (SELECT doc_id,
           |          str_split(regexp_replace(text,
           |            '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)) AS sl
           |        FROM fresh)),
           |sents AS (
           |  SELECT doc_id, trim(s0) AS sent,
           |    row_number() OVER (PARTITION BY doc_id
           |                       ORDER BY rawpos) AS pos
           |  FROM sraw WHERE trim(s0) <> ''),
           |scored AS (
           |  SELECT s.doc_id, s.pos, s.sent,
           |    len(list_distinct(list_filter(
           |      list_filter(str_split_regex(lower(s.sent), '[^a-z0-9'']+'),
           |        t -> t <> '' AND t NOT IN $stops),
           |      t -> list_contains(k.kws, t)))) AS score
           |  FROM sents s JOIN kw k ON s.doc_id = k.doc_id),
           |top AS (
           |  SELECT doc_id, sent, pos,
           |    row_number() OVER (PARTITION BY doc_id
           |                       ORDER BY score DESC, pos ASC) AS rk
           |  FROM scored),
           |csum AS (
           |  SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS cs
           |  FROM top WHERE rk <= 5 GROUP BY doc_id)
           |SELECT 'https://feeds.example/' || f.doc_id AS link,
           |  CASE WHEN f.doc_id % 3 = 0 THEN 'summary of ' || f.doc_id
           |       ELSE coalesce(c.cs, '') END AS summary
           |FROM fresh f LEFT JOIN csum c ON c.doc_id = f.doc_id
           |ORDER BY link""".stripMargin,
    )
  }
}
