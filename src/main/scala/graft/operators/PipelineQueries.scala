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
    val counted = transform(array_distinct(toks), u =>
      struct((-size(filter(toks, t => t === u))).as("nc"), u.as("t")))
    val top5 = slice(array_sort(counted), 1, 5)
    Tables.documents(s, dir)
      .select($"doc_id", toks.as("toks"),
        array_join(transform(top5, x => x.getField("t")), " ").as("keywords"))
      .filter(size($"toks") > 0)
      .select($"doc_id", $"keywords")
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

  /** P3: demojize. The corpus is emoji-free, so the oracle asserts the
    * identity property (demojize(emoji-free) == input) — real emoji
    * behavior is pinned by EmojiSpec fixtures. */
  def qDemojize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", graft.functions.Emoji.demojizeCol($"text").as("demojized"))
      .orderBy($"doc_id")
  }

  /** E1 re-host: tweets synthesized from events. */
  def qTwitterPipeline(s: SparkSession, dir: String): DataFrame = {
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
      .drop("insert_date")
      .select($"tweet_id", $"text", $"created_at", $"trend",
        // array_join: the driver's pandas compare can't hash raw arrays
        array_join($"hashtags", " ").as("hashtags"),
        $"sentiment.compound".as("compound"))
      .orderBy($"tweet_id")
  }

  /** E2 re-host: posts synthesized from documents (comments = two slices
    * of the text so cross-comment bigrams exercise the chain). */
  def qRedditPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val posts = Tables.documents(s, dir).select(
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
    RedditPipeline(posts)
      .drop("insert_date")
      .select($"id", $"title", $"created", $"score",
        array_join($"keywords", " ").as("keywords"),
        $"sentiment.compound".as("compound"))
      .orderBy($"id")
  }

  /** E3 re-host: feeds synthesized from documents; every 10th link is
    * already "seen" and must be dropped by the anti-join. */
  def qRssPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val feeds = docs.select(
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
    val seen = feeds.filter(expr("CAST(substring(link, 23) AS BIGINT) % 10 = 0"))
      .select($"link")
    RssPipeline(feeds, seen)
      .drop("insert_date")
      .select($"link", $"title", $"published",
        array_join($"tags", " ").as("tags"), $"summary")
      .orderBy($"link")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_keywords_tf"     -> (qKeywordsTf _),
    "q18b_keywords_inrow" -> (qKeywordsTfInRow _),
    "q50_sentiment"       -> (qSentiment _),
    "q51_demojize"        -> (qDemojize _),
    "q52_twitter_pipeline" -> (qTwitterPipeline _),
    "q53_reddit_pipeline" -> (qRedditPipeline _),
    "q54_rss_pipeline"    -> (qRssPipeline _),
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
      "q51_demojize" ->
        """SELECT doc_id, text AS demojized
          |FROM documents ORDER BY doc_id""".stripMargin,
    )
  }
}
