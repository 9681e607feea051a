package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Emoji, SentimentOps, Summarize, TextOps}

/** The reference's three Faust worker topologies (SURVEY.md §3 E1-E3)
  * re-hosted as single fused DataFrame pipelines. Where the reference
  * round-trips every stage through a Kafka broker (serialize → network →
  * deserialize), these stages fuse into one codegen'd plan — the single
  * biggest architectural win of the re-host.
  *
  * Streaming variants: the same functions apply unchanged to a streaming
  * DataFrame (see graft.streaming.StreamPipelines) because they are pure
  * column transforms + one dropDuplicates.
  */
object TwitterPipeline {

  /** E1 (twitter_consumer.py): sentiment → demojize → hashtags → sink
    * prep. Order preserved: VADER sees the raw emoji text
    * (twitter_consumer.py:70 runs before :89). */
  def apply(tweets: DataFrame): DataFrame =
    tweets
      // S7 equivalent: the reference's rotating-file ingestion log
      // (ingestion_logger.py) becomes an observable metric on the flow —
      // queryable via QueryExecutionListener / StreamingQueryListener
      // instead of grepping log files.
      .observe("twitter_ingest", count(lit(1)).as("n_ingested"))
      .withColumn("sentiment", SentimentOps.vader(col("text")))
      .withColumn("text", Emoji.demojizeCol(col("text")))
      .withColumn("hashtags", TextOps.hashtags(col("text")))
      .withColumn("created_at",
        to_timestamp(col("created_at"), "yyyy-MM-dd HH:mm:ssZ"))
      .withColumn("insert_date", current_timestamp())
      .dropDuplicates("tweet_id") // unique index, twitter_consumer.py:44
}

object RedditPipeline {

  /** E2 (reddit_consumer.py): post+comment sentiment → demojize+clean
    * comments → cross-comment bigram keywords → sink prep.
    *
    * Comment enrichment needs two UDF calls per comment (VADER, demojize),
    * which can't run inside array-lambda transforms — so comments are
    * exploded once, enriched flat (codegen-friendly, parallel across all
    * comments of all posts), and regrouped in original order. One shuffle
    * on post id; at 100 TB this is the standard explode-enrich-regroup
    * shape and partial aggregation keeps the regroup cheap. */
  def apply(posts: DataFrame): DataFrame = {
    val spark = posts.sparkSession
    import spark.implicits._

    val withPostSentiment = posts
      // S7: ingestion-log parity (ingestion_logger.py) — same observable
      // metric the twitter flow has; queryable via QueryExecutionListener
      .observe("reddit_ingest", count(lit(1)).as("n_ingested"))
      .withColumn("sentiment", SentimentOps.vader($"title"))

    // explode → enrich each comment → regroup in original order
    val exploded = withPostSentiment
      .select($"id".as("_pid"), posexplode_outer($"comments").as(Seq("_pos", "_c")))
      .withColumn("_sent", SentimentOps.vader($"_c.text"))
      // VADER first (raw text), then demojize + clean_text
      // (reddit_consumer.py:112-116 before :129-132)
      .withColumn("_text", TextOps.cleanText(Emoji.demojizeCol($"_c.text")))
    val regrouped = exploded
      .groupBy($"_pid")
      .agg(array_sort(collect_list(struct($"_pos", $"_text", $"_sent"))).as("_cs"))
      .select($"_pid",
        transform($"_cs", c => struct(
          c.getField("_text").as("text"),
          c.getField("_sent").as("sentiment"))).as("comments"))

    val enriched = withPostSentiment.drop("comments")
      .join(regrouped, $"id" === $"_pid", "left").drop("_pid")

    // keywords: stopword-filter each comment, flatten ACROSS comments
    // (itertools.chain, reddit_consumer.py:149 — bigrams span comment
    // boundaries), adjacent unordered bigrams, per-post top-5, flatten
    // + order-preserving distinct (reddit_consumer.py:150-151)
    val tokens = flatten(transform($"comments",
      c => TextOps.dropStopwords(TextOps.tokenize(c.getField("text")))))
    val pairs = enriched
      .select($"id", explode(TextOps.adjacentBigrams(tokens)).as("p"))
      .groupBy($"id", $"p.a", $"p.b").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"c".desc, $"a".asc, $"b".asc)
    val kw = pairs.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .groupBy($"id")
      .agg(array_distinct(flatten(transform(
        array_sort(collect_list(struct($"rk", $"a", $"b"))),
        p => array(p.getField("a"), p.getField("b"))))).as("keywords"))

    enriched.join(kw, Seq("id"), "left")
      .withColumn("created",
        to_timestamp($"created", "yyyy-MM-dd HH:mm:ss"))
      .withColumn("insert_date", current_timestamp())
      // compound unique key (id, insert_date): append-versioned snapshots
      // (reddit_consumer.py:54-55)
      .dropDuplicates("id", "insert_date")
  }
}

object RssPipeline {

  /** Honest equivalent of BeautifulSoup get_text: strip tags. (The
    * reference's script/style removal is a no-op bug —
    * rss_consumer.py:108 builds a lazy map that is never consumed — so
    * tag-stripping IS its effective behavior.) */
  def stripHtml(c: Column): Column =
    regexp_replace(c, "<[^>]*>", "")

  /** E3 (rss_consumer.py): dedup vs seen links → content branch →
    * keywords/summary NLP → summary fill → sink prep.
    *
    * `seenLinks` replaces the reference's frozen in-memory list
    * (rss_consumer.py:60-65, including its refresh bug) with the intended
    * semantics: an anti-join against the sink's current link set — at
    * scale a parquet-side anti-join, never a driver-side collection.
    * The HTTP fetch (rss_consumer.py:82-84) is out of scope for a batch
    * engine: content arrives in the `content` column (see
    * graft.sources.HttpFetch for the pluggable stub). */
  def apply(feeds: DataFrame, seenLinks: DataFrame): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._

    val fresh = feeds.join(seenLinks.select($"link").distinct(),
      Seq("link"), "left_anti")
      // S7: ingestion-log parity — counts FRESH rows, i.e. what survives
      // the seen-link dedup (the number the reference's log line reports)
      .observe("rss_ingest", count(lit(1)).as("n_fresh"))
      // unique index (rss_consumer.py:53) applied BEFORE the NLP stages:
      // one row per link survives either way, and enriching post-dedup
      // avoids paying the keyword/summary cost for rows the sink drops
      .dropDuplicates("link")

    // branch F2: no content → treat content as HTML, strip tags
    val withContent = fresh.withColumn("content",
      when(length(coalesce($"content", lit(""))) === 0, $"content")
        .otherwise(when($"content".contains("<"), stripHtml($"content"))
          .otherwise($"content")))

    // TF tags the scalable way — explode → count → per-link top-10 window
    // — instead of the in-row quadratic keywordsCol: articles are
    // unbounded, and O(tokens²) per row degrades with document length
    // while this shape spreads each article across the cluster.
    val toks = withContent
      .select($"link", explode(Summarize.tfTokens($"content")).as("t"))
    val counts = toks.groupBy($"link", $"t").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"link").orderBy($"c".desc, $"t".asc)
    val tags = counts.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10)
      .groupBy($"link")
      .agg(transform(array_sort(collect_list(struct($"rk", $"t"))),
        p => p.getField("t")).as("tags"))

    // NLP: tags joined back (empty array for token-free content, matching
    // keywordsCol), sentence-scored summary reusing the same keyword set
    val withNlp = withContent
      .join(tags, Seq("link"), "left")
      .withColumn("tags",
        coalesce($"tags", array().cast("array<string>")))
      .withColumn("summary",
        when(length(coalesce($"summary", lit(""))) > 0, stripHtml($"summary"))
          .otherwise(Summarize.summaryColWith($"title", $"content", $"tags", 5)))

    // sink-time date logic (rss_consumer.py:158-164): published_parsed
    // 9-tuple wins; else dynamic %z-vs-%Z parse
    // Spark's post-3.0 parser refuses day-of-week fields in parse
    // patterns, so the "%a, " prefix is stripped before to_timestamp
    // (the reference's strptime consumes it with %a,
    // rss_consumer.py:163).
    val noDow = regexp_replace($"published", "^\\w+,\\s*", "")
    val tzTok = element_at(split($"published", " "), -1)
    val parsedPublished =
      when($"published_parsed".isNotNull && size($"published_parsed") >= 6,
        make_timestamp(
          element_at($"published_parsed", 1), element_at($"published_parsed", 2),
          element_at($"published_parsed", 3), element_at($"published_parsed", 4),
          element_at($"published_parsed", 5),
          element_at($"published_parsed", 6).cast("decimal(8,6)")))
      .otherwise(
        when(tzTok.rlike("\\d"),
          to_timestamp(noDow, "dd MMM yyyy HH:mm:ss Z"))
        .otherwise(to_timestamp(
          regexp_replace(noDow, "\\s+\\S+$", ""),
          "dd MMM yyyy HH:mm:ss")))

    withNlp
      .withColumn("published", parsedPublished)
      .withColumn("insert_date", current_timestamp())
      .dropDuplicates("link") // unique index, rss_consumer.py:53
  }
}
