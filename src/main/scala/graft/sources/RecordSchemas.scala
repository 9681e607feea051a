package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{from_json, to_json}
import org.apache.spark.sql.types._

/** The reference's record type surface (records.py:4-47) as explicit
  * StructTypes + the JSON serde each Kafka topic applies (serializer=json
  * on every Record class).
  *
  * Design note (SURVEY.md §1.3): the reference's schemas are
  * fixed-but-loose (e.g. `content: list` actually carries a str,
  * records.py:15 vs rss_consumer.py:85) — so these schemas encode the
  * *effective* types observed in the consumers, with every optional field
  * nullable. A Kafka source is then exactly:
  * `readStream.format("kafka") … select(fromJson($"value", TweetSchema))`.
  */
object RecordSchemas {

  /** sentiment dict shape (produced by P1: reddit_consumer.py:83-88). */
  val SentimentSchema: StructType = StructType(Seq(
    StructField("negative", DoubleType),
    StructField("neutral", DoubleType),
    StructField("positive", DoubleType),
    StructField("compound", DoubleType)))

  /** Tweet (records.py:23-32). metrics/author are open dicts → maps. */
  val TweetSchema: StructType = StructType(Seq(
    StructField("tweet_id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("created_at", StringType, nullable = false),
    StructField("metrics", MapType(StringType, StringType)),
    StructField("author", MapType(StringType, StringType)),
    StructField("trend", StringType, nullable = false),
    StructField("place", StringType),
    StructField("hashtags", ArrayType(StringType)),
    StructField("sentiment", SentimentSchema)))

  /** RedditPost (records.py:35-47); comments carry text + score and gain
    * a sentiment struct in-flight (reddit_consumer.py:116). */
  val RedditPostSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("author", MapType(StringType, StringType)),
    StructField("created", StringType, nullable = false),
    StructField("score", LongType),
    StructField("upvote_ratio", DoubleType),
    StructField("reddit", MapType(StringType, StringType)),
    StructField("domain", StringType),
    StructField("url", StringType),
    StructField("comments", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("score", LongType),
      StructField("sentiment", SentimentSchema))))),
    StructField("keywords", ArrayType(StringType)),
    StructField("sentiment", SentimentSchema)))

  /** RssFeed (records.py:4-16). published_parsed is the struct_time int
    * 9-tuple; content's *effective* type is string (article text). */
  val RssFeedSchema: StructType = StructType(Seq(
    StructField("feed_source", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("link", StringType, nullable = false),
    StructField("published", StringType),
    StructField("author", StringType),
    StructField("summary", StringType),
    StructField("published_parsed", ArrayType(IntegerType)),
    StructField("authors", ArrayType(StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("comments", StringType),
    StructField("content", StringType),
    StructField("source", MapType(StringType, StringType))))

  /** Kafka-topic JSON serde: value bytes → typed columns. */
  def fromJson(value: Column, schema: StructType): Column =
    from_json(value.cast("string"), schema)

  /** Typed record → JSON value for a Kafka sink. */
  def toJsonValue(record: Column): Column = to_json(record)

  /** Parse a DataFrame of raw JSON strings into typed records — the batch
    * twin of the Kafka source's deserialization step. */
  def parse(raw: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val parsed = raw.withColumn("_rec",
      fromJson(raw(jsonCol), schema))
    schema.fieldNames.foldLeft(parsed) { (df, f) =>
      df.withColumn(f, df("_rec").getField(f))
    }.drop("_rec", jsonCol)
  }
}
