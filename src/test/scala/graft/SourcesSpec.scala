package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{IdempotentSink, RecordSchemas}
import graft.pipelines.TwitterPipeline

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("JSON serde: FIXTURES-shaped tweet parses into typed columns and round-trips") {
    import spark.implicits._
    val raw = Seq(
      """{"tweet_id":"t1","text":"hello #x","created_at":"2022-04-01 12:30:00+0000",
        |"metrics":{"likes":"5"},"author":{"name":"alice"},"trend":"ml"}"""
        .stripMargin.replace("\n", "")).toDF("value")
    val parsed = RecordSchemas.parse(raw, "value", RecordSchemas.TweetSchema)
    val r = parsed.head()
    assert(r.getAs[String]("tweet_id") == "t1")
    assert(r.getAs[Map[String, String]]("author")("name") == "alice")
    assert(parsed.columns.toSet == RecordSchemas.TweetSchema.fieldNames.toSet)
    // typed record → JSON → typed record round-trip
    val back = RecordSchemas.parse(
      parsed.select(RecordSchemas.toJsonValue(struct(
        parsed.columns.map(col): _*)).as("value")),
      "value", RecordSchemas.TweetSchema)
    assert(back.head().getAs[String]("text") == "hello #x")
    // parsed records feed the pipeline directly (Kafka-source shape)
    assert(TwitterPipeline(parsed).count() == 1)
  }

  test("idempotent keyed sink: re-appending the same batch is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val b1 = Seq(("k1", "v1"), ("k2", "v2"), ("k2", "dup-in-batch"))
      .toDF("id", "payload")
    // deterministic within-batch survivor via tieBreak
    IdempotentSink.append(b1, dir, Seq("id"), tieBreak = Seq("payload"))
    assert(spark.read.parquet(dir).count() == 2)
    // same keys again + one new key
    val b2 = Seq(("k2", "replay"), ("k3", "v3")).toDF("id", "payload")
    IdempotentSink.append(b2, dir, Seq("id"))
    val rows = spark.read.parquet(dir).orderBy($"id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k1", "k2", "k3"))
    // k2 kept a batch-1 payload ("dup-in-batch" < "v2" lexicographically)
    // — the replay from batch 2 was dropped by the sink anti-join
    assert(rows(1).getString(1) == "dup-in-batch")
  }

  test("SparkSessionExtensions: injected functions resolve in SQL") {
    // getOrCreate reuses the shared test session and ignores
    // withExtensions, so apply the extensions object to it directly —
    // same injection path a fresh `.withExtensions(...)` build runs.
    org.apache.spark.sql.GraftBridge.applyExtensions(
      spark, new graft.plans.GraftExtensions)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d,2.0d), array(3.0d,4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
