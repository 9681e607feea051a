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

  test("HTTP fetch: real JDK client against a loopback server; failures drop") {
    import spark.implicits._
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        if (path.startsWith("/article/")) {
          val body =
            s"<html><body><p>served ${path.stripPrefix("/article/")}</p></body></html>"
              .getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        } else ex.sendResponseHeaders(404, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val feeds = Seq(
        (s"http://127.0.0.1:$port/article/a1", "t1"),
        (s"http://127.0.0.1:$port/article/a2", "t2"),
        (s"http://127.0.0.1:$port/missing/x", "t3"), // 404 → dropped (F4)
      ).toDF("link", "title")
      val got = graft.sources.HttpFetch
        .fetchContent(feeds, graft.sources.HttpFetch.http())
        .orderBy($"link").collect()
      assert(got.length == 2, "the 404 row must be dropped, not nulled")
      assert(got.map(_.getAs[String]("content")).toSeq ==
        Seq("<html><body><p>served a1</p></body></html>",
          "<html><body><p>served a2</p></body></html>"))
      assert(got.head.getAs[String]("title") == "t1") // other cols survive
    } finally server.stop(0)
  }

  test("Kafka wiring reaches source resolution (no connector jar here)") {
    // The container ships no spark-sql-kafka jar: building the stream must
    // fail at DATA_SOURCE_NOT_FOUND for "kafka" — proving the readStream
    // wiring is real and the failure is environmental, not structural.
    val e = intercept[Exception] {
      graft.sources.KafkaSource.tweets(spark, "broker:9092")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("Kafka sink wiring serializes key/value and reaches source resolution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val df = src.toDF().toDF("tweet_id", "text")
    val writer = graft.sources.KafkaSource
      .sinkWriter(df, "broker:9092", "tweets_out", "tweet_id")
    val e = intercept[Exception] { writer.start() }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("ingestion-log metrics: all three flows expose observed counts") {
    import spark.implicits._
    @volatile var seen = Map.empty[String, Long]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row) =>
          seen = seen + (name -> row.getLong(0))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.operators.PipelineQueries
        .queries("q53_reddit_pipeline")(spark, "/root/testdata/sf0.001")
        .count()
      graft.operators.PipelineQueries
        .queries("q54_rss_pipeline")(spark, "/root/testdata/sf0.001")
        .count()
      // listener delivery is async: poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while ((!seen.contains("reddit_ingest") || !seen.contains("rss_ingest"))
          && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.get("reddit_ingest").exists(_ > 0), seen.toString)
      assert(seen.get("rss_ingest").exists(_ > 0), seen.toString)
      // rss counts FRESH rows: the 10% seen links are already gone
      assert(seen("rss_ingest") == 450L, seen.toString)
    } finally spark.listenerManager.unregister(listener)
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
