package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.streaming.StreamPipelines

/** The pipelines on a REAL streaming source available in this container:
  * the file source (directory of JSON-lines, schema enforced — the same
  * shape a Kafka topic's from_json lands in). Proves source-agnostic
  * wiring plus the durability contract MemoryStream can't: a checkpointed
  * query restarted over the same directory resumes from its offset log
  * and does not re-emit processed files. */
class FileStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType.fromDDL(
    "tweet_id STRING, text STRING, created_at STRING")

  private def writeBatch(dir: String, name: String, rows: Seq[String]): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, name), rows.mkString("\n") + "\n")

  test("twitter pipeline over a file stream, checkpointed restart resumes") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestream").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    writeBatch(in, "b1.json", Seq(
      """{"tweet_id":"t1","text":"great stuff #ok","created_at":"2024-01-01 10:00:00+0000"}""",
      """{"tweet_id":"t2","text":"bad news","created_at":"2024-01-01 10:01:00+0000"}"""))
    def run(): Unit = {
      val q = StreamPipelines
        .twitter(spark.readStream.schema(schema).json(in))
        .select($"tweet_id", $"sentiment.compound".as("compound"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    assert(spark.read.parquet(out).count() == 2)

    // second batch arrives; restart from the SAME checkpoint: only the
    // new file is processed, t1/t2 are not re-emitted
    writeBatch(in, "b2.json", Seq(
      """{"tweet_id":"t3","text":"more later","created_at":"2024-01-01 10:05:00+0000"}"""))
    run()
    val rows = spark.read.parquet(out)
      .select($"tweet_id").as[String].collect().sorted.toSeq
    assert(rows == Seq("t1", "t2", "t3"),
      s"restart must process exactly the new file, got $rows")
  }

  test("throttle state survives a checkpointed restart (last-kept carries over)") {
    import spark.implicits._
    import graft.streaming.Throttle
    val root = java.nio.file.Files
      .createTempDirectory("graft-throttle-restart").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val evSchema = StructType.fromDDL(
      "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP")
    def run(): Unit = {
      val src = spark.readStream.schema(evSchema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .json(in).as[Throttle.Event]
      val q = Throttle(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def ev(id: Long, t: String): String =
      s"""{"event_id":$id,"user_id":1,"event_type":"click","ts":"$t"}"""
    writeBatch(in, "b1.json", Seq(
      ev(1, "2024-01-01 10:00:00"),   // kept: first for the key
      ev(2, "2024-01-01 10:30:00")))  // dropped: 30 min after kept e1
    run()
    assert(spark.read.parquet(out).select($"event_id").as[Long]
      .collect().toSet == Set(1L))
    writeBatch(in, "b2.json", Seq(
      ev(3, "2024-01-01 10:50:00"),   // dropped ONLY IF lastKept=10:00
                                      // survived the restart
      ev(4, "2024-01-01 11:30:00")))  // kept: 90 min after kept e1
    run()
    val kept = spark.read.parquet(out).select($"event_id").as[Long]
      .collect().toSet
    assert(kept == Set(1L, 4L),
      s"state must carry last-kept across restart: got $kept " +
        "(e3 kept means the state store lost lastKeptMs)")
  }
}
