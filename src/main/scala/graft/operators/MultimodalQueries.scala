package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.functions.Multimodal
import graft.sources.Tables

/** Multimodal-column queries. The corpus has no media table, so opaque
  * binary payloads are synthesized from `documents`: every 3rd doc gets a
  * PNG magic prefix, every 3rd+1 a JPEG prefix, the rest raw text bytes —
  * enough to prove container sniffing, byte-length metadata, and the
  * decode plumbing end-to-end. */
object MultimodalQueries extends QueryModule {

  /** doc → opaque binary payload (deterministic). */
  private def payload(s: SparkSession) = {
    import s.implicits._
    when($"doc_id" % 3 === 0, concat(unhex(lit("89504E470D0A1A0A")), $"text".cast("binary")))
      .when($"doc_id" % 3 === 1, concat(unhex(lit("FFD8FFE0")), $"text".cast("binary")))
      .otherwise($"text".cast("binary"))
  }

  /** Pure-expression media metadata (oracle-able). */
  def qMediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("media", payload(s))
      .select($"doc_id",
        length($"media").cast("long").as("n_bytes"),
        Multimodal.mediaKind($"media").as("kind"))
      .orderBy($"doc_id")
  }

  /** Decode/feature plumbing over the same payloads (stub decoder —
    * rows-only driver check; determinism + batch shape pinned by
    * MultimodalSpec). */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id", payload(s).as("media"))
    Multimodal.decodeFeatures(media, "media", dim = 8, nFrames = 2)
      .select($"doc_id",
        size($"frames").as("n_frames"),
        round(aggregate($"features", lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("feat_sum"))
      .orderBy($"doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_media_meta"     -> (qMediaMeta _),
    "q61_media_features" -> (qMediaFeatures _),
  )

  override def oracleSql: Map[String, String] = Map(
    "q60_media_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN unhex('89504E470D0A1A0A') || encode(text)
        |         WHEN doc_id % 3 = 1 THEN unhex('FFD8FFE0') || encode(text)
        |         ELSE encode(text) END AS media
        |  FROM documents)
        |SELECT doc_id,
        | CAST(octet_length(media) AS BIGINT) AS n_bytes,
        | CASE WHEN substr(upper(hex(media)), 1, 16) LIKE '89504E47%' THEN 'png'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE 'FFD8FF%' THEN 'jpeg'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE '47494638%' THEN 'gif'
        |      WHEN substr(upper(hex(media)), 9, 8) = '66747970' THEN 'mp4'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE '494433%' THEN 'mp3'
        |      WHEN substr(upper(hex(media)), 1, 16) LIKE '52494646%' THEN 'riff'
        |      ELSE 'unknown' END AS kind
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
