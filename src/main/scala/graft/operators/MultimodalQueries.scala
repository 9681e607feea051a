package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.functions.Multimodal
import graft.sources.Tables

/** Multimodal-column queries. The corpus has no media table, so opaque
  * binary payloads are synthesized from `documents`: every 3rd doc gets a
  * REAL (decodable) 4×3 grayscale PNG, every 3rd+1 a JPEG magic prefix
  * over text bytes (sniffs as jpeg, rejected by the decoder — the
  * corrupt-payload path), the rest raw text bytes — proving container
  * sniffing, byte-length metadata, and the real ImageIO decode
  * end-to-end, including its error isolation. */
object MultimodalQueries extends QueryModule {

  /** A complete 72-byte PNG: 4×3, 8-bit grayscale, scanlines
    * (0, 64, 128, 255) — so width/height/channels and the luma
    * histogram are known constants the DuckDB oracle can state. */
  private[graft] val TinyPngHex =
    "89504E470D0A1A0A0000000D4948445200000004000000030800000000919FF11A" +
    "0000000F49444154789C63607068F8CF002700227D053EE173D90000000000" +
    "49454E44AE426082"

  /** doc → opaque binary payload (deterministic). */
  private def payload(s: SparkSession) = {
    import s.implicits._
    when($"doc_id" % 3 === 0, unhex(lit(TinyPngHex)))
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

  /** REAL decode over the same payloads: PNG rows decode to known
    * constants (4×3, 1 channel, luma histogram summing to 12), corrupt
    * jpeg-magic and raw-text rows yield null metadata — every column is
    * a deterministic function of doc_id class, so the whole query is
    * DuckDB-oracled. */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id", payload(s).as("media"))
    Multimodal.decodeFeatures(media, "media", dim = 8, nFrames = 2)
      .select($"doc_id", $"width", $"height", $"channels",
        size($"frames").cast("long").as("n_frames"),
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
      s"""WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN unhex('$TinyPngHex')
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
    // q61: the engine really decodes; the oracle states the known
    // constants of the planted 4×3 grayscale PNG (decode succeeds only
    // there — jpeg-magic-over-text and raw text are rejected by every
    // reader) and replays sampleFrames' window-count arithmetic.
    "q61_media_features" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(4 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(3 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS INTEGER) END AS channels,
        |  CAST(CASE WHEN doc_id % 3 <> 2 THEN 2
        |       WHEN octet_length(encode(text)) = 0 THEN 0
        |       WHEN octet_length(encode(text)) = 1 THEN 1
        |       ELSE 2 END AS BIGINT) AS n_frames,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(12.0 AS DOUBLE) END AS feat_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
