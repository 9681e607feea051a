package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (north-star): media as opaque `binary` columns with
  * typed metadata.
  *
  * Two layers:
  *  - pure-expression metadata (`mediaMeta`): byte length + magic-number
  *    container sniffing — codegen'd, pushdown-friendly, oracle-able;
  *  - per-partition decode/feature plumbing (`decodeFeatures`): the shape
  *    a real image/audio decoder plugs into. The container has no media
  *    libraries, so the decoder is a STUB — a deterministic fake that
  *    hashes byte windows into a fixed-dim float vector — but the Spark
  *    side (schema evolution, row encoder, per-partition batching,
  *    constant memory per batch) is real and tested. Swap `decoder` for
  *    JAI/ffmpeg bindings in production.
  */
object Multimodal {

  /** Magic-number container detection over the first bytes (hex-encoded
    * prefix compare — works in both Spark and DuckDB for the oracle). */
  def mediaKind(bin: Column): Column = {
    val h = upper(hex(substring(bin, 1, 8)))
    when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("47494638"), "gif")
      .when(substring(h, 9, 8) === "66747970", "mp4") // ftyp at offset 4
      .when(h.startsWith("494433"), "mp3")
      .when(h.startsWith("52494646"), "riff") // wav/avi container
      .otherwise("unknown")
  }

  /** Typed metadata struct for an opaque media column. */
  def mediaMeta(bin: Column): Column =
    struct(
      length(bin).cast("long").as("n_bytes"),
      mediaKind(bin).as("kind"),
      md5(bin).as("digest"))

  /** bytes → fixed-dim feature vector. Deterministic STUB standing in for
    * a real decode+embed (no media libs in this container). */
  private[graft] def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dim) += (h % 1024) / 1024.0f
      i += 1
    }
    out
  }

  /** Frame sampling STUB: n evenly spaced byte windows standing in for
    * video frame extraction. */
  private[graft] def sampleFrames(bytes: Array[Byte], n: Int,
      frameLen: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length == 0 || n <= 0) return Seq.empty
    val step = math.max(1, bytes.length / n)
    (0 until n).flatMap { i =>
      val from = i * step
      if (from < bytes.length)
        Some(bytes.slice(from, math.min(from + frameLen, bytes.length)))
      else None
    }
  }

  /** Per-partition decode + feature extraction. Adds
    * `features array<float>` and `frames array<binary>`; preserves all
    * input columns. One decoder instance per partition (the expensive
    * init a real codec needs), constant memory per row batch. */
  def decodeFeatures(df: DataFrame, binCol: String, dim: Int = 16,
      nFrames: Int = 4, frameLen: Int = 32): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    val outSchema = inSchema
      .add("features", ArrayType(FloatType), nullable = false)
      .add("frames", ArrayType(BinaryType), nullable = false)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // real decoders initialize here, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+
          fakeFeatures(bytes, dim).toIndexedSeq :+
          sampleFrames(bytes, nFrames, frameLen))
      }
    }
  }
}
