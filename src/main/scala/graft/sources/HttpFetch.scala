package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructType}

/** S6 — the reference's side-effecting per-record HTTP article fetch
  * (rss_consumer.py:82-84: `Article(link).download(); .parse()`).
  *
  * Network I/O inside a relational operator is non-relational, so this is
  * the one deliberate `mapPartitions` in the engine: one fetcher per
  * partition (connection reuse), impure work isolated behind a pluggable
  * function. The container has no egress, so the default fetcher is a
  * deterministic stub — the Spark plumbing (schema evolution, encoder,
  * per-partition batching) is real and tested; swap `fetcher` for a real
  * HTTP client in production.
  */
object HttpFetch {
  /** link → fetched HTML (None = fetch failure → row dropped, mirroring
    * the reference's ArticleException catch, rss_consumer.py:95-96). */
  type Fetcher = String => Option[String]

  /** Deterministic offline stub. */
  val stub: Fetcher = link =>
    Some(s"<html><body><p>stub article body for $link</p></body></html>")

  /** Adds/fills the `content` column by fetching each row's `link`.
    * Rows whose fetch fails are dropped (dead-letter-as-drop, F4). */
  def fetchContent(df: DataFrame, fetcher: Fetcher = stub): DataFrame = {
    val inSchema = df.schema
    val linkIdx = inSchema.fieldIndex("link")
    val hasContent = inSchema.fieldNames.contains("content")
    val outSchema: StructType =
      if (hasContent) StructType(inSchema.map(f =>
        if (f.name == "content") f.copy(dataType = StringType) else f))
      else inSchema.add("content", StringType, nullable = true)
    val contentIdx = outSchema.fieldIndex("content")
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        fetcher(r.getString(linkIdx)).map { html =>
          val vals = new Array[Any](outSchema.length)
          var i = 0
          while (i < inSchema.length) { vals(i) = r.get(i); i += 1 }
          vals(contentIdx) = html
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }
  }
}
