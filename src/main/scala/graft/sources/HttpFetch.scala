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

  /** Real JDK-HttpClient fetcher (the production default): GET the link,
    * non-2xx or transport failure → None → row dropped, mirroring the
    * reference's ArticleException catch (rss_consumer.py:95-96). One
    * client per partition via the lazy val — connection pooling across a
    * partition's links. Exercised in SourcesSpec against a loopback
    * com.sun.net.httpserver instance (this container has no egress). */
  def http(timeoutMs: Long = 10000L): Fetcher = {
    lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    link =>
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(link))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() >= 200 && resp.statusCode() < 300)
          Some(resp.body())
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
  }

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
