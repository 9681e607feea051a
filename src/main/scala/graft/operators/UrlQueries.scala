package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** URL canonicalization + link-level dedup — the web-corpus form of the
  * reference's "seen links" semantics (S4/S5: the RSS flow drops
  * articles whose link already exists in the sink — reference
  * src/rss_consumer.py:47-53). A crawler sees the same article behind
  * many URL spellings: host-case variants, default ports, tracking
  * params, fragments, trailing slashes. Canonicalize first or every
  * downstream exact-dup key (q30's md5, the sink's unique index) treats
  * them as distinct documents.
  *
  * All steps are native regexp/string expressions — codegen'd, no UDF —
  * and each has an exact DuckDB mirror (patterns are RE2-safe: no
  * lookaround, no backrefs in the match). The corpus has no URL column,
  * so deterministic URLs are synthesized from documents the same way
  * the multimodal suite synthesizes payloads: consecutive doc_id pairs
  * share an article behind two different spellings, so the dedup must
  * find exactly one canonical per pair.
  */
object UrlQueries extends QueryModule {

  /** Canonicalize: lowercase scheme+authority, strip default ports,
    * drop fragment, drop utm_* tracking params, tidy leftover ?/&,
    * strip trailing slashes. Scheme-relative semantics: :443 only
    * drops on https, :80 only on http. */
  def canonicalUrl(url: Column): Column = {
    // authority = "scheme://host[:port]" — everything before the first
    // /, ? or # past the scheme
    val head = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val headNoPort =
      regexp_replace(
        regexp_replace(lower(head), "^(https://[^/?#:]*):443$", "$1"),
        "^(http://[^/?#:]*):80$", "$1")
    val pathPart = url.substr(length(head) + lit(1), lit(Int.MaxValue))
    val noFrag = regexp_replace(pathPart, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[^&#]*", "")
    // a surviving first param may now start with '&' — promote it to '?'
    val fixedQ = regexp_replace(noUtm, "^([^?]*)&", "$1?")
    val noTrail = regexp_replace(fixedQ, "/+$", "")
    concat(headNoPort, regexp_replace(noTrail, "\\?$", ""))
  }

  /** Deterministic URL variants: consecutive doc_id pairs (2k, 2k+1)
    * point at the same article; even ids carry tracking junk, caps and
    * a default port, odd ids are the clean spelling. */
  private def rawUrl(s: SparkSession): Column = {
    import s.implicits._
    val pair = ($"doc_id" - ($"doc_id" % 2)).cast("string")
    when($"doc_id" % 2 === 0,
      concat(lit("HTTPS://WWW."), upper($"source"), lit(".EXAMPLE.COM:443/item/"),
        pair, lit("/?utm_source=feed&utm_medium=rss&ref=home#top")))
      .otherwise(
        concat(lit("https://www."), $"source", lit(".example.com/item/"),
          pair, lit("/?ref=home")))
  }

  /** q69: canonicalize both spellings, dedup by canonical URL with
    * first-write-wins (min doc_id — the sink's unique-index rule).
    * Every pair must collapse to one canonical with exactly 2 variants.
    * Plan: map-only canonicalization, one partial-agg shuffle keyed on
    * the canonical string — the same shape as q30's exact dedup. */
  def qUrlDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", canonicalUrl(rawUrl(s)).as("canon"))
      .groupBy($"canon")
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_variants"))
      .orderBy($"keeper")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_url_dedup" -> (qUrlDedup _),
  )

  override def oracleSql: Map[String, String] = Map(
    // DuckDB mirror: same steps, RE2 replacement refs use \1 instead of
    // Java's $1 — semantics identical
    "q69_url_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM:443/item/'
        |        || CAST(doc_id - (doc_id % 2) AS VARCHAR)
        |        || '/?utm_source=feed&utm_medium=rss&ref=home#top'
        |    ELSE
        |      'https://www.' || source || '.example.com/item/'
        |        || CAST(doc_id - (doc_id % 2) AS VARCHAR) || '/?ref=home'
        |    END AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)
        |      AS head
        |  FROM raw),
        |canon AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(lower(head), '^(https://[^/?#:]*):443$', '\1'),
        |      '^(http://[^/?#:]*):80$', '\1')
        |    ||
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(substr(url, length(head) + 1),
        |              '#.*$', ''),
        |            '[?&]utm_[^&#]*', '', 'g'),
        |          '^([^?]*)&', '\1?'),
        |        '/+$', ''),
        |      '\?$', '') AS canon
        |  FROM parts)
        |SELECT canon, min(doc_id) AS keeper, count(*) AS n_variants
        |FROM canon GROUP BY canon ORDER BY keeper""".stripMargin,
  )
}
