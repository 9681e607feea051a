package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.{Compaction, Tables, UpsertSink}

/** Storage-surface operators: bloom-filter join reduction, keyed upsert
  * merge, and non-parquet format round-trips (CSV / JSON with enforced
  * schemas). The round-trips prove the engine can land and re-read the
  * interchange formats a 100 TB ingest actually meets (CSV drops, JSONL
  * event feeds) without changing a value — schema ON READ, never
  * inference, so a bad file fails loudly instead of silently retyping a
  * column.
  */
object StorageQueries extends QueryModule {

  /** Bloom pre-filtered selective join: revenue of lineitems belonging
    * to BUILDING-segment customers' orders. The bloom filter drops
    * non-matching lineitem rows before the join shuffle; the exact join
    * then removes the filter's false positives, so the result is
    * identical to the plain 3-way join the oracle runs. */
  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ords = Tables.orders(s, dir)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_orderpriority")
    val line = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val pre = BloomJoin.preFilter(line, $"l_orderkey",
      ords.select($"o_orderkey"), $"o_orderkey", expectedItems = 1000000L)
    pre.join(ords, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  /** Latest-version-wins upsert merge (UpsertSink.merge): every 10th
    * document gets a v1 rewrite (uppercased text); the merge must keep
    * exactly one row per doc_id — v1 where an update exists, v0
    * elsewhere. Output fingerprints the surviving text so the oracle
    * checks WHICH version won, not just the cardinality. */
  def qUpsertMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val existing = docs.select($"doc_id", $"text", lit(0L).as("version"))
    val updates = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", upper($"text").as("text"), lit(1L).as("version"))
    UpsertSink.merge(existing, updates, Seq("doc_id"), "version")
      .select($"doc_id", $"version", md5($"text").as("fp"))
      .orderBy($"doc_id")
  }

  /** SCD2 (type-2 slowly-changing-dimension) derivation — the
    * history-preserving sibling of q55's latest-wins merge, fed by the
    * same versioned updates: ALL versions are kept, each stamped
    * [valid_from, valid_to) by the next version's number, and the open
    * row (valid_to null) is current. One window shuffle keyed on doc_id
    * — the same key and shuffle the merge pays, so choosing history
    * over latest-wins costs nothing extra at 100 TB. */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val v0 = docs.select($"doc_id", $"text", lit(0L).as("version"))
    val v1 = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", upper($"text").as("text"), lit(1L).as("version"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"version")
    v0.unionByName(v1)
      .withColumn("valid_to", lead($"version", 1).over(w))
      .select($"doc_id", $"version".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"), md5($"text").as("fp"))
      .orderBy($"doc_id", $"valid_from")
  }

  private def fmtPath(dir: String, name: String): String =
    s"target/graft-fmt/${new java.io.File(dir).getName}-$name"

  /** Schema evolution read (q96): two parquet batches with DIFFERENT
    * schemas in one directory — the v1 ingest wrote (n_nationkey,
    * n_name), a later deploy added n_regionkey — read back under
    * `mergeSchema=true`: the unified schema appears, v1 rows surface the
    * new column as NULL, and no value changes. This is the lakehouse
    * fact of life (ingest code evolves mid-table); the alternative —
    * rewriting history on every schema change — is a 100 TB non-starter.
    * mergeSchema costs a footer read per file at planning time, which is
    * why it's opt-in: flip it on for evolving tables, keep static tables
    * on the cheap single-footer path. Oracle: union of the two halves
    * with an explicit NULL column. */
  def qMergeSchema(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = fmtPath(dir, "nation-evolving")
    val nation = Tables.nation(s, dir)
    nation.filter($"n_nationkey" % 2 === 0)
      .select($"n_nationkey", $"n_name")
      .write.mode("overwrite").parquet(path)
    nation.filter($"n_nationkey" % 2 === 1)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .write.mode("append").parquet(path)
    s.read.option("mergeSchema", "true").parquet(path)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .orderBy($"n_nationkey")
  }

  /** Table checksum (q97): one order-independent fingerprint per
    * language partition — count + XOR of a per-row 60-bit md5-derived
    * value over the full row content. XOR is commutative/associative and
    * never overflows, so the aggregate is partitioning-invariant by
    * algebra (any executor layout, any merge order, same checksum) and
    * costs one map pass + a groups-sized reduce. This is the
    * reconciliation primitive a 100 TB replication/migration uses:
    * compare per-partition checksums, re-ship only partitions that
    * disagree — never diff rows across datacenters. */
  def qTableChecksum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Every field rides through coalesce(…, "<null>"): concat_ws silently
    // SKIPS nulls (('a',NULL,'b') and ('a','b',NULL) would collide, and
    // DuckDB's || would instead null the whole fingerprint) — the sentinel
    // makes both engines serialize NULL identically and keeps distinct
    // null-patterns distinct.
    def f(c: org.apache.spark.sql.Column) =
      coalesce(c.cast("string"), lit("<null>"))
    val rowFp = conv(substring(md5(concat_ws("|",
      f($"doc_id"), f($"lang"), f($"source"), f($"n_chars"),
      f(md5($"text")))), 1, 15),
      16, 10).cast("long")
    Tables.documents(s, dir)
      .select($"lang", rowFp.as("fp"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(fp)").as("checksum"))
      .orderBy($"lang")
  }

  /** Small-file compaction round-trip: documents fragmented into 64
    * splinter files (the post-streaming-ingest state), bin-packed to
    * ~256 KB range-laid-out files, re-read. The oracle checks content
    * identity — compaction must be a pure layout change; StorageSpec
    * asserts the actual file-count math and the contiguous per-file
    * key ranges that keep parquet data skipping alive. */
  def qCompaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frag = fmtPath(dir, "docs-fragmented")
    val packed = fmtPath(dir, "docs-compacted")
    val fragP = new org.apache.hadoop.fs.Path(frag)
    val fs = fragP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(fragP))
      Tables.documents(s, dir).repartition(64).write.parquet(frag)
    Compaction.compact(s, frag, packed,
      targetBytes = 256 * 1024, sortCol = "doc_id")
    s.read.parquet(packed)
      .select($"doc_id", $"lang", $"source", md5($"text").as("fp"))
      .orderBy($"doc_id")
  }

  /** CSV round-trip: write nation as headered CSV, read it back under
    * the ORIGINAL schema (no inference), values unchanged. */
  def qCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir)
    val path = fmtPath(dir, "nation-csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    s.read.schema(nation.schema).option("header", "true").csv(path)
      .orderBy("n_nationkey")
  }

  /** Z-order clustering code over (lang, n_chars) — the two-dimensional
    * extension of q65's single-key compaction layout. lang maps to a
    * numeric code arithmetically (no collected dictionary), both
    * dimensions fit 10 bits, and `ZOrder.zval` interleaves them into a
    * Morton code; range-partitioning files by this code keeps every
    * file tight in BOTH dimensions, so footer-stats skipping works for
    * filters on either column. The query emits the code per doc (the
    * oracle replays the interleave arithmetic exactly); the actual
    * file-layout effect — disjoint per-file zval ranges AND per-file
    * n_chars spans well below the global span — is asserted in
    * StorageSpec. */
  def qZOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val langCode =
      ((ascii(substring($"lang", 1, 1)) - 97) * 26 +
        (ascii(substring($"lang", 2, 1)) - 97)).cast("long")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"n_chars", langCode.as("lang_code"))
      .withColumn("zval", graft.sources.ZOrder.zval($"lang_code", $"n_chars", 10))
      .orderBy($"doc_id")
  }

  /** ORC round-trip — Spark's second columnar format, supported by the
    * same DataSource V2 scan machinery as parquet (vectorized read,
    * predicate pushdown, column pruning all apply). The oracle is the
    * original table: a format round-trip must be content-identity.
    * Doubles are rounded AFTER the read-back so the rounding can't mask
    * a lossy write. */
  def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val supplier = Tables.supplier(s, dir)
    val path = fmtPath(dir, "supplier-orc")
    supplier.write.mode("overwrite").orc(path)
    s.read.schema(supplier.schema).orc(path)
      .select($"s_suppkey", $"s_name", $"s_nationkey",
        round($"s_acctbal", 4).as("acctbal"))
      .orderBy($"s_suppkey")
  }

  /** JSON-lines round-trip: customer through ndjson and back, schema
    * enforced on read. */
  def qJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.customer(s, dir)
    val path = fmtPath(dir, "customer-json")
    customer.write.mode("overwrite").json(path)
    s.read.schema(customer.schema).json(path)
      .select($"c_custkey", $"c_name", $"c_nationkey",
        round($"c_acctbal", 4).as("acctbal"), $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Partition-pruned scan: documents re-landed as a lang-partitioned
    * parquet table (hive-style lang=… directories, written once per sf
    * dir), then queried for ONE language — the scan must touch only that
    * partition's files (plan shows `PartitionFilters`, asserted in
    * StorageSpec). At 100 TB partitioning on the dominant filter column
    * is the difference between reading 1/k of the lake and all of it. */
  def qPartitionPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = fmtPath(dir, "docs-by-lang")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      Tables.documents(s, dir).write.partitionBy("lang").parquet(path)
    s.read.parquet(path)
      .filter($"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
      .orderBy($"source")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q45_bloom_join"    -> (qBloomJoin _),
      "q55_upsert_merge"  -> (qUpsertMerge _),
      "q65_compaction"    -> (qCompaction _),
      "q66_scd2"          -> (qScd2 _),
      "q56_csv_roundtrip" -> (qCsvRoundtrip _),
      "q82_orc_roundtrip" -> (qOrcRoundtrip _),
      "q83_zorder" -> (qZOrder _),
      "q57_json_roundtrip" -> (qJsonRoundtrip _),
      "q62_partition_pruning" -> (qPartitionPruning _),
      "q96_merge_schema" -> (qMergeSchema _),
      "q97_table_checksum" -> (qTableChecksum _),
    )

  override def oracleSql: Map[String, String] = Map(
    "q45_bloom_join" ->
      """SELECT o.o_orderpriority,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4)
        |    AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,
    "q55_upsert_merge" ->
      """WITH all_rows AS (
        |  SELECT doc_id, text, 0 AS version FROM documents
        |  UNION ALL
        |  SELECT doc_id, upper(text) AS text, 1 AS version
        |  FROM documents WHERE doc_id % 10 = 0),
        |ranked AS (
        |  SELECT doc_id, text, version,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC)
        |      AS rn
        |  FROM all_rows)
        |SELECT doc_id, CAST(version AS BIGINT) AS version, md5(text) AS fp
        |FROM ranked WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // q65: compaction is a pure layout change — content identity
    "q65_compaction" ->
      """SELECT doc_id, lang, source, md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q66_scd2" ->
      """WITH all_rows AS (
        |  SELECT doc_id, text, 0 AS version FROM documents
        |  UNION ALL
        |  SELECT doc_id, upper(text) AS text, 1 AS version
        |  FROM documents WHERE doc_id % 10 = 0),
        |h AS (
        |  SELECT doc_id, version AS valid_from,
        |    lead(version) OVER (PARTITION BY doc_id ORDER BY version)
        |      AS valid_to,
        |    md5(text) AS fp
        |  FROM all_rows)
        |SELECT doc_id, CAST(valid_from AS BIGINT) AS valid_from,
        |  CAST(valid_to AS BIGINT) AS valid_to,
        |  valid_to IS NULL AS is_current, fp
        |FROM h ORDER BY doc_id, valid_from""".stripMargin,
    "q56_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "q96_merge_schema" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_nationkey % 2 = 0
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey
        |FROM nation WHERE n_nationkey % 2 = 1
        |ORDER BY n_nationkey""".stripMargin,
    "q97_table_checksum" ->
      """WITH fp AS (
        |  SELECT lang,
        |    ('0x' || substr(md5(
        |      coalesce(CAST(doc_id AS VARCHAR), '<null>') || '|'
        |        || coalesce(lang, '<null>') || '|'
        |        || coalesce(source, '<null>') || '|'
        |        || coalesce(CAST(n_chars AS VARCHAR), '<null>') || '|'
        |        || coalesce(md5(text), '<null>')),
        |      1, 15))::BIGINT AS fp
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(fp) AS checksum
        |FROM fp GROUP BY lang ORDER BY lang""".stripMargin,
    "q82_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  round(s_acctbal, 4) AS acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q83_zorder" -> {
      val z = graft.sources.ZOrder.zvalSql("lang_code", "n_chars", 10)
      s"""WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST((ascii(substr(lang, 1, 1)) - 97) * 26
        |      + (ascii(substr(lang, 2, 1)) - 97) AS BIGINT) AS lang_code
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, lang_code,
        |  CAST($z AS BIGINT) AS zval
        |FROM t ORDER BY doc_id""".stripMargin
    },
    "q57_json_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  round(c_acctbal, 4) AS acctbal, c_mktsegment
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q62_partition_pruning" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
