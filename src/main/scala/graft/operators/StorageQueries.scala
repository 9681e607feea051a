package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.{Tables, UpsertSink}

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

  private def fmtPath(dir: String, name: String): String =
    s"target/graft-fmt/${new java.io.File(dir).getName}-$name"

  /** CSV round-trip: write nation as headered CSV, read it back under
    * the ORIGINAL schema (no inference), values unchanged. */
  def qCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir)
    val path = fmtPath(dir, "nation-csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    s.read.schema(nation.schema).option("header", "true").csv(path)
      .orderBy("n_nationkey")
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
      "q56_csv_roundtrip" -> (qCsvRoundtrip _),
      "q57_json_roundtrip" -> (qJsonRoundtrip _),
      "q62_partition_pruning" -> (qPartitionPruning _),
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
    "q56_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
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
