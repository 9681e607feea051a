package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver's synthetic star schema
  * (repo:TESTDATA.md). One parquet file per table under the sf dir.
  *
  * Scale posture: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so callers should filter/select as
  * early as possible and let the optimizer do the rest. At 100 TB the same
  * code reads a partitioned parquet lake; nothing here assumes single-file
  * input.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and truncate to
    * microsecond precision (integer `div` — matches DuckDB's
    * timestamp_ns→timestamp cast, which also truncates).
    *
    * NOTE this sets `spark.sql.legacy.parquet.nanosAsLong` for the WHOLE
    * session, deliberately: the flag must be live whenever the (lazy)
    * scan actually executes, and any other nanos-timestamp parquet in the
    * session needs the same treatment to be readable at all. Sessions
    * that read nanos parquet with a different convention should use a
    * separate SparkSession. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
