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
  /** events.parquet has shipped with two `ts` layouts across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long, truncate to micros with integer `div`,
    * matching DuckDB's timestamp_ns→timestamp cast) and plain
    * timestamp[us] (Spark reads it as TIMESTAMP_NTZ). Normalize both to
    * session-TZ TimestampType so every downstream query sees one type;
    * all our sessions pin `spark.sql.session.timeZone=UTC`, so the
    * NTZ→LTZ cast is value-identical to the old nanos conversion.
    *
    * NOTE this sets `spark.sql.legacy.parquet.nanosAsLong` for the WHOLE
    * session, deliberately: the flag must be live whenever the (lazy)
    * scan actually executes, and it is a no-op for non-nanos files. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
