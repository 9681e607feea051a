package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

/** Keyed upsert ("latest version wins") — the complement of
  * IdempotentSink's insert-only unique index. The reference's sinks only
  * ever insert (DuplicateKeyError → drop, reference
  * src/twitter_consumer.py:116-119); a real lake also needs the
  * update-in-place half, which on immutable parquet is a MERGE: union
  * current state with the incoming batch and keep, per key, the row with
  * the highest version.
  *
  * Scale posture: merge is one window (or, with the TopKWindowRule
  * installed, one bounded-heap aggregate) partitioned by the key —
  * shuffle of state+batch, O(1) state per key, no driver participation.
  * At lake scale you'd partition the table and rewrite only affected
  * partitions (dynamic partition overwrite); the merge semantics below
  * are unchanged by that.
  */
object UpsertSink {

  /** Latest-version-wins merge of `updates` into `existing`. Both frames
    * must share a schema including `versionCol`; ties on version fall to
    * the tieBreak columns (pass none and a tie picks arbitrarily, like
    * two same-key racing writers). */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val all = existing.unionByName(updates)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc +: tieBreak.map(col(_).asc): _*)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Merge `batch` into the parquet table at `path` and rewrite it.
    * Full-table rewrite — honest for a single-file test lake; partition
    * the table and use dynamic partition overwrite to make this
    * incremental at scale. */
  def upsert(batch: DataFrame, path: String, keys: Seq[String],
      versionCol: String): Unit = {
    val spark = batch.sparkSession
    val merged =
      if (pathExists(spark, path))
        merge(spark.read.parquet(path), batch, keys, versionCol)
      else merge(batch.limit(0), batch, keys, versionCol)
    // parquet overwrite deletes-then-writes the source being read:
    // materialize through a staging dir, then swap
    val staging = path.stripSuffix("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(staging),
      new org.apache.hadoop.fs.Path(path))
  }

  /** Partition-scoped upsert: merge `batch` into a `partCol`-partitioned
    * parquet table, reading and rewriting ONLY the partitions the batch
    * touches. This is the upsert that scales — untouched partitions are
    * never read, never written, their files bit-identical after the
    * operation (asserted in StorageSpec). The batch's partition list is
    * collected to the driver, which is metadata-scale by definition
    * (distinct partition values, not rows). */
  def upsertPartitioned(batch: DataFrame, path: String, keys: Seq[String],
      versionCol: String, partCol: String): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!pathExists(spark, path)) {
      merge(batch.limit(0), batch, keys, versionCol)
        .write.partitionBy(partCol).parquet(path)
      return
    }
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val existing = spark.read.parquet(path)
      .filter(col(partCol).isInCollection(touched))
      // partition-read frames carry partCol last; align to batch schema
      .select(batch.columns.map(col): _*)
    val staging = path.stripSuffix("/") + "__staging"
    merge(existing, batch, keys, versionCol)
      .write.partitionBy(partCol).mode("overwrite").parquet(staging)
    touched.foreach { v =>
      val leaf = s"$partCol=$v"
      fs.delete(new org.apache.hadoop.fs.Path(path, leaf), true)
      fs.rename(new org.apache.hadoop.fs.Path(staging, leaf),
        new org.apache.hadoop.fs.Path(path, leaf))
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  /** foreachBatch adapter: every micro-batch MERGEs into the keyed
    * table — the streaming complement of IdempotentSink's append-only
    * writer. Replayed batches are harmless (stale versions lose). */
  def foreachBatchUpserter(path: String, keys: Seq[String],
      versionCol: String): (DataFrame, Long) => Unit =
    (batch, _) => upsert(batch, path, keys, versionCol)

  private def pathExists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
