package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the lakehouse OPTIMIZE step. A 100 TB table
  * ingested by streaming micro-batches or per-partition upserts (the
  * reference's consumers write one batch per poll — reference
  * src/reddit_consumer.py:34-37 — which is exactly how splinter files
  * accumulate) ends up with thousands of KB-scale files, and every
  * downstream scan then pays one task + one footer read per file.
  * Compaction bin-packs a directory into ~targetBytes files, laid out by
  * range on a sort key so each output file covers a contiguous key range
  * and parquet footer min/max stats stay tight — data skipping keeps
  * working after the rewrite.
  *
  * File-count math uses the CURRENT compressed file sizes as the proxy
  * for output size — the standard heuristic (same data, same codec). The
  * listing is driver-side but metadata-scale: one FileStatus per file,
  * the same listing the scan itself performs. At lake scale this runs
  * per table-partition, not per table, so the repartition shuffle is
  * bounded by the partition being compacted, never the whole table.
  */
object Compaction {

  /** Compact `inDir` into `outDir` (overwrite); returns the target file
    * count. `repartitionByRange` is one full shuffle of the compacted
    * slice; `sortWithinPartitions` keeps rows ordered inside each file
    * so footer stats are minimal-width. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCol: String): Int = {
    val in = new Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(in)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
