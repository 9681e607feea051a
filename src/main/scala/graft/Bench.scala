package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Contract hardening (round-1 verdict #3/#6/#7):
  *  - the JSON line is the ONLY stdout this JVM writes — everything else
  *    (Spark launch chatter, stray printlns) is redirected to stderr;
  *  - the same line is also written to bench_out.json in the cwd so the
  *    driver can recover it even if the sbt wrapper pollutes stdout;
  *  - queries are materialized through the noop sink, not count(), so
  *    Catalyst can't prune unreferenced projections and under-measure
  *    pure-projection queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val stdout = System.out
    System.setOut(System.err) // everything but the final JSON → stderr
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.TopKWindowRule)
    // Warm the JVM/codegen paths once so the first timed query doesn't
    // absorb JIT + classloading cost (measured ~4s on the first query).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    // Two timed runs per query, minimum reported: the first pays plan +
    // codegen, and this host has bursty CPU-steal stalls that can inflate
    // any single run 10-60× (measured) — min-of-two reports steady-state
    // execution, which is the number that scales to a real cluster.
    // r02 postmortem: a long stall can swallow BOTH runs (q39 reported
    // 106s; re-profiled at 0.95s), so any query whose min-of-two still
    // exceeds StallSuspectSec gets a third run — cheap insurance that only
    // triggers on the already-expensive outliers.
    val StallSuspectSec = 5.0
    // A failed query must not masquerade as a fast success (round-2
    // ADVICE): it reports value -1 and lands in the "failed" list.
    val results: Map[String, Double] = SparkEntry.queries.map {
      case (name, fn) =>
        def once(): Option[Double] = {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        }
        val two = Seq(once(), once()).flatten
        val best = two match {
          case Nil => -1.0
          case ts if ts.min > StallSuspectSec =>
            (once().toSeq ++ ts).min
          case ts => ts.min
        }
        name -> best
    }
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val note = "min of 2 noop-materialized runs per query (3 when min>5s: " +
      "host has bursty CPU-steal stalls); failed queries report -1 and " +
      "are excluded from the total"
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","note":"$note"}"""
    stdout.println(line)
    stdout.flush()
    try Files.writeString(Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
