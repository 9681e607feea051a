package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** The degenerate-corpus sweep (round-11 verdict #5): every round's
  * ADVICE class has been a grid/rounding/denominator edge on a data
  * shape the SF corpora never produce — zero variance, one source, a
  * single row (q293/q294/q301/q302 in round 11; FIFTEEN
  * divide-by-zero/slice/EM crashes found by this sweep's first run in
  * round 12, plus seven cross-engine NULL-vs-NaN divergences). This
  * spec pins the fix class structurally: on a 1-row corpus (one doc,
  * one source, one event — every series constant, every "rest" empty,
  * every variance zero) EVERY registered query must still
  *
  *  1. run to completion (no ANSI divide-by-zero, no negative slice,
  *     no head() on an empty frame), and
  *  2. publish FINITE-or-NULL numbers — NaN/Infinity in a double
  *     column is always a smuggled 0/0 that DuckDB renders
  *     differently, i.e. a latent oracle mismatch.
  *
  * The cross-engine value-level proof runs outside sbt (the DuckDB
  * oracle diff over the same 1-row corpus — 340/340 as of round 12);
  * this spec is the in-build guard that keeps the next degenerate
  * regression from compiling. */
class DegenerateSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def degenDir(n: Int): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_degen${n}_").toString
    for (t <- tables)
      spark.read.parquet(s"$src/$t.parquet").limit(n)
        .coalesce(1).write.parquet(s"$d/$t.parquet")
    d
  }

  private def sweep(dir: String): Seq[String] = {
    val failures = Seq.newBuilder[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, dir)
        val rows = df.collect()
        val dblCols = df.schema.fields.zipWithIndex.collect {
          case (f, i) if f.dataType == DoubleType ||
            f.dataType == FloatType => (f.name, i)
        }
        for (r <- rows; (cn, i) <- dblCols if !r.isNullAt(i)) {
          val v = r.get(i) match {
            case d: Double => d
            case fl: Float => fl.toDouble
          }
          if (v.isNaN || v.isInfinity)
            failures += s"$name: column '$cn' = $v (NaN/Inf leaked)"
        }
      } catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").linesIterator
            .take(1).mkString}"
      }
    }
    graft.operators.SessionCache.releaseAll(spark)
    failures.result()
  }

  test("every query survives the 1-row corpus with finite output") {
    val bad = sweep(degenDir(1))
    assert(bad.isEmpty,
      s"${bad.size} queries break on the 1-row corpus:\n" +
        bad.mkString("\n"))
  }

  /** Round-12 verdict #3: the next degenerate class is EMPTY input —
    * `head()` on an empty frame (q282's round-12 bug was exactly that
    * shape), seeds picked from empty frames, aggregates that publish
    * one NULL row where DuckDB publishes zero. Same
    * finite-or-NULL/no-crash contract over limit(0) tables. */
  test("every query survives the 0-row corpus with finite output") {
    val bad = sweep(degenDir(0))
    assert(bad.isEmpty,
      s"${bad.size} queries break on the empty corpus:\n" +
        bad.mkString("\n"))
  }
}
