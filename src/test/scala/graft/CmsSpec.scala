package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import graft.plans.CountMinSketchAgg

/** Count-min sketch: the laws that make a sketch shippable at 100 TB —
  * one-sided error (never undercounts), a bounded overcount, and
  * partitioning-invariant merge (map-side combine must be free to
  * reorder/regroup without changing a single counter). */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  val Depth = 4; val Width = 4096

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] = {
    import spark.implicits._
    df.select(GraftBridge.column(
        CountMinSketchAgg(GraftBridge.expression($"term"), Depth, Width)
          .toAggregateExpression()).as("sk"))
      .as[Array[Long]].head()
  }

  private def toks = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split($"text", " ")).as("term"))
  }

  test("cms: estimate >= exact for EVERY term, overcount within eps*N") {
    import spark.implicits._
    val sk = sketchOf(toks)
    val exact = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    def est(term: String): Long = (0 until Depth).map { d =>
      // replay the aggregate's hash chain via the native expression
      val b = spark.range(1).select(
        pmod(hash(lit(d), lit(term)), lit(Width))).as[Int].head()
      sk(d * Width + b)
    }.min
    var worst = 0L
    exact.foreach { case (t, c) =>
      val e = est(t)
      assert(e >= c, s"cms undercounted '$t': est $e < exact $c")
      worst = math.max(worst, e - c)
    }
    // eps = e/width ≈ 0.00066; with depth 4 the min-over-rows is far
    // inside it on any corpus this size
    assert(worst <= math.ceil(n * math.E / Width).toLong,
      s"overcount $worst above the eps*N bound (N=$n)")
    info(s"worst overcount $worst over ${exact.length} terms, N=$n")
  }

  test("cms: sketch is invariant to partitioning (merge is exact)") {
    val a = sketchOf(toks.repartition(1))
    val b = sketchOf(toks.repartition(32))
    assert(a.sameElements(b),
      "merge must make partitioning unobservable")
    assert(a.length == Depth * Width)
    assert(a.sum == Depth * toks.count(),
      "every token lands once per row")
  }

  test("cms as streaming state: per-batch sketches fold to the all-data sketch") {
    // The streaming frequency monitor: each micro-batch reduces to ONE
    // depth×width array, foreachBatch folds it into the running state by
    // elementwise add — O(1) state regardless of stream length, and the
    // fold is exact because merge is exact (no approximation stacking).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val state = new Array[Long](Depth * Width)
    val q = src.toDF().toDF("term")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset
          [org.apache.spark.sql.Row], _: Long) =>
        val sk = batch.select(GraftBridge.column(
            CountMinSketchAgg(GraftBridge.expression(
              org.apache.spark.sql.functions.col("term")), Depth, Width)
              .toAggregateExpression()).as("sk"))
          .as[Array[Long]].head()
        var i = 0
        while (i < state.length) { state(i) += sk(i); i += 1 }
        ()
      }
      .outputMode("append").start()
    try {
      src.addData("a", "b", "a")
      q.processAllAvailable()
      src.addData("a", "c")
      q.processAllAvailable()
      val expected = sketchOf(
        Seq("a", "b", "a", "a", "c").toDF("term"))
      assert(state.sameElements(expected),
        "streamed fold must equal the batch sketch over all data")
    } finally q.stop()
  }

  test("cms heavy hitters: q90 verdict true on all rows, top-20 by count") {
    import spark.implicits._
    val rows = graft.operators.QualityQueries
      .qCmsHeavyHitters(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._3), "cms_ok must hold on the top-20")
    assert(rows.map(-_._2).toSeq == rows.map(-_._2).toSeq.sorted,
      "rows ordered by exact count desc")
  }
}
