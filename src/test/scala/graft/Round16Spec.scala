package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins: the streaming sweep twins (verdict #6) equal their
  * batch counterparts across a multi-batch event-time split, and the
  * durable-staged graph/truth frames change the read path, never the
  * answer. */
class Round16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def runSweepStream[O: org.apache.spark.sql.Encoder](
      name: String,
      mk: org.apache.spark.sql.Dataset[graft.streaming.StreamingAsOf.Ev]
        => org.apache.spark.sql.Dataset[O]): Seq[O] = {
    import spark.implicits._
    import graft.streaming.StreamingAsOf
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.sources.Tables.events(spark, sf)
      .filter($"event_type".isin("view", "purchase"))
      .select($"user_id", $"ts", $"event_type", $"event_id", $"value")
      .as[StreamingAsOf.Ev].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val n = evs.length
    val batches = Seq(evs.slice(0, n / 3), evs.slice(n / 3, 2 * n / 3),
      evs.slice(2 * n / 3, n))
    val far = new java.sql.Timestamp(
      evs.map(_.ts.getTime).max + 30L * 86400000L)
    val src = MemoryStream[StreamingAsOf.Ev]
    val q = mk(src.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        src.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      // two far ticks: advance the watermark past every real day so
      // the closes fire, then fire the tombstone GC path once too
      for (i <- 0 to 1) {
        src.addData(StreamingAsOf.Ev(-1L, far, "view", -1L - i, 0.0))
        q.processAllAvailable()
      }
      val farDay = far.toString.substring(0, 10)
      spark.table(name).as[O].collect().toSeq
        .filterNot(_.toString.contains(farDay))
    } finally q.stop()
  }

  test("streaming sweep twin ≡ batch q376 across a 3-batch split") {
    import spark.implicits._
    import graft.streaming.StreamingSweep
    implicit val enc = org.apache.spark.sql.Encoders
      .product[StreamingSweep.DayAgg]
    val got = runSweepStream("sweep_agg_out",
        StreamingSweep.apply _)
      .map(o => o.day -> ((o.n_pairs, o.mean_overlap_sec))).toMap
    val exp = graft.operators.TimeQueries
      .queries("q376_interval_sweep")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == exp, "streaming sweep must equal batch q376")
    assert(exp.nonEmpty)
  }

  test("streaming coverage twin ≡ batch q382 across a 3-batch split") {
    import spark.implicits._
    import graft.streaming.StreamingSweep
    implicit val enc = org.apache.spark.sql.Encoders
      .product[StreamingSweep.DayCov]
    val got = runSweepStream("sweep_cov_out",
        StreamingSweep.coverage _)
      .map(o => o.day -> ((o.view_cov_us, o.purch_cov_us,
        o.joint_cov_us, o.peak_pairs))).toMap
    val exp = graft.operators.TimeQueries
      .queries("q382_interval_coverage")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, "streaming coverage must equal batch q382")
    assert(exp.nonEmpty)
  }
}
