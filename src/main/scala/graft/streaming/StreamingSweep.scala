package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming twin of the SWEEP-LINE interval aggregates (round-16
  * verdict #6): q376's per-day pair count + mean overlap and q382's
  * coverage/concurrency profile, computed online with the same
  * day-keyed accumulate-then-close state machine as StreamingInterval
  * (the c8a0818 watermark-close + tombstone discipline) — but the
  * CLOSE runs the endpoint SWEEP, never a pair loop:
  *
  *  - running active counts av/ap over the day's collapsed endpoint
  *    deltas (the ivRuns walk), segment integral ∫ av·ap dt for the
  *    overlap-micros sum (BigInt — the decimal-widening the batch
  *    sweep applies), coverage measures and peak pair density from
  *    the same walk;
  *  - per-view matched counts by the COMPLEMENT rule (#p0 ≤ v1 minus
  *    #p1 < v0, two sorted-array binary searches) and the same-user
  *    correction by direct lookup (≤1 span per (user, day, type)).
  *
  * Close cost is O(n log n) in the day's span count — the complexity
  * class the batch sweep pays — so this is the state machine whose
  * close survives a dense day at 100 TB, where StreamingInterval's
  * quadratic close (kept as the didactic naive twin) would not.
  * Round16Spec pins stream ≡ batch q376 / q382 row-for-row across a
  * 3-batch event-time split. */
object StreamingSweep {
  import StreamingAsOf.Ev
  import StreamingInterval.SpanRow

  case class DayAgg(day: String, n_pairs: Long, mean_overlap_sec: Double)
  case class DayCov(day: String, view_cov_us: Long, purch_cov_us: Long,
    joint_cov_us: Long, peak_pairs: Long)

  private case class Stats(nPairs: Long, nLonely: Long, sumUs: BigInt,
    viewCov: Long, purchCov: Long, jointCov: Long, peakPairs: Long)

  /** The in-close endpoint sweep over one day's final spans. */
  private def runSweep(spans: List[SpanRow]): Stats = {
    val views = spans.filter(_.tpe == "view")
    val purchases = spans.filter(_.tpe == "purchase")
    // endpoint deltas collapsed per t — the ivRuns (day, t) grouping
    val deltas = scala.collection.mutable.TreeMap.empty[Long, Array[Long]]
    def add(t: Long, dv: Long, dp: Long): Unit = {
      val a = deltas.getOrElseUpdate(t, Array(0L, 0L))
      a(0) += dv; a(1) += dp
    }
    views.foreach { v => add(v.t0, 1L, 0L); add(v.t1, -1L, 0L) }
    purchases.foreach { p => add(p.t0, 0L, 1L); add(p.t1, 0L, -1L) }
    val ts = deltas.keysIterator.toArray // ascending (TreeMap)
    var av = 0L; var ap = 0L
    var integ = BigInt(0)
    var vc = 0L; var pc = 0L; var jc = 0L; var peak = 0L
    var i = 0
    while (i < ts.length) {
      val d = deltas(ts(i)); av += d(0); ap += d(1)
      val seg = if (i + 1 < ts.length) ts(i + 1) - ts(i) else 0L
      if (seg > 0L) {
        integ += BigInt(av) * BigInt(ap) * BigInt(seg)
        if (av > 0L) vc += seg
        if (ap > 0L) pc += seg
        if (av > 0L && ap > 0L) jc += seg
        peak = math.max(peak, av * ap)
      }
      i += 1
    }
    // per-view matched counts: complement rule over the sorted
    // purchase endpoint arrays, then the same-user correction
    val p0s = purchases.map(_.t0).sorted.toArray
    val p1s = purchases.map(_.t1).sorted.toArray
    val pByUser = purchases.map(p => p.user_id -> p).toMap
    def countLe(a: Array[Long], x: Long): Long = {
      var lo = 0; var hi = a.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (a(m) <= x) lo = m + 1 else hi = m
      }
      lo.toLong
    }
    def countLt(a: Array[Long], x: Long): Long = {
      var lo = 0; var hi = a.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (a(m) < x) lo = m + 1 else hi = m
      }
      lo.toLong
    }
    var nPairs = 0L; var nLonely = 0L
    var sameUs = BigInt(0)
    views.foreach { v =>
      val same = pByUser.get(v.user_id)
        .filter(p => v.t0 <= p.t1 && p.t0 <= v.t1)
      val matched = countLe(p0s, v.t1) - countLt(p1s, v.t0) -
        (if (same.isDefined) 1L else 0L)
      nPairs += matched
      if (matched == 0L) nLonely += 1L
      same.foreach { p =>
        sameUs += BigInt(math.min(v.t1, p.t1) - math.max(v.t0, p.t0))
      }
    }
    Stats(nPairs, nLonely, integ - sameUs, vc, pc, jc, peak)
  }

  /** q376's streaming twin: per-day cross-user pair count + mean
    * overlap, days with zero pairs suppressed (the batch filter). */
  def apply(events: Dataset[Ev]): Dataset[DayAgg] = {
    implicit val outEnc = Encoders.product[DayAgg]
    StreamingInterval.perDaySpans(events) { (day, spans) =>
      val st = runSweep(spans)
      if (st.nPairs <= 0L) Iterator.empty
      else Iterator(DayAgg(day, st.nPairs,
        math.floor(st.sumUs.toDouble / st.nPairs / 100.0 + 0.5) / 1e4))
    }
  }

  /** q382's streaming twin: per-day coverage measures + peak pair
    * density — every day with any span emits (no pair requirement). */
  def coverage(events: Dataset[Ev]): Dataset[DayCov] = {
    implicit val outEnc = Encoders.product[DayCov]
    StreamingInterval.perDaySpans(events) { (day, spans) =>
      if (spans.isEmpty) Iterator.empty
      else {
        val st = runSweep(spans)
        Iterator(DayCov(day, st.viewCov, st.purchCov, st.jointCov,
          st.peakPairs))
      }
    }
  }
}
