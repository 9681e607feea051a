package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the interval-overlap aggregate (q349): per day,
  * the count and mean overlap of concurrent (view-span, purchase-span)
  * pairs across different users — computed online as events arrive.
  *
  * State shape: the stream groups by DAY and each day's state
  * accumulates one [min, max] activity span per (user, type) — the
  * same (user, day, type) span frame the batch query aggregates, held
  * incrementally. A span is only FINAL when the day can see no more
  * events, so the event-time watermark timeout (armed at day end) is
  * what turns accumulated spans into the day's pair aggregate — the
  * streaming analogue of the batch groupBy's shuffle barrier. The
  * pair count inside one day's timeout is O(users_that_day²) — honest
  * for a per-day tumbling aggregate at fixture scale and the reason
  * the BATCH form (IntervalJoinRule's bucketed rewrite) remains the
  * 100 TB path: this twin demonstrates the state/timeout SHAPE
  * (accumulate-then-close), not the join strategy.
  *
  * Round14Spec proves stream ≡ batch q349 row-for-row across a
  * 3-batch event-time split. */
object StreamingInterval {
  import StreamingAsOf.Ev

  case class SpanRow(user_id: Long, tpe: String, t0: Long, t1: Long)
  case class DayOutLeft(day: String, n_pairs: Long, n_lonely: Long,
    mean_overlap_sec: java.lang.Double)
  /** `closed` is the day's TOMBSTONE: flatMapGroupsWithState does not
    * drop post-watermark rows, so without it an event arriving after
    * the day's timeout fired would re-create state and later emit a
    * SECOND, partial DayOut for the same day (duplicate day keys in
    * append mode — r14 ADVICE). Once a day closes, the tombstone
    * absorbs late re-openings and a second timeout GCs it. */
  case class DayState(spans: List[SpanRow], closed: Boolean = false)
  case class DayOut(day: String, n_pairs: Long, mean_overlap_sec: Double)

  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  private[streaming] def dayOf(ts: java.sql.Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  private[streaming] def dayEndMs(day: String): Long =
    java.time.LocalDate.parse(day).plusDays(1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli

  /** How long (event time) a closed day's tombstone lingers before
    * GC — generous vs any realistic watermark delay; one tiny state
    * row per day in the window, so the cost is nil. */
  private val TombstoneGraceMs = 7L * 24 * 3600 * 1000

  /** The shared day-keyed accumulate-then-close machine (round 16 —
    * factored out verbatim so [[apply]], [[left]] and the
    * StreamingSweep twins run ONE proven state discipline):
    *  - accumulate: fold each batch into per-(user, type) min/max
    *    spans, arm the close timeout at day end (or just past the
    *    watermark for a late re-open, so the arm is always legal);
    *  - close (first timeout): hand the day's final spans to `close`,
    *    leave a TOMBSTONE (not remove) so a late event cannot re-open
    *    the day and emit a duplicate;
    *  - tombstone: absorb post-close stragglers, GC at a second, far
    *    timeout.
    * `events` must carry a watermark on `ts` (the timeout clock) and
    * be pre-filtered to view/purchase. */
  private[streaming] def perDaySpans[O](events: Dataset[Ev])(
      close: (String, List[SpanRow]) => Iterator[O])(
      implicit outEnc: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    implicit val stateEnc = Encoders.product[DayState]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(e => dayOf(e.ts))
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (day: String, batch: Iterator[Ev], state: GroupState[DayState]) =>
          if (state.hasTimedOut && state.get.closed) {
            // tombstone GC: the day emitted long ago and no late
            // event re-opened it within the grace window — drop it
            state.remove()
            Iterator.empty
          } else if (state.hasTimedOut) {
            // the day is closed: every span is final — emit, then
            // leave the tombstone
            val spans = state.get.spans
            state.update(DayState(Nil, closed = true))
            state.setTimeoutTimestamp(
              math.max(dayEndMs(day), state.getCurrentWatermarkMs())
                + TombstoneGraceMs)
            close(day, spans)
          } else if (state.getOption.exists(_.closed)) {
            // late events for an already-emitted day: absorb them (the
            // at-most-once-per-day contract) and re-arm the GC timeout
            state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + TombstoneGraceMs)
            batch.foreach(_ => ())
            Iterator.empty
          } else {
            // fold the batch into per-(user, type) min/max spans
            var m = state.getOption.map(_.spans).getOrElse(Nil)
              .map(s => (s.user_id, s.tpe) -> (s.t0, s.t1)).toMap
            batch.foreach { e =>
              val k = (e.user_id, e.event_type)
              val t = micros(e.ts)
              val (lo, hi) = m.getOrElse(k, (t, t))
              m = m.updated(k, (math.min(lo, t), math.max(hi, t)))
            }
            state.update(DayState(m.toList.map { case ((u, tp), (lo, hi))
              => SpanRow(u, tp, lo, hi) }))
            // close the day when the watermark passes its end
            val end = dayEndMs(day)
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(end, wm + 1L))
            Iterator.empty
          }
      }
  }

  /** Streaming twin of the PRESERVED-SIDE interval aggregate (q367 /
    * q377): same day-keyed span state as [[apply]], but the close
    * emits the left-outer shape — every view span counts, the
    * unmatched ones as n_lonely, mean over matched pairs only (null
    * when none — the batch twin's exact contract). One more consumer
    * of the same accumulate-then-close state machine: outer-ness is
    * free at close time because the day's spans are all present. */
  def left(events: Dataset[Ev]): Dataset[DayOutLeft] = {
    implicit val outEnc = Encoders.product[DayOutLeft]
    perDaySpans(events) { (day, spans) =>
      val views = spans.filter(_.tpe == "view")
      val purchases = spans.filter(_.tpe == "purchase")
      var nPairs = 0L
      var nLonely = 0L
      var sum = 0L
      for (v <- views) {
        var m = 0L
        for (p <- purchases
             if v.user_id != p.user_id &&
               v.t0 <= p.t1 && p.t0 <= v.t1) {
          m += 1L
          sum += math.min(v.t1, p.t1) - math.max(v.t0, p.t0)
        }
        nPairs += m
        if (m == 0L) nLonely += 1L
      }
      if (views.isEmpty) Iterator.empty
      else Iterator(DayOutLeft(day, nPairs, nLonely,
        if (nPairs == 0L) null
        else java.lang.Double.valueOf(
          math.floor(sum.toDouble / nPairs / 100.0 + 0.5) / 1e4)))
    }
  }

  /** Streaming twin of the inner interval aggregate (q349): the close
    * aggregates the cross-user overlap pairs exactly as the batch
    * join does. The pair loop inside one day's close is
    * O(users_that_day²) — honest for a per-day tumbling aggregate at
    * fixture scale; StreamingSweep is the close that survives a dense
    * day. */
  def apply(events: Dataset[Ev]): Dataset[DayOut] = {
    implicit val outEnc = Encoders.product[DayOut]
    perDaySpans(events) { (day, spans) =>
      val views = spans.filter(_.tpe == "view")
      val purchases = spans.filter(_.tpe == "purchase")
      var n = 0L
      var sum = 0L
      for (v <- views; p <- purchases
           if v.user_id != p.user_id &&
             v.t0 <= p.t1 && p.t0 <= v.t1) {
        n += 1L
        sum += math.min(v.t1, p.t1) - math.max(v.t0, p.t0)
      }
      if (n == 0L) Iterator.empty
      else Iterator(DayOut(day, n,
        math.floor(sum.toDouble / n / 100.0 + 0.5) / 1e4))
    }
  }
}
