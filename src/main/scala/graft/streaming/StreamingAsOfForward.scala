package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the FORWARD as-of enrichment (q350): attribute
  * every purchase to the user's NEXT click at-or-after it. The forward
  * direction inverts the state problem: backward (StreamingAsOf) holds
  * the answer BEFORE the question arrives (one remembered click);
  * forward must hold the QUESTION until its answer shows up — each
  * purchase buffers in state until the user's next click flushes it,
  * or the event-time watermark passes its horizon and it emits
  * unmatched. This is the canonical buffered-enrichment shape (join a
  * fact to the next future event) and the reason the operator needs an
  * explicit horizon in a stream: "the next click, whenever that is"
  * is an unbounded wait, so production semantics are q350 WITH a
  * `WITHIN horizon` tolerance — the watermark timeout IS the
  * tolerance.
  *
  * State per user = the pending purchases inside one horizon window —
  * bounded by per-user purchase rate × horizon, never by stream
  * length. Within a micro-batch events replay in event-time order with
  * purchases before co-timed clicks (a gap-0 click matches — l.t ≤
  * r.t); a click flushes every buffered purchase at-or-before it
  * (within the horizon ⇒ matched, past it ⇒ unmatched — the click
  * proves no nearer click existed). Timeout is pinned to the earliest
  * pending purchase + horizon and re-armed after every batch.
  *
  * Round13Spec proves stream ≡ batch q350 row-for-row across a 3-batch
  * event-time split (horizon wide enough that only never-clicked-again
  * purchases time out, exactly the batch join's null rows). */
object StreamingAsOfForward {
  import StreamingAsOf.{AsOfOut, Ev}

  case class PendingP(event_id: Long, ts: Timestamp, value: Double)
  case class Pending(ps: List[PendingP])

  /** `events` must carry a watermark on `ts` (the timeout clock).
    * `horizonMs` is the WITHIN bound in milliseconds. */
  def apply(events: Dataset[Ev], horizonMs: Long): Dataset[AsOfOut] = {
    implicit val stateEnc = Encoders.product[Pending]
    implicit val outEnc = Encoders.product[AsOfOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[Pending]) =>
          val out = Seq.newBuilder[AsOfOut]
          var pending: List[PendingP] =
            state.getOption.map(_.ps).getOrElse(Nil)
          if (state.hasTimedOut) {
            // watermark passed (earliest pending + horizon): everything
            // whose horizon is exhausted can no longer match any
            // arriving click — emit unmatched, keep the rest
            val wm = state.getCurrentWatermarkMs()
            val (dead, live) = pending.partition(
              _.ts.getTime + horizonMs < wm)
            dead.sortBy(p => (p.ts.getTime, p.event_id)).foreach(p =>
              out += AsOfOut(p.event_id, user, p.value, None, None))
            pending = live
          } else {
            // replay in event-time order, purchases before co-timed
            // clicks (gap-0 matches), ties by event_id
            val sorted = batch.toSeq.sortBy(e =>
              (e.ts.getTime, e.ts.getNanos,
                if (e.event_type == "purchase") 0 else 1, e.event_id))
            sorted.foreach { e =>
              if (e.event_type == "purchase")
                pending = pending :+ PendingP(e.event_id, e.ts, e.value)
              else if (e.event_type == "click") {
                // this click is the NEXT click for every buffered
                // purchase at-or-before it; in-horizon ⇒ matched,
                // beyond ⇒ provably unmatched (no nearer click existed)
                val (flushed, rest) =
                  pending.partition(p => !e.ts.before(p.ts))
                flushed.sortBy(p => (p.ts.getTime, p.event_id))
                  .foreach { p =>
                    if (e.ts.getTime - p.ts.getTime <= horizonMs)
                      out += AsOfOut(p.event_id, user, p.value,
                        Some(e.ts), Some(e.value))
                    else
                      out += AsOfOut(p.event_id, user, p.value,
                        None, None)
                  }
                pending = rest
              }
            }
          }
          if (pending.nonEmpty) {
            state.update(Pending(pending))
            state.setTimeoutTimestamp(
              pending.map(_.ts.getTime).min + horizonMs)
          } else if (state.exists) state.remove()
          out.result().iterator
      }
  }
}
