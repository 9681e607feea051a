package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the NEAREST as-of enrichment (q351): attribute
  * every purchase to the user's closest click on EITHER side, ties to
  * the earlier one, bounded by a tolerance — pandas merge_asof
  * direction='nearest' as a stream. Completes the online as-of family
  * with the hybrid state shape: backward (StreamingAsOf) holds one
  * remembered click, forward (StreamingAsOfForward) buffers the
  * question; nearest needs BOTH — each purchase snapshots its backward
  * candidate and then waits, but only as long as a future click could
  * still BEAT that candidate: the per-purchase deadline is
  * ts + min(backward_gap, tolerance), after which any arriving click
  * is provably farther (or out of bound), so the event-time timeout
  * resolves it backward-if-in-bound. A gap-0 co-timed click resolves
  * immediately (nothing beats zero; ties go backward anyway).
  *
  * All gap arithmetic runs in exact MICROSECONDS reconstructed from
  * the Timestamp (ms·1000 + nanos-derived sub-ms), matching the batch
  * operator's micros tolerance — millisecond math could flip a
  * within-1ms-of-boundary pair the other way. Deadlines re-quantize
  * up to the next ms (+1) for the timeout clock, which only ever
  * DELAYS resolution — never changes the answer.
  *
  * State per user: one remembered click + the pending purchases inside
  * one tolerance window — bounded by purchase rate × tolerance.
  * Round13Spec proves stream ≡ batch q351 row-for-row across a 3-batch
  * event-time split. */
object StreamingAsOfNearest {
  import StreamingAsOf.{AsOfOut, Ev}

  case class PendB(event_id: Long, ts: Timestamp, value: Double,
      bTs: Option[Timestamp], bValue: Option[Double])
  case class NearState(cTs: Option[Timestamp], cValue: Option[Double],
      pending: List[PendB])

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  def apply(events: Dataset[Ev], toleranceUs: Long): Dataset[AsOfOut] = {
    implicit val stateEnc = Encoders.product[NearState]
    implicit val outEnc = Encoders.product[AsOfOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[NearState]) =>
          val out = Seq.newBuilder[AsOfOut]
          var st = state.getOption.getOrElse(NearState(None, None, Nil))
          def bGapUs(p: PendB): Long =
            p.bTs.map(b => micros(p.ts) - micros(b))
              .getOrElse(Long.MaxValue)
          def deadlineMs(p: PendB): Long = {
            val waitUs = math.min(bGapUs(p), toleranceUs)
            // ceil to the next ms + 1: only delays, never re-answers
            p.ts.getTime + waitUs / 1000L + 2L
          }
          def resolveBackward(p: PendB): AsOfOut =
            if (p.bTs.isDefined && bGapUs(p) <= toleranceUs)
              AsOfOut(p.event_id, user, p.value, p.bTs, p.bValue)
            else AsOfOut(p.event_id, user, p.value, None, None)
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val (due, live) = st.pending.partition(deadlineMs(_) <= wm)
            due.sortBy(p => (p.ts.getTime, p.event_id))
              .foreach(p => out += resolveBackward(p))
            st = st.copy(pending = live)
          } else {
            val sorted = batch.toSeq.sortBy(e =>
              (e.ts.getTime, e.ts.getNanos,
                if (e.event_type == "click") 0 else 1, e.event_id))
            sorted.foreach { e =>
              if (e.event_type == "click") {
                // this click is the FIRST at-or-after every buffered
                // purchase: forward gap vs snapshotted backward gap,
                // smaller wins, ties → backward, tolerance on the
                // chosen side only
                val (due, live) =
                  st.pending.partition(p => !e.ts.before(p.ts))
                due.sortBy(p => (p.ts.getTime, p.event_id)).foreach { p =>
                  val f = micros(e.ts) - micros(p.ts)
                  val b = bGapUs(p)
                  out += (if (b <= f) resolveBackward(p)
                  else if (f <= toleranceUs)
                    AsOfOut(p.event_id, user, p.value,
                      Some(e.ts), Some(e.value))
                  else AsOfOut(p.event_id, user, p.value, None, None))
                }
                val newer = st.cTs.forall(c => !e.ts.before(c))
                st = st.copy(
                  cTs = if (newer) Some(e.ts) else st.cTs,
                  cValue = if (newer) Some(e.value) else st.cValue,
                  pending = live)
              } else if (e.event_type == "purchase") {
                val p = PendB(e.event_id, e.ts, e.value, st.cTs, st.cValue)
                if (bGapUs(p) == 0L) out += resolveBackward(p)
                else st = st.copy(pending = st.pending :+ p)
              }
            }
          }
          if (st.cTs.isDefined || st.pending.nonEmpty) {
            state.update(st)
            if (st.pending.nonEmpty)
              state.setTimeoutTimestamp(st.pending.map(deadlineMs).min)
          } else if (state.exists) state.remove()
          out.result().iterator
      }
  }
}
