package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the AS-OF enrichment (q27 compositional / q334
  * native): attribute every purchase to the user's LATEST click at or
  * before it, as the events ARRIVE — the online form of the operator,
  * for the serving/feature path where the batch join's answer is
  * needed per event, not per run.
  *
  * State per user is ONE (ts, value) pair — the O(1)-per-key mirror of
  * AsOfJoinExec's single buffered right row, so the state store scales
  * with the active-user set, never the event volume. Within a
  * micro-batch, events replay in event-time order with clicks sorting
  * before co-timed purchases (q27's side ordering; click ties broken
  * by event_id so "latest" is deterministic); across batches the state
  * carries the last click forward, which is exactly what makes a
  * purchase in batch N match a click from batch 1. Late (out-of-order
  * ACROSS batches) clicks older than the stored one are ignored — the
  * same answer the batch join gives once all data is in, provided the
  * stream is batch-monotone in event time (the StreamingSpec twin
  * proof splits the corpus by time terciles).
  *
  * StreamingSpec proves stream ≡ batch q27 row-for-row across a
  * 3-batch split of the real events table. */
object StreamingAsOf {

  case class Ev(user_id: Long, ts: Timestamp, event_type: String,
      event_id: Long, value: Double)
  // the full Timestamp rides in state (getTime floors to millis — a
  // micro-precision click time must survive the round trip intact)
  case class LastClick(ts: Timestamp, value: Double)
  case class AsOfOut(event_id: Long, user_id: Long, value: Double,
      click_ts: Option[Timestamp], click_value: Option[Double])

  def apply(events: Dataset[Ev]): Dataset[AsOfOut] = {
    implicit val stateEnc = Encoders.product[LastClick]
    implicit val outEnc = Encoders.product[AsOfOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[LastClick]) =>
          // iterator order within a micro-batch is not guaranteed:
          // replay in event-time order (nanos included), clicks before
          // co-timed purchases (q27's side ordering), click ties by
          // event_id
          val sorted = batch.toSeq.sortBy(e =>
            (e.ts.getTime, e.ts.getNanos,
              if (e.event_type == "click") 0 else 1, e.event_id))
          var last = state.getOption.orNull
          val out = Seq.newBuilder[AsOfOut]
          sorted.foreach { e =>
            if (e.event_type == "click") {
              if (last == null || !e.ts.before(last.ts))
                last = LastClick(e.ts, e.value)
            } else if (e.event_type == "purchase") {
              out += (if (last != null)
                AsOfOut(e.event_id, user, e.value,
                  Some(last.ts), Some(last.value))
              else AsOfOut(e.event_id, user, e.value, None, None))
            }
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }
}
