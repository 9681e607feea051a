package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via flatMapGroupsWithState —
  * the stateful-op category (SURVEY.md §2.2) beyond what watermarked
  * dropDuplicates covers. Batch twin: TimeQueries.qSessionize (q26),
  * same 30-minute-gap semantics.
  *
  * State per user = the one open session (O(1) per key). A session is
  * emitted when a later event arrives past the gap — or when the
  * event-time watermark passes the session's idle deadline
  * (EventTimeTimeout): idle users are flushed AND their state evicted,
  * so state stays bounded by the set of users active within the
  * watermark horizon, not by all users ever seen. A flushed user who
  * returns restarts session numbering at 1 (their counter left with the
  * state) — the documented drift vs the batch twin's global numbering.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(sessionId: Long, startMs: Long, lastMs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  def apply(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    // EventTimeTimeout needs a watermark; on a batch Dataset withWatermark
    // is a no-op, so the same code serves the batch-equivalence test.
    val watermarked =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    def closeOut(user: Long, s: OpenSession): SessionOut =
      SessionOut(user, s.sessionId, s.n,
        new Timestamp(s.startMs), new Timestamp(s.lastMs))
    watermarked.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: no on-time event can extend
            // this session any more — flush it and evict the key
            val open = state.get
            state.remove()
            Iterator.single(closeOut(user, open))
          } else {
            // iterator order within a micro-batch is not guaranteed
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = collection.mutable.ListBuffer.empty[SessionOut]
            var open = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (open == null) {
                open = OpenSession(1L, t, t, 1L)
              } else if (t - open.lastMs > gapMs) {
                closed += closeOut(user, open)
                open = OpenSession(open.sessionId + 1, t, t, 1L)
              } else {
                open = open.copy(lastMs = math.max(open.lastMs, t), n = open.n + 1)
              }
            }
            if (open != null) {
              state.update(open)
              // the idle deadline; clamped to the watermark so a session
              // already past it times out on the next trigger rather
              // than throwing on set
              val deadline = open.lastMs + gapMs
              state.setTimeoutTimestamp(
                math.max(deadline, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
