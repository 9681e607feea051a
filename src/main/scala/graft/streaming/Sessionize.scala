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
  * emitted when a later event arrives past the gap; the open session
  * stays in state until then (production: add an event-time timeout to
  * flush and evict idle users — kept NoTimeout here so the semantics
  * under MemoryStream test are deterministic).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(sessionId: Long, startMs: Long, lastMs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  def apply(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          // iterator order within a micro-batch is not guaranteed
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          val closed = collection.mutable.ListBuffer.empty[SessionOut]
          var open = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (open == null) {
              open = OpenSession(1L, t, t, 1L)
            } else if (t - open.lastMs > gapMs) {
              closed += SessionOut(user, open.sessionId, open.n,
                new Timestamp(open.startMs), new Timestamp(open.lastMs))
              open = OpenSession(open.sessionId + 1, t, t, 1L)
            } else {
              open = open.copy(lastMs = math.max(open.lastMs, t), n = open.n + 1)
            }
          }
          if (open != null) state.update(open)
          closed.iterator
      }
  }
}
