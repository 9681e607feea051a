package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Streaming last-kept throttle via flatMapGroupsWithState — the
  * streaming twin of TimeQueries.qThrottleLastKept (q103): emit at most
  * one event per (user_id, event_type) per window, measured against the
  * last KEPT event.
  *
  * State per key = ONE long (the last kept event-time): the O(1)-state
  * form the batch query's per-key array fold cannot have — this is the
  * shape that runs forever on an unbounded feed. Eviction: once the
  * event-time watermark passes lastKept + window, any future on-time
  * event is necessarily kept, so the state says nothing anymore —
  * EventTimeTimeout removes it, keeping total state bounded by keys
  * active within one window+delay horizon, not all keys ever seen.
  *
  * Within a micro-batch events sort by (ts, event_id) before the fold
  * (iterator order is not guaranteed); ACROSS batches ordering holds for
  * on-time data under the watermark contract. A late event older than
  * the last kept time is dropped by the `t - last > windowMs` guard (it
  * can only be a duplicate-in-window under in-order semantics) — the
  * same one-sided late-data posture as dropDuplicatesWithinWatermark.
  */
object Throttle {

  case class Event(event_id: Long, user_id: Long, event_type: String,
      ts: Timestamp)
  case class KeptState(lastKeptMs: Long)

  def apply(events: Dataset[Event],
      windowMs: Long = 3600L * 1000,
      watermarkDelay: String = "1 hour"): Dataset[Event] = {
    implicit val stateEnc = Encoders.product[KeptState]
    implicit val outEnc = Encoders.product[Event]
    implicit val keyEnc = Encoders.product[(Long, String)]
    // evaluated ON THE DRIVER and captured as a plain Boolean: the
    // group function must not touch the Dataset (executor-side its
    // deserialized logicalPlan is null)
    val isStreaming = events.isStreaming
    val watermarked =
      if (isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    watermarked.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (_: (Long, String), batch: Iterator[Event],
            state: GroupState[KeptState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastKept + window: state is vacuous now
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var last = state.getOption.map(_.lastKeptMs)
            val kept = sorted.filter { e =>
              val t = e.ts.getTime
              val keep = last.forall(l => t - l > windowMs)
              if (keep) last = Some(t)
              keep
            }
            last.foreach { l =>
              state.update(KeptState(l))
              if (isStreaming)
                state.setTimeoutTimestamp(l + windowMs + 1)
            }
            kept.iterator
          }
      }
  }

  /** The SAME throttle on Spark 4's transformWithState — the
    * successor arbitrary-state API (SPARK-40434, GA in 4.0): typed
    * composable state variables (here one `ValueState[Long]` per key —
    * still O(1)), state-store-backed (requires the RocksDB provider),
    * with first-class event-time TIMERS replacing the old timeout
    * dance (TTL exists too, but only in processing-time mode): each
    * state update re-registers a watermark timer at lastKept + window;
    * when it fires the state can no longer suppress anything and is
    * dropped — the same eviction bound Throttle.apply encodes via
    * EventTimeTimeout, now with stale timers handled explicitly (a
    * timer set for an older lastKept must NOT clear fresher state).
    * StreamingSpec proves batch q103 ≡ flatMapGroupsWithState twin ≡
    * this, across a micro-batch split — the migration-safety proof a
    * production pipeline wants before moving state APIs. */
  class ThrottleProcessor(windowMs: Long)
      extends StatefulProcessor[(Long, String), Event, Event] {
    @transient private var lastKept: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastKept = getHandle.getValueState[Long]("lastKept",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Long, String),
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var last = if (lastKept.exists()) Some(lastKept.get()) else None
      val prior = last
      val kept = sorted.filter { e =>
        val t = e.ts.getTime
        val keep = last.forall(l => t - l > windowMs)
        if (keep) last = Some(t)
        keep
      }
      last.foreach { l =>
        lastKept.update(l)
        if (last != prior) {
          prior.foreach(p => getHandle.deleteTimer(p + windowMs + 1))
          getHandle.registerTimer(l + windowMs + 1)
        }
      }
      kept.iterator
    }

    override def handleExpiredTimer(key: (Long, String),
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Event] = {
      // only evict if this timer matches the CURRENT state's horizon —
      // a stale timer from an older lastKept must not drop fresh state
      if (lastKept.exists() &&
          expiredTimerInfo.getExpiryTimeInMs() >=
            lastKept.get() + windowMs + 1)
        lastKept.clear()
      Iterator.empty
    }
  }

  /** transformWithState driver: watermark + keyed state, mirroring
    * `apply`. Only valid on a streaming Dataset (the new API has no
    * batch execution path) under the RocksDB state-store provider. */
  def viaTransformWithState(events: Dataset[Event],
      windowMs: Long = 3600L * 1000,
      watermarkDelay: String = "1 hour"): Dataset[Event] = {
    implicit val outEnc = Encoders.product[Event]
    implicit val keyEnc = Encoders.product[(Long, String)]
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new ThrottleProcessor(windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
