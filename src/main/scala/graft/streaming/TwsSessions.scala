package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import StatefulSessions.{foldAtoms, GapUs, SEvent, Session, SessionState}

/** The SAME sessionizer on Spark 4's `transformWithState` — the successor
  * API to flatMapGroupsWithState (SPARK-40434, "arbitrary stateful
  * processing v2"). Both variants share the pure gaps-and-islands fold
  * (`StatefulSessions.foldAtoms`), so their outputs are identical by
  * construction; what this file demonstrates is the NEW lifecycle surface:
  *
  *  - typed state handles (`ValueState[SessionState]`) acquired in `init`
  *    instead of a GroupState parameter — state schema is declared up
  *    front, enabling RocksDB column families and state-schema evolution;
  *  - explicit event-time TIMERS (`registerTimer`/`deleteTimer`) instead
  *    of one implicit timeout per key — the processor re-arms a single
  *    flush timer at lastUs + gap on every update, and `handleExpiredTimer`
  *    flushes the open session when the watermark passes it (identical
  *    contract to `StatefulSessions.sessionsFlushing`);
  *  - per-key multi-state capability (a second state var tracks the armed
  *    timer so re-arming deletes the stale one — timers are not
  *    overwrite-on-register like setTimeoutTimestamp was).
  *
  * Requires the RocksDB state-store provider
  * (`spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`)
  * — transformWithState does not run on the default HDFS-backed store.
  * TwsSessionsSpec sets it for its session and proves this implementation
  * flush-for-flush equal to sessionsFlushing on the same input.
  *
  * Scale notes: identical to the v1 sessionizer — one small state record
  * per open (user, session) plus one timer; watermark-driven cleanup, so
  * unbounded streams hold bounded state.
  */
object TwsSessions {

  class SessionProcessor extends StatefulProcessor[Long, SEvent, Session] {
    @transient private var open: ValueState[SessionState] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[SessionState]("open_session",
        Encoders.product[SessionState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed_timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[SEvent],
                                 timerValues: TimerValues): Iterator[Session] = {
      val prev = if (open.exists()) Some(open.get()) else None
      val (closed, stillOpen) = foldAtoms(user, prev, rows.toArray)
      stillOpen match {
        case Some(cur) =>
          open.update(cur)
          // single-flush-timer contract: drop the stale timer, arm at the
          // session's close boundary CEILED to ms — flooring could fire up
          // to 999 µs early and flush a session an exactly-on-boundary
          // event would still merge into. Fresh updates carry ts ≥
          // watermark, so the new expiry is ahead of it as required.
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          val at = (cur.lastUs + GapUs + 999) / 1000
          getHandle.registerTimer(at)
          armed.update(at)
        case None =>
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          open.clear(); armed.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) return Iterator.empty // already flushed/closed
      val s = open.get()
      open.clear(); armed.clear()
      Iterator.single(Session(user, s.startUs, s.lastUs, s.n, s.sum))
    }
  }

  /** Streaming sessionization with watermark-driven flush on the
    * transformWithState API — the modern twin of
    * `StatefulSessions.sessionsFlushing`. */
  def sessions(events: Dataset[SEvent], delay: String = "0 seconds"): Dataset[Session] = {
    implicit val ke = Encoders.scalaLong
    implicit val se = Encoders.product[Session]
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
