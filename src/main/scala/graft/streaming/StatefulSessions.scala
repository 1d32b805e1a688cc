package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom sessionization state machine via flatMapGroupsWithState —
  * SURVEY.md §7.5's "custom state" surface (the declarative
  * `session_window` twin lives in Streams.sessionWindows; this is the
  * imperative-state path for session logic a built-in window can't express,
  * e.g. value-dependent gaps or per-session caps).
  *
  * Emission contract (`sessions`, NoTimeout): a session is emitted the
  * moment an event closes it (arrives ≥ gap after the session's last
  * event). The group's final session stays open in state and is
  * intentionally withheld in batch AND stream, so BATCH AND STREAM PRODUCE
  * IDENTICAL OUTPUT on the same input (StatefulSessionsSpec asserts this
  * against the gaps-and-islands SQL).
  *
  * Streaming-lifecycle contract (`sessionsFlushing`, EventTimeTimeout):
  * same transition function, plus each open session arms an event-time
  * timeout at lastUs + gap — when the watermark passes it, the session
  * flushes and its state is cleaned up. This is the variant a real
  * long-running stream deploys (no state leak, no withheld sessions);
  * StatefulSessionsSpec drives the watermark past every session and
  * asserts the flushed output equals the FULL gaps-and-islands result.
  *
  * Scale notes: state is one small record per (user, open session); rows
  * are sorted per user PER BATCH only (bounded by batch size, no global
  * sort); eager emission keeps state from accumulating closed sessions.
  */
object StatefulSessions {

  final case class SEvent(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000000

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** The state-transition function: fold this batch's (sorted) events into
    * the open session, emitting every session an event closes. */
  def sessionize(user: Long, rows: Iterator[SEvent],
                 state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // flush the open session when the watermark passes it
      val s = state.get
      state.remove()
      return Iterator.single(Session(user, s.startUs, s.lastUs, s.n, s.sum))
    }
    val evs = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
    val out = Vector.newBuilder[Session]
    var cur = state.getOption.orNull
    evs.foreach { e =>
      val t = micros(e.ts)
      if (cur == null) cur = SessionState(t, t, 1, e.value)
      else if (t - cur.lastUs > GapUs) {
        out += Session(user, cur.startUs, cur.lastUs, cur.n, cur.sum)
        cur = SessionState(t, t, 1, e.value)
      } else {
        // max(), not t: rows are sorted per batch but a LATER batch can
        // deliver an in-watermark straggler older than the open session's
        // end — overwriting lastUs would regress the session boundary and
        // re-arm the flush timeout too early
        cur = SessionState(math.min(cur.startUs, t), math.max(cur.lastUs, t),
          cur.n + 1, cur.sum + e.value)
      }
    }
    if (cur != null) state.update(cur)
    out.result().iterator
  }

  /** Apply on a batch OR streaming Dataset — identical logical semantics
    * (the batch run is the oracle for the streaming run). NoTimeout by
    * design: final sessions stay open so batch ≡ stream. */
  def sessions(events: Dataset[SEvent]): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val st = Encoders.product[SessionState]
    implicit val ke = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(sessionize)
  }

  /** `sessionize` + timeout arming: every still-open session schedules an
    * event-time timeout at its close boundary (lastUs + gap, in ms). A
    * fresh update always carries ts ≥ watermark (late rows are dropped
    * upstream), so the armed timestamp is strictly ahead of the watermark
    * as Spark requires. */
  def sessionizeFlushing(user: Long, rows: Iterator[SEvent],
                         state: GroupState[SessionState]): Iterator[Session] = {
    val out = sessionize(user, rows, state)
    if (state.exists)
      state.setTimeoutTimestamp(state.get.lastUs / 1000 + GapUs / 1000)
    out
  }

  /** Streaming deployment variant: watermark-driven final-session flush
    * (EventTimeTimeout). State for a user is removed the moment their last
    * session flushes — bounded state for unbounded streams. */
  def sessionsFlushing(events: Dataset[SEvent], delay: String = "0 seconds"): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val st = Encoders.product[SessionState]
    implicit val ke = Encoders.scalaLong
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(sessionizeFlushing)
  }
}
