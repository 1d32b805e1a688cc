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

  private[streaming] def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** The pure gaps-and-islands fold shared by BOTH stateful APIs
    * (flatMapGroupsWithState here, transformWithState in TwsSessions):
    * merge the open session (if any) with this batch's events as interval
    * atoms, emit every closed session, return the still-open one. */
  private[streaming] def foldAtoms(user: Long, open: Option[SessionState],
      evs: Array[SEvent]): (Vector[Session], Option[SessionState]) = {
    val atoms = (open.toArray ++ evs.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
        val t = micros(e.ts); SessionState(t, t, 1, e.value)
      }).sortBy(a => (a.startUs, a.lastUs)) // stable: keeps event_id order on ties
    if (atoms.isEmpty) return (Vector.empty, None)
    val out = Vector.newBuilder[Session]
    var cur = atoms.head
    atoms.iterator.drop(1).foreach { a =>
      if (a.startUs - cur.lastUs > GapUs) {
        out += Session(user, cur.startUs, cur.lastUs, cur.n, cur.sum)
        cur = a
      } else {
        cur = SessionState(cur.startUs, math.max(cur.lastUs, a.lastUs),
          cur.n + a.n, cur.sum + a.sum)
      }
    }
    (out.result(), Some(cur))
  }

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
    // Gaps-and-islands over interval ATOMS (foldAtoms) — the open session
    // (if any) plus this batch's events — rather than a one-sided fold onto
    // the open session. This handles in-watermark stragglers on BOTH sides
    // of the open session: an event within the gap extends it (min/max
    // boundary), and an event more than GapUs BEFORE its start forms its
    // own earlier session (emitted immediately) instead of being silently
    // merged (round-2 advice). Known limit of eager emission: an emitted
    // session is final, so a LATER batch's straggler adjacent to an
    // already-emitted session stays split where the batch oracle would merge.
    val (closed, stillOpen) = foldAtoms(user, state.getOption, rows.toArray)
    stillOpen match {
      case Some(cur) => state.update(cur)
      case None      => if (state.exists) state.remove()
    }
    closed.iterator
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
    if (state.exists) // close boundary ceiled to ms (cf. TwsSessions timer)
      state.setTimeoutTimestamp((state.get.lastUs + GapUs + 999) / 1000)
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
