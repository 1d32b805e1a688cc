package graft.streaming

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import StatefulSessions._

/** ScalaCheck properties for the sessionizer's pure transition fold —
  * randomized inputs catch boundary cases (exact-gap ties, equal
  * timestamps, empty batches, arbitrary batch cuts) that the example-based
  * specs can't enumerate. Runs without Spark: foldAtoms is pure.
  *
  * Values are small whole doubles, so sums are exact and equality is
  * strict — no tolerance needed. */
object FoldAtomsProps extends Properties("StatefulSessions.foldAtoms") {

  private val User = 7L
  private val Base = 1704067200000L // 2024-01-01 00:00 UTC, millis

  private def micros(t: Timestamp): Long = t.getTime * 1000

  private val genEvents: Gen[List[SEvent]] = for {
    n <- Gen.choose(0, 40)
    // offsets up to 8 gap-widths; ms resolution, duplicates allowed —
    // exact-gap boundaries (offset % gap == 0) occur with real probability
    offs <- Gen.listOfN(n, Gen.choose(0L, 8L * 30 * 60 * 1000))
  } yield offs.zipWithIndex.map { case (o, i) =>
    SEvent(i.toLong, new Timestamp(Base + o), User, (i % 7 + 1).toDouble)
  }

  private def asSessions(closed: Vector[Session], open: Option[SessionState]): Vector[Session] =
    closed ++ open.map(s => Session(User, s.startUs, s.lastUs, s.n, s.sum))

  /** Independent reference: plain single-pass gaps-and-islands over the
    * time-sorted events (strict `> GapUs` split, like the fold). */
  private def reference(evs: List[SEvent]): Vector[Session] = {
    if (evs.isEmpty) return Vector.empty
    val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
    val out = Vector.newBuilder[Session]
    var start = micros(sorted.head.ts); var last = start
    var n = 1L; var sum = sorted.head.value
    sorted.tail.foreach { e =>
      val t = micros(e.ts)
      if (t - last > GapUs) {
        out += Session(User, start, last, n, sum)
        start = t; last = t; n = 1; sum = e.value
      } else { last = math.max(last, t); n += 1; sum += e.value }
    }
    out += Session(User, start, last, n, sum)
    out.result()
  }

  property("single batch == reference gaps-and-islands") = forAll(genEvents) { evs =>
    val (closed, open) = foldAtoms(User, None, evs.toArray)
    asSessions(closed, open) == reference(evs)
  }

  property("time-ordered batch cuts == one batch") =
    forAll(genEvents, Gen.choose(1, 6)) { (evs, k) =>
      val sorted = evs.sortBy(e => (micros(e.ts), e.event_id))
      val batches =
        if (sorted.isEmpty) List(List.empty[SEvent])
        else sorted.grouped(math.max(1, sorted.size / k)).toList
      var open: Option[SessionState] = None
      val emitted = Vector.newBuilder[Session]
      batches.foreach { b =>
        val (c, o) = foldAtoms(User, open, b.toArray)
        emitted ++= c; open = o
      }
      val (c1, o1) = foldAtoms(User, None, sorted.toArray)
      asSessions(emitted.result(), open) == asSessions(c1, o1)
    }

  property("conservation under ANY delivery order") =
    forAll(genEvents, Gen.choose(1, 6),
           Gen.listOfN(41, Gen.choose(0, Int.MaxValue))) { (evs, k, prio) =>
      // adversarial delivery: shuffle events across batches (stragglers in
      // both directions); emitted session COUNTS may legitimately differ
      // from the oracle (documented eager-emission limit), but no event is
      // ever lost or double-counted and boundaries stay consistent
      val shuffled = evs.zipWithIndex.sortBy { case (_, i) => prio(i % prio.size) }.map(_._1)
      val batches =
        if (shuffled.isEmpty) List(List.empty[SEvent])
        else shuffled.grouped(math.max(1, shuffled.size / k)).toList
      var open: Option[SessionState] = None
      val emitted = Vector.newBuilder[Session]
      batches.foreach { b =>
        val (c, o) = foldAtoms(User, open, b.toArray)
        emitted ++= c; open = o
      }
      val all = asSessions(emitted.result(), open)
      all.map(_.n_events).sum == evs.size.toLong &&
        math.abs(all.map(_.sum_value).sum - evs.map(_.value).sum) < 1e-9 &&
        all.forall(s => s.start_us <= s.end_us)
    }
}
