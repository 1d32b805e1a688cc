package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` (SURVEY.md
  * §2.12 custom-aggregate surface; algorithm: Misra & Gries 1982, merge
  * rule per Agarwal/Cormode et al., "Mergeable Summaries", PODS 2012).
  *
  * State is O(capacity) per partition regardless of input size — the
  * frequent-items path at 100 TB, where an exact global `groupBy(token)`
  * would shuffle the whole corpus vocabulary. The sketch's guarantee:
  * every item with true frequency > n/(capacity+1) is in the final
  * candidate set (candidates ⊇ true heavy hitters; the summary may also
  * hold false positives, which a cheap exact second pass removes — see
  * `TextAnalysis.heavyHitters`, whose DuckDB hash-oracle therefore tests
  * this guarantee itself: a lost true heavy hitter = row mismatch).
  *
  * Buffer = (base, counts): the classic "decrement all" step is O(1) —
  * increment `base`, against which counts are interpreted as relative
  * (stored − base = true estimate); entries at or below `base` are dead
  * and compacted lazily only when a slot is needed. Merge re-bases both
  * sides to absolute estimates, sums, and applies the Mergeable-Summaries
  * rule: subtract the (capacity+1)-th largest estimate and drop ≤ 0.
  */
class MisraGries(capacity: Int)
  extends Aggregator[String, (Long, Map[String, Long]), Seq[String]] {

  override def zero: (Long, Map[String, Long]) = (0L, Map.empty)

  override def reduce(buf: (Long, Map[String, Long]),
                      x: String): (Long, Map[String, Long]) = {
    val (base, m) = buf
    m.get(x) match {
      case Some(v) => (base, m.updated(x, v + 1))
      case None =>
        // need a slot: first drop entries whose estimate hit zero
        val mc = if (m.size >= capacity) m.filter { case (_, v) => v > base } else m
        if (mc.size < capacity) (base, mc.updated(x, base + 1))
        else (base + 1, mc) // decrement-all; x's own count of 1 is consumed
    }
  }

  override def merge(a: (Long, Map[String, Long]),
                     b: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
    def abs(s: (Long, Map[String, Long])): Iterator[(String, Long)] =
      s._2.iterator.map { case (k, v) => k -> (v - s._1) }.filter(_._2 > 0)
    val comb = (abs(a) ++ abs(b)).foldLeft(Map.empty[String, Long]) {
      case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (comb.size <= capacity) (0L, comb)
    else {
      val d = comb.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      (0L, comb.iterator.map { case (k, v) => k -> (v - d) }
        .filter(_._2 > 0).toMap)
    }
  }

  /** Surviving candidate keys, sorted for a deterministic array (the SET
    * is partition-order-dependent; only its ⊇-true-heavy-hitters property
    * is guaranteed — downstream exact verification makes the final result
    * deterministic). */
  override def finish(buf: (Long, Map[String, Long])): Seq[String] =
    buf._2.collect { case (k, v) if v > buf._1 => k }.toSeq.sorted

  override def bufferEncoder: Encoder[(Long, Map[String, Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
