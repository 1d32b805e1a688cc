package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING heavy hitters — the `transformWithState` twin of the batch
  * Misra–Gries pass in `TextAnalysis.heavyHitters`, closing the last
  * batch-only sketch: an unbounded token stream is tracked with O(shards ×
  * capacity) state, emitting after every micro-batch the candidate
  * superset an exact verification pass narrows to the true heavy hitters.
  *
  * SHARDING CONTRACT (what makes the guarantee survive distribution): the
  * stream is keyed by `hash(token) % shards`, so every occurrence of a
  * token lands in ONE shard's sketch. A token with global count
  * > n/(capacity+1) therefore has, in its own shard, count
  * > n/(capacity+1) ≥ n_shard/(capacity+1) — inside that shard's
  * Misra–Gries guarantee — so the UNION of shard candidates ⊇ the global
  * heavy hitters, with per-shard state unchanged at O(capacity). Sharding
  * by anything token-crossing (round-robin, arrival order) would split a
  * token's count across sketches and void the bound.
  *
  * The sketch math is NOT reimplemented: the processor folds the batch
  * `Aggregator`'s own pure `reduce`/`finish`
  * (graft.functions.MisraGries), so stream and batch candidates obey the
  * identical superset guarantee by construction — the spec proves the
  * exact-verified outputs coincide on the same input.
  *
  * Each micro-batch emits the shard's CURRENT summary (monotone `n_seen`);
  * readers take the max-`n_seen` row per shard as the final state. Scale:
  * state is shards × O(capacity) regardless of stream length; no timers,
  * no watermark requirement (TimeMode.None) — the sketch is
  * order-insensitive up to its ε bound and never needs event time. */
object HeavyHittersStream {

  /** One sharded token occurrence (shard MUST be hash(token)-derived —
    * see the sharding contract above). */
  case class Tok(shard: Int, token: String)

  /** A shard's sketch summary after some prefix of the stream. */
  case class ShardSummary(shard: Int, n_seen: Long, candidates: Seq[String])

  class HeavyHittersProcessor(capacity: Int)
    extends StatefulProcessor[Int, Tok, ShardSummary] {

    // the batch Aggregator, reused for its pure fold — one algorithm,
    // two execution surfaces
    private val mg = new graft.functions.MisraGries(capacity)

    @transient private var sketch: ValueState[(Long, Map[String, Long])] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[(Long, Map[String, Long])]("mg_sketch",
        Encoders.product[(Long, Map[String, Long])], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("n_seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[Tok],
                                 timerValues: TimerValues): Iterator[ShardSummary] = {
      var buf = if (sketch.exists()) sketch.get() else mg.zero
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { t => buf = mg.reduce(buf, t.token); n += 1 }
      sketch.update(buf)
      seen.update(n)
      Iterator.single(ShardSummary(shard, n, mg.finish(buf)))
    }
  }

  /** Candidate summaries per shard, one row per (shard, micro-batch). */
  def candidates(toks: Dataset[Tok], capacity: Int = 64): Dataset[ShardSummary] = {
    implicit val ke = Encoders.scalaInt
    implicit val oe = Encoders.product[ShardSummary]
    toks.groupByKey(_.shard)
      .transformWithState(new HeavyHittersProcessor(capacity),
        TimeMode.None(), OutputMode.Append())
  }
}
