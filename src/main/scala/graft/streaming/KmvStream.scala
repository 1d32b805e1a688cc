package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING KMV distinct sketch — the `transformWithState` twin of the
  * batch `agg_kmv_distinct`/`agg_kmv_merge` pair, the mergeability story
  * run LIVE: an unbounded key stream is tracked with O(shards × k) state,
  * and after any micro-batch the union of shard sketches IS the KMV
  * sketch of everything seen so far — k smallest of a union of k-smallest
  * sets = k smallest of the union, exactly, so the streamed estimate
  * equals the batch entry's on the same input (KmvStreamSpec pins it).
  *
  * SHARDING CONTRACT: rows are keyed by `hash mod shards`, so every
  * occurrence of a VALUE lands in one shard — a shard's minima are the
  * true k smallest of its hash subspace, and the union argument above
  * holds. Sharding by arrival order would duplicate values across shards
  * (harmless for KMV — distinct-by-value — but would inflate state).
  *
  * Each micro-batch emits the shard's CURRENT sketch (monotone `n_seen`);
  * readers take the max-`n_seen` row per shard. State: ≤ k minima per
  * shard regardless of stream length; TimeMode.None — the sketch is
  * order-insensitive by construction and never needs event time. */
object KmvStream {

  /** One sharded hash observation (shard MUST be hash-derived). */
  case class HashRow(shard: Int, h: Long)

  /** A shard's k-minimum-values after some prefix of the stream. */
  case class ShardSketch(shard: Int, n_seen: Long, minima: Seq[Long])

  class KmvProcessor(k: Int)
    extends StatefulProcessor[Int, HashRow, ShardSketch] {

    // one state cell: (n_seen, k smallest distinct hashes so far)
    @transient private var st: ValueState[(Long, Seq[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[(Long, Seq[Long])]("kmv_state",
        Encoders.product[(Long, Seq[Long])], TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[HashRow],
                                 timerValues: TimerValues): Iterator[ShardSketch] = {
      val (n0, prev) = if (st.exists()) st.get() else (0L, Seq.empty[Long])
      var n = n0
      val batch = rows.map { r => n += 1; r.h }.toSeq
      // fold: the k smallest DISTINCT hashes seen so far — the KMV state
      val next = (prev ++ batch).distinct.sorted.take(k)
      st.update((n, next))
      Iterator.single(ShardSketch(shard, n, next))
    }
  }

  /** Per-shard sketches, one row per (shard, micro-batch). */
  def sketches(ds: Dataset[HashRow], k: Int = 256): Dataset[ShardSketch] = {
    implicit val ke = Encoders.scalaInt
    implicit val oe = Encoders.product[ShardSketch]
    ds.groupByKey(_.shard)
      .transformWithState(new KmvProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
