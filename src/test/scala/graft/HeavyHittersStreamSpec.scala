package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.HeavyHittersStream
import graft.streaming.HeavyHittersStream.{ShardSummary, Tok}

/** Streaming Misra–Gries (HeavyHittersStream) against the batch
  * heavy-hitter pipeline on the SAME document tokens: after exact
  * verification the two surfaces must produce the IDENTICAL heavy-hitter
  * set (candidate sets themselves are partition/arrival-order dependent —
  * only the ⊇-true-heavy-hitters guarantee is deterministic, so the spec
  * pins the guarantee plus the state bound, not raw candidate equality). */
class HeavyHittersStreamSpec extends SparkSpec {

  private val Shards = 8
  private val Capacity = 64

  /** The batch entry's tokenization, replicated (split on single spaces,
    * empties dropped) — equivalence only means anything on equal input. */
  private lazy val tokenRows: Seq[String] = {
    import spark.implicits._
    Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .as[String].collect().toSeq
  }

  test("stream-verified heavy hitters == batch-verified heavy hitters on the same tokens") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // token-derived sharding — the contract that keeps the union bound
    val data = tokenRows.map(t => Tok(((t.hashCode % Shards) + Shards) % Shards, t))
    val n = data.size.toLong
    // exact ground truth at the batch entry's 3% threshold (cnt*33 > n)
    val exact = data.groupBy(_.token).view.mapValues(_.size.toLong).toMap
    val truth = exact.collect { case (t, c) if c * 33 > n => t }.toSet
    assert(truth.nonEmpty, "fixture lost its heavy hitters — check the corpus")

    val mem = MemoryStream[Tok]
    val q = HeavyHittersStream.candidates(mem.toDS(), Capacity)
      .writeStream.format("memory").queryName("t_hh_stream").outputMode("append")
      .start()
    try {
      // three chunks: the sketch state must carry ACROSS micro-batches
      data.grouped(math.max(1, data.size / 3 + 1)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val rows = spark.table("t_hh_stream").as[ShardSummary].collect()
      // final summary per shard = the max-n_seen emission
      val finalPerShard = rows.groupBy(_.shard).view
        .mapValues(_.maxBy(_.n_seen)).values.toSeq
      assert(finalPerShard.map(_.n_seen).sum == n,
        s"shards saw ${finalPerShard.map(_.n_seen).sum} tokens, fed $n")
      val streamCands = finalPerShard.flatMap(_.candidates).toSet
      // state bound: never more than shards x capacity candidates
      assert(streamCands.size <= Shards * Capacity,
        s"candidate set ${streamCands.size} exceeds the state bound")
      // the mergeable-summaries guarantee, distributed: union of shard
      // candidates is a superset of the true heavy hitters
      assert(truth.subsetOf(streamCands),
        s"stream lost true heavy hitters: ${(truth -- streamCands).take(5)}")
      // exact verification narrows the stream candidates to precisely the
      // ground truth — the same second pass the batch entry runs
      val streamVerified = streamCands.filter(t => exact.getOrElse(t, 0L) * 33 > n)
      assert(streamVerified == truth,
        s"verified stream set differs: extra=${(streamVerified -- truth).take(5)} " +
          s"missing=${(truth -- streamVerified).take(5)}")
      // and the batch pipeline's verified output coincides on the same input
      val batchVerified = operators.TextAnalysis.heavyHitters(spark, sf0001)
        .collect().map(_.getAs[String]("token")).toSet
      assert(batchVerified == truth,
        s"batch entry disagrees with ground truth: $batchVerified vs $truth")
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }
}
