package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.KmvStream
import graft.streaming.KmvStream.{HashRow, ShardSketch}

/** Streaming KMV (KmvStream) against the batch `agg_kmv_distinct` on the
  * SAME hashed keys: because merging k-smallest sets is EXACT (not
  * approximate-on-top-of-approximate), the merged stream sketch must
  * reproduce the batch kth-hash and estimate bit for bit — a stronger
  * gate than the heavy-hitters superset pin. Also pins the per-shard
  * state bound and cross-micro-batch state carry. */
class KmvStreamSpec extends SparkSpec {

  private val Shards = 8
  private val K = 256

  test("merged stream sketch == batch kmv sketch on the same keys") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // the batch entry's exact hash, computed by the same engine expression
    val hashes: Seq[Long] = Tables.events(spark, sf0001)
      .select(conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .as[Long].collect().toSeq
    val data = hashes.map(h => HashRow((math.floorMod(h, Shards.toLong)).toInt, h))

    val mem = MemoryStream[HashRow]
    val q = KmvStream.sketches(mem.toDS(), K)
      .writeStream.format("memory").queryName("t_kmv_stream")
      .outputMode("append").start()
    try {
      // three chunks: sketch state must carry ACROSS micro-batches
      data.grouped(math.max(1, data.size / 3 + 1)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val rows = spark.table("t_kmv_stream").as[ShardSketch].collect()
      val finalPerShard = rows.groupBy(_.shard).view
        .mapValues(_.maxBy(_.n_seen)).values.toSeq
      assert(finalPerShard.map(_.n_seen).sum == data.size.toLong,
        "shards lost or duplicated observations")
      finalPerShard.foreach(s => assert(s.minima.size <= K, "state bound broken"))

      // exact merge: k smallest of the union of shard minima
      val merged = finalPerShard.flatMap(_.minima).distinct.sorted.take(K)
      val batch = SparkEntry.queries("agg_kmv_distinct")(spark, sf0001)
        .collect().head
      val (bNmin, bKth, bEst) = (batch.getLong(2), batch.getLong(3), batch.getDouble(4))
      assert(merged.size.toLong == bNmin, s"n_min ${merged.size} != batch $bNmin")
      assert(merged.max == bKth, s"kth ${merged.max} != batch kth $bKth")
      val est = if (merged.size < K) merged.size.toDouble
        else 255.0 * 1.152921504606846976e18 / merged.max.toDouble
      assert(est == bEst, s"stream estimate $est != batch estimate $bEst")
    } finally q.stop()
  }
}
