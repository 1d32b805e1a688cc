package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.streaming.EwmaAnomalyStream

/** The online EWMA anomaly detector against the batch entry on the SAME
  * events: every hour the stream finalizes must carry the identical
  * (baseline, verdict) the batch computes — the causal strictly-prior
  * join makes this exact, not approximate — independent of micro-batch
  * slicing. */
object EwmaAnomalyStreamSpec {
  final case class Ev(ts: Timestamp, event_type: String)
}

class EwmaAnomalyStreamSpec extends SparkSpec {
  import EwmaAnomalyStreamSpec.Ev

  private lazy val replay: Seq[Ev] = {
    val evs = Tables.events(spark, sf0001)
      .select(col("ts"), col("event_type")).orderBy(col("ts"))
      .collect().map(r => Ev(r.getAs[Timestamp]("ts"), r.getAs[String]("event_type")))
    evs.toSeq :+ Ev(Timestamp.valueOf("2024-06-01 00:00:00"), "view")
  }

  private def key(r: Row) = (r.getAs[String]("event_type"), r.getAs[Long]("hour_no"),
    r.getAs[Long]("n_events"),
    Option(r.getAs[java.lang.Long]("ewma_prev_micro")).map(Long2long),
    r.getAs[Long]("is_spike"))

  private def runStream(chunks: Seq[Seq[Ev]]): Set[(String, Long, Long, Option[Long], Long)] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Ev]
    val store = Files.createTempDirectory("ewma_store").toString
    val ckpt = Files.createTempDirectory("ewma_ckpt").toString
    val q = EwmaAnomalyStream.start(mem.toDF(), store, ckpt) { (batch, _) =>
      out.synchronized { out ++= batch.collect() }
    }
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    out.map(key).toSet
  }

  test("finalized hours carry the batch entry's exact baseline and verdict") {
    val batch = Events.ewmaAnomaly(spark, sf0001).collect().map(key).toSet
    assert(batch.nonEmpty, "batch anomaly relation empty")
    // warm-up rows exist (first hour per type has no baseline)
    assert(batch.exists(_._4.isEmpty), "expected warm-up NULL baselines")
    val streamed = runStream(Seq(replay))
    assert(streamed == batch,
      s"stream-only ${streamed -- batch}, batch-only ${batch -- streamed}")
  }

  test("verdicts are independent of micro-batch slicing") {
    val third = replay.size / 3
    val a = runStream(Seq(replay.take(third), replay.slice(third, 2 * third), replay.drop(2 * third)))
    val b = runStream(Seq(replay))
    assert(a == b, "EWMA verdicts depend on micro-batch slicing")
  }
}
