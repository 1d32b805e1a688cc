package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Aggregates
import graft.streaming.PsiDriftStream

/** The streaming PSI monitor against the batch entry on the SAME events:
  * every window the stream finalizes must carry the identical (n_cur,
  * psi) the batch computes — bitwise, via the shared decimal kernel —
  * and the scores must not depend on micro-batch slicing. */
object PsiDriftStreamSpec {
  final case class Ev(ts: Timestamp, value: Double)
}

class PsiDriftStreamSpec extends SparkSpec {
  import PsiDriftStreamSpec.Ev

  /** The corpus events in event-time order (replay), plus a far-future
    * sentinel that advances the watermark past every real window. Its own
    * windows stay open and never emit. */
  private lazy val replay: Seq[Ev] = {
    val evs = Tables.events(spark, sf0001)
      .select(col("ts"), col("value")).orderBy(col("ts"))
      .collect().map(r => Ev(r.getAs[Timestamp]("ts"), r.getAs[Double]("value")))
    evs.toSeq :+ Ev(Timestamp.valueOf("2024-06-01 00:00:00"), 1.0)
  }

  private def key(r: Row) = (r.getAs[Long]("w_start_us"), r.getAs[Long]("w_end_us"),
    r.getAs[Long]("n_cur"), r.getAs[Double]("psi"))

  private def runStream(chunks: Seq[Seq[Ev]]): Set[(Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("psi_drift_ckpt").toString
    val q = PsiDriftStream.start(mem.toDF(), sf0001, ckpt) { (batch, _) =>
      out.synchronized { out ++= batch.collect() }
    }
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    out.map(key).toSet
  }

  test("finalized windows score identically to the batch entry") {
    val batch = Aggregates.psiWindows(spark, sf0001).collect().map(key).toSet
    assert(batch.nonEmpty, "batch psi windows empty")
    val streamed = runStream(Seq(replay))
    assert(streamed == batch,
      s"stream-only ${streamed -- batch}, batch-only ${batch -- streamed}")
  }

  test("window scores are independent of micro-batch slicing") {
    // time-ordered splits (late data beyond the 1 h watermark would be
    // legitimately dropped — the split points respect event time)
    val third = replay.size / 3
    val a = runStream(Seq(replay.take(third), replay.slice(third, 2 * third), replay.drop(2 * third)))
    val b = runStream(Seq(replay))
    assert(a == b, "PSI scores depend on micro-batch slicing")
  }
}
