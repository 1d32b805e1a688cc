package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{SEvent, Session}

/** flatMapGroupsWithState sessionizer: batch run == streaming run == the
  * declarative gaps-and-islands SQL (minus each user's final session, which
  * stays open in state by the emission contract). */
class StatefulSessionsSpec extends SparkSpec {

  private lazy val events = {
    import spark.implicits._
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[SEvent].cache()
  }

  /** Closed sessions per gaps-and-islands (strict > gap boundary, like the
    * sessionizer), excluding each user's last (still-open) session. */
  private def expectedClosed(): Map[(Long, Long, Long, Long), Double] =
    expectedSessions(dropLast = true)

  /** ALL sessions per gaps-and-islands — the expectation once a watermark
    * flush has closed every user's final session. */
  private def expectedAll(): Map[(Long, Long, Long, Long), Double] =
    expectedSessions(dropLast = false)

  private def expectedSessions(dropLast: Boolean): Map[(Long, Long, Long, Long), Double] = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = StatefulSessions.GapUs
    val flagged = events.toDF()
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val sess = flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    val wLast = Window.partitionBy(col("user_id"))
    sess.withColumn("max_seq", max(col("session_seq")).over(wLast))
      .filter(if (dropLast) col("session_seq") < col("max_seq") else lit(true))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getDouble(4))
      .toMap
  }

  /** Keyed compare: identity on session boundaries/counts, 1e-6 tolerance
    * on the double sum (fold order differs between the imperative state
    * machine and the SQL aggregate). */
  private def assertSessionsEqual(got: Seq[Session],
                                  want: Map[(Long, Long, Long, Long), Double]): Unit = {
    val gotMap = got.map(s => (s.user_id, s.start_us, s.end_us, s.n_events) -> s.sum_value).toMap
    assert(gotMap.keySet == want.keySet,
      s"session keys differ; extra=${gotMap.keySet -- want.keySet} missing=${want.keySet -- gotMap.keySet}")
    gotMap.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6, s"sum mismatch at $k: $v vs ${want(k)}")
    }
  }

  test("batch flatMapGroupsWithState == gaps-and-islands closed sessions") {
    assertSessionsEqual(StatefulSessions.sessions(events).collect().toSeq, expectedClosed())
  }

  test("streaming flatMapGroupsWithState == batch (single-batch input)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(events.collect().toSeq)
    val q = StatefulSessions.sessions(mem.toDS())
      .writeStream.format("memory").queryName("t_statesess").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assertSessionsEqual(spark.table("t_statesess").as[Session].collect().toSeq, expectedClosed())
  }

  test("backward straggler beyond the gap becomes its own session, not a merge") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      SEvent(id, java.sql.Timestamp.valueOf(t), 7L, v)
    val mem = MemoryStream[SEvent]
    val q = StatefulSessions.sessions(mem.toDS())
      .writeStream.format("memory").queryName("t_backstraggle").outputMode("append")
      .start()
    try {
      // batch 1 opens a session at 12:00 (NoTimeout: no watermark, so the
      // old 10:00 event in batch 2 is still delivered, modeling an
      // in-watermark straggler)
      mem.addData(Seq(ev(1, "2024-01-01 12:00:00", 1.0)))
      q.processAllAvailable()
      // batch 2: straggler 2h BEFORE the open session's start (gap = 30m) —
      // gaps-and-islands puts it in its own earlier session; the pre-fix
      // fold silently merged it (startUs extended backwards)
      mem.addData(Seq(ev(2, "2024-01-01 10:00:00", 2.0)))
      q.processAllAvailable()
      // batch 3: close everything still open with a far-future event
      mem.addData(Seq(ev(3, "2024-01-02 12:00:00", 3.0)))
      q.processAllAvailable()
      val got = spark.table("t_backstraggle").as[Session].collect()
        .map(s => (s.start_us, s.end_us, s.n_events, s.sum_value)).toSet
      def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000
      assert(got == Set(
        (us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"), 1L, 2.0),
        (us("2024-01-01 12:00:00"), us("2024-01-01 12:00:00"), 1L, 1.0)),
        s"straggler merged instead of split: $got")
    } finally q.stop()
  }

  test("event-time timeout flushes every final session once the watermark passes") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = events.collect().toSeq
    val maxMs = data.map(_.ts.getTime).max
    // sentinel far past every session's close boundary: once processed, the
    // watermark exceeds lastUs + gap for ALL real users' final sessions
    val sentinel = SEvent(-1L,
      new java.sql.Timestamp(maxMs + 3 * StatefulSessions.GapUs / 1000), -1L, 0.0)
    val mem = MemoryStream[SEvent]
    val q = StatefulSessions.sessionsFlushing(mem.toDS())
      .writeStream.format("memory").queryName("t_statesess_flush").outputMode("append")
      .start()
    try {
      mem.addData(data)
      q.processAllAvailable()          // batch 1: closed sessions; watermark -> maxMs
      mem.addData(Seq(sentinel))
      q.processAllAvailable()          // batch 2: watermark -> sentinel ts
      val want = expectedAll()
      // the timeout fires on the post-watermark (possibly no-data) batch —
      // poll until the flushed finals land
      val deadline = System.currentTimeMillis() + 60000
      def got() = spark.table("t_statesess_flush").as[Session].collect().toSeq
      while (got().size < want.size && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      val rows = got()
      assert(!rows.exists(_.user_id == -1L), "sentinel's open session must not flush")
      assertSessionsEqual(rows, want)
    } finally q.stop()
  }
}
