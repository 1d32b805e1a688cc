package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{StatefulSessions, TwsSessions}
import graft.streaming.StatefulSessions.{SEvent, Session}

/** transformWithState sessionizer (TwsSessions): must reproduce the full
  * gaps-and-islands session set once the watermark flushes every open
  * session — the same contract StatefulSessionsSpec pins for the
  * flatMapGroupsWithState variant, here on the v2 state API (typed state
  * handles + explicit timers, RocksDB-backed store). */
class TwsSessionsSpec extends SparkSpec {

  private lazy val events = {
    import spark.implicits._
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[SEvent].cache()
  }

  /** Independent oracle: ALL sessions per the declarative gaps-and-islands
    * SQL (duplicated from StatefulSessionsSpec on purpose — the two specs
    * must not share the code they are checking against). */
  private def expectedAll(): Map[(Long, Long, Long, Long), Double] = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events.toDF()
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > StatefulSessions.GapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)) -> r.getDouble(5))
      .toMap
  }

  test("transformWithState flush == full gaps-and-islands session set") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    // transformWithState requires the RocksDB provider
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val data = events.collect().toSeq
    val maxMs = data.map(_.ts.getTime).max
    val sentinel = SEvent(-1L,
      new java.sql.Timestamp(maxMs + 3 * StatefulSessions.GapUs / 1000), -1L, 0.0)
    val mem = MemoryStream[SEvent]
    val q = TwsSessions.sessions(mem.toDS())
      .writeStream.format("memory").queryName("t_tws_sess").outputMode("append")
      .start()
    try {
      mem.addData(data)
      q.processAllAvailable()          // closed sessions; watermark -> maxMs
      mem.addData(Seq(sentinel))
      q.processAllAvailable()          // watermark -> sentinel ts; timers fire next batch
      val want = expectedAll()
      val deadline = System.currentTimeMillis() + 60000
      def got() = spark.table("t_tws_sess").as[Session].collect().toSeq
      while (got().size < want.size && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      val rows = got()
      assert(!rows.exists(_.user_id == -1L), "sentinel's open session must not flush")
      val gotMap = rows.map(s => (s.user_id, s.start_us, s.end_us, s.n_events) -> s.sum_value).toMap
      assert(gotMap.keySet == want.keySet,
        s"session keys differ; extra=${(gotMap.keySet -- want.keySet).take(3)} " +
          s"missing=${(want.keySet -- gotMap.keySet).take(3)}")
      gotMap.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-6, s"sum mismatch at $k: $v vs ${want(k)}")
      }
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }
}
