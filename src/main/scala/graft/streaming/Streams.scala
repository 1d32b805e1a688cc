package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming formulations of the event-analytics shapes —
  * SURVEY.md §7.5 (the reference has no streaming at all; this is the
  * north-star extension over the harness `events` table).
  *
  * Each transform takes a DataFrame that may be streaming (readStream /
  * MemoryStream) or batch — the logical plan is identical, which is what
  * lets StreamingSpec assert batch ≡ stream on the same input. Oracle'd
  * batch twins live in graft.operators.Events.
  *
  * Scale notes: watermarks bound state (1h windows + 1h lateness → ≤2h of
  * open windows per key); session_window state is per (user, open session)
  * and closes at watermark, so long-running jobs don't accumulate state.
  */
object Streams {

  /** Tumbling 1-hour event counts with a 1-hour watermark
    * (streaming twin of Events.tumblingHour). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("win.start").as("hour_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Session windows with a 30-minute inactivity gap
    * (streaming twin of Events.sessionization). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sess"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("sess.start").as("session_start"),
              col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming face of the dedup catalog. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
}
