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

  /** Sliding (hopping) 3-hour windows advancing every hour — each event
    * lands in width/slide = 3 overlapping windows (streaming twin of
    * Events.slidingThreeHour). Watermark + window width bound open state
    * to ~(3h + 1h lateness) of windows per event_type key. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "3 hours", "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
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

  /** Stream-stream interval join: each click joined to same-user purchases
    * within the preceding hour. Both sides watermarked; the time-range
    * predicate bounds join state to ~2h per key on each side (Spark evicts
    * rows whose interval can no longer match under the watermark) — the
    * state-bounded shape a 24/7 job needs. Inner join → append mode. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clickPurchaseJoin(clicks, purchases, "inner")

  /** LEFT-OUTER stream-stream interval join: same pairing as
    * clickPurchaseJoin, but a click with no same-user purchase in the
    * preceding hour is still emitted — null-padded — once the watermark
    * passes the end of its match interval (purchase_ts ≤ click_ts, so a
    * click's interval closes when the watermark passes click_ts; Spark
    * emits the null row in a subsequent microbatch). Matched rows are
    * emitted eagerly like the inner join; state stays watermark-bounded.
    * Batch twin: operators.Events.intervalClicksLeft (DuckDB LEFT JOIN
    * oracle); StreamingSpec proves matched-eager + null-at-close. */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clickPurchaseJoin(clicks, purchases, "left_outer")

  /** Stream-static enrichment join — the remaining join shape a 24/7
    * pipeline needs next to stream-stream: each event decorated with a
    * dimension row from a STATIC (batch) relation. No watermark and no
    * join state: Spark re-plans the static side per micro-batch (picking
    * broadcast when the dim is small), so dim updates between batches are
    * picked up and state never grows. Left-outer keeps unmatched events
    * with a null tier — the enrichment contract. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, Seq("user_id"), "left_outer")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("tier"))

  private def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                                joinType: String): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("click_ts")).withWatermark("click_ts", "1 hour")
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"),
      joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
  }
}
