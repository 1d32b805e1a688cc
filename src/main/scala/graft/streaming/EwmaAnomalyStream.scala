package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Events

/** ONLINE rate-anomaly alerts: every hour that CLOSES on the event stream
  * is judged against the exact-integer EWMA of its strictly-prior 20
  * hours — the alert an on-call actually gets, at the time it could have
  * been actioned, with the causal baseline the batch twin
  * (`events_ewma_anomaly`) defines.
  *
  * Shape: a watermarked tumbling-hour count per event type (the only
  * stateful stage; state evicted with the watermark) whose append-mode
  * output feeds `foreachBatch`, which (1) MERGES the newly-finalized
  * hours into a plain-parquet hour store — the accumulating-relation
  * pattern MergeSink uses for CDC, here keyed (event_type, hour) with
  * dedup-on-read so a replayed batch is idempotent — and (2) runs the
  * IDENTICAL verdict kernel the batch entry runs
  * ([[Events.ewmaPrevVerdicts]]) for the new hours against the store.
  * Causality holds across batches for free: hour h−1 always finalizes no
  * later than hour h (the watermark is monotone), so every strictly-
  * prior hour is in the store by the time h is judged — which is exactly
  * why stream verdicts equal the batch twin's (EwmaAnomalyStreamSpec).
  *
  * Scale: per batch, the work is |new hours| · 20 after one bounded
  * hash-agg; the store grows one row per (type, hour) — time-bounded,
  * not event-bounded. */
object EwmaAnomalyStream {

  /** Start alerting. `events` is a streaming DataFrame with columns
    * `(ts: Timestamp, event_type: String)`; `storeDir` holds the
    * accumulating finalized-hour relation. `onBatch` receives each
    * micro-batch's verdicts `(event_type, hour_no, n_events,
    * ewma_prev_micro, is_spike)` for the hours that just closed. */
  def start(events: DataFrame, storeDir: String, checkpoint: String)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = events.sparkSession
    val finalized = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_micros(window.start) DIV 3600000000").as("h"), col("n"))
    finalized.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty) {
          val cur = batch.select(col("event_type"), col("h"), col("n")).cache()
          cur.write.mode("append").parquet(s"$storeDir/hourly")
          // dedup-on-read: a window finalizes with a deterministic count,
          // so at-least-once appends collapse to the same row
          val hist = spark.read.parquet(s"$storeDir/hourly")
            .dropDuplicates("event_type", "h")
          try onBatch(Events.ewmaPrevVerdicts(cur, hist), epoch)
          finally cur.unpersist()
        }
      }
      .start()
  }
}
