package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables
import graft.operators.Aggregates

/** STREAMING drift monitor — the online twin of `agg_psi_windows`: every
  * finalized 24-hour window (sliding 12 h) of arriving events is scored
  * with Population Stability Index against the frozen first-week
  * reference histogram, emitting the (window, psi) rows a model-serving
  * pipeline pages on — as the windows CLOSE, not in a nightly batch.
  *
  * Shape: a watermarked sliding-window count by (window, value-bin) —
  * the only stateful stage, with state evicted as the watermark passes —
  * whose append-mode output (windows finalize atomically: all of a
  * window's bins emit in the same micro-batch) feeds `foreachBatch`
  * running the IDENTICAL PSI kernel the batch entry runs
  * ([[Aggregates.psiAgainstRef]]) against the once-cached reference.
  * Spark's streaming `window()` is epoch-aligned exactly like the batch
  * entry's arithmetic windows, so window identity matches bit-for-bit
  * and PsiDriftStreamSpec can require batch ≡ stream on replayed input.
  *
  * Scale: state is O(open windows × 10 bins) per the watermark horizon —
  * time-bounded, not stream-length-bounded; the per-batch PSI work is
  * |closed windows| · 10 rows. */
object PsiDriftStream {

  /** Start monitoring. `events` is a streaming DataFrame with columns
    * `(ts: Timestamp, value: Double)`; `dir` supplies the standing corpus
    * whose pre-cut week trains the reference histogram. `onBatch`
    * receives each micro-batch's newly-finalized window scores
    * `(w_start_us, w_end_us, n_cur, psi)`. */
  def start(events: DataFrame, dir: String, checkpoint: String)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = events.sparkSession
    val ref = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"))
      .filter(col("us") < Aggregates.PsiCutUs)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_ref"))
      .cache() // frozen: one histogram serves every micro-batch
    val finalized = events
      .filter(unix_micros(col("ts")) >= Aggregates.PsiCutUs)
      .withColumn("bin", least(floor(col("value") / 50).cast("long"), lit(9L)))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("bin"))
      .agg(count(lit(1)).as("n_cur"))
      .select(unix_micros(col("window.start")).as("w_us"), col("bin"), col("n_cur"))
    finalized.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty) onBatch(Aggregates.psiAgainstRef(batch, ref), epoch)
      }
      .start()
  }
}
