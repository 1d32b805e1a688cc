package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** ONLINE ANN index ingest — the write half next to `AnnServeStream`'s
  * read half, closing the build-once/serve-many loop: vectors ARRIVE as a
  * stream and become searchable index rows without any retraining, any
  * rebuild, or any driver-side math.
  *
  * Shape: `foreachBatch` encodes each micro-batch of unit-normalized
  * vectors against the persisted index's FROZEN quantizers (the same
  * relational argmin `encodeWithIndex` the batch append entry uses — one
  * coarse cell + PqM codes per vector, O(|batch|·K) work) and lands the
  * resulting (cells, codes) deltas as plain parquet under
  * `<ingestDir>/{cells,codes}/batch=<epoch>`.
  *
  * Exactly-once: each epoch OVERWRITES its own `batch=<epoch>` directory
  * — a replayed micro-batch (failure between write and commit) rewrites
  * identical rows over itself instead of appending duplicates, the same
  * tmp-swap idempotency stance as `MergeSink`, here for free because the
  * encode is a pure function of the batch and the frozen quantizers.
  *
  * Serving unions the base index relations with the delta directories —
  * `encode(A) ∪ encode(B) ≡ encode(A ∪ B)` row-for-row (AppendSpec's
  * composability property holds per micro-batch for the same reason: the
  * quantizers are frozen, so per-vector encodes are independent), which
  * makes N micro-batches of stream ingest EXACTLY a batch build. The
  * quantizer relations are loaded and cached once; nothing about the
  * stream grows state — no watermark, no store, deltas are data, not
  * state. At 100 TB the deltas are the day's arrivals: bounded parquet
  * appends a compaction job can fold into the base at leisure.
  */
object AnnIngestStream {

  /** Start ingesting. `vecs` is a streaming DataFrame with columns
    * `(vec_id: Long, vn: array<double>)`, vn unit-normalized (the same
    * contract as every serve/encode path). Deltas land under `ingestDir`,
    * never touching the shared base index at `indexDir`. */
  def start(vecs: DataFrame, indexDir: String, ingestDir: String,
            checkpoint: String): StreamingQuery = {
    val spark = vecs.sparkSession
    // frozen quantizers, loaded + cached once for the life of the stream
    val centroids = spark.read.parquet(s"$indexDir/centroids").cache()
    val codebook = spark.read.parquet(s"$indexDir/codebook").cache()
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        ingestBatch(batch, epoch, centroids, codebook, ingestDir)
      }
      .start()
  }

  /** One micro-batch's encode + idempotent delta write (factored so the
    * replay-overwrite property is directly testable). */
  private[graft] def ingestBatch(batch: DataFrame, epoch: Long,
      centroids: DataFrame, codebook: DataFrame, ingestDir: String): Unit = {
    val (cells, codes) = Similarity.encodeWithIndex(batch, centroids, codebook)
    cells.write.mode("overwrite").parquet(s"$ingestDir/cells/batch=$epoch")
    codes.write.mode("overwrite").parquet(s"$ingestDir/codes/batch=$epoch")
  }

  /** The accumulated delta relations (all batches), shaped like the base
    * index's cells/codes so callers union them directly. */
  private[graft] def deltas(spark: org.apache.spark.sql.SparkSession,
      ingestDir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val cells = spark.read.parquet(s"$ingestDir/cells/batch=*")
      .select(col("vec_id"), col("cell"))
    val codes = spark.read.parquet(s"$ingestDir/codes/batch=*")
      .select(col("vec_id"), col("m"), col("code"))
    (cells, codes)
  }
}
