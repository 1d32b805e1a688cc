package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental zone-map manifest maintenance — the streaming half of
  * `layout_zone_maps`: a table format does not rebuild its file statistics
  * from scratch per commit, it APPENDS a manifest of the new files' (row
  * count, min, max) envelopes and lets readers fold manifests at plan
  * time. This sink does exactly that over a stream of appended rows:
  *
  *  - **Per-batch stats**: each micro-batch's rows are aggregated to
  *    per-file envelopes (one hash-agg — the zone-map build is
  *    embarrassingly parallel and touches only the new rows, never the
  *    table).
  *  - **Epoch-keyed idempotence**: the manifest stores (file_id, epoch)
  *    rows; a REPLAYED batch first deletes its own epoch's rows, so
  *    crash-replay cannot double-count — the fold-at-read is over
  *    exactly-once stats even though the stats are additive (a bare
  *    running SUM in the store would be corrupted by replay; this is why
  *    real manifests are per-snapshot files, not mutable counters).
  *  - **Rename-aside swap**: the store is replaced via MergeSink's
  *    write-tmp → swap → recover discipline, so readers always see a
  *    complete manifest.
  *  - **Fold = batch**: (count, min, max) is a commutative monoid, so the
  *    folded manifest equals the batch zone map of every row seen so far
  *    regardless of batch slicing — ManifestStreamSpec pins the equality
  *    after every batch.
  *
  * At 100 TB the per-batch stats relation is |new files| rows and the
  * fold at read is |manifest| rows — neither touches table data; that is
  * the entire point of manifest-level pruning. */
object ManifestStream {

  /** Fold the persisted per-epoch manifest into per-file envelopes —
    * what a reader consults for pruning. */
  def foldedManifest(manifest: DataFrame): DataFrame =
    manifest.groupBy(col("file_id"))
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Start maintaining the manifest at `basePath` from a stream of rows
    * `(file_id: Long, ts: Timestamp)` (the writer assigns file ids).
    * `onBatch` receives the FOLDED manifest after each batch lands. */
  def start(rows: DataFrame, basePath: String, checkpoint: String)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = rows.sparkSession
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val stats = batch.groupBy(col("file_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("ts")).as("mn"), max(col("ts")).as("mx"))
          .withColumn("epoch", lit(epoch))
        val base = new Path(basePath)
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val old = new Path(basePath + ".old")
        val tmp = new Path(basePath + ".tmp")
        MergeSink.recoverSwap(fs, base, old)
        val merged =
          if (!fs.exists(base)) stats
          else spark.read.parquet(basePath)
            .filter(col("epoch") =!= epoch) // replayed batch replaces itself
            .unionByName(stats)
        merged.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(base))
          require(fs.rename(base, old), s"swap failed: $base -> $old")
        require(fs.rename(tmp, base), s"swap failed: $tmp -> $base")
        fs.delete(old, true)
        onBatch(foldedManifest(spark.read.parquet(basePath)), epoch)
      }
      .start()
  }
}
