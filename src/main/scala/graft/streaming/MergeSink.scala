package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** CDC apply — the sink half of a change-data pipeline: a stream of keyed
  * change rows kept merged into a queryable parquet base via
  * `foreachBatch`, for when no transactional table format is available.
  * (The reference's scripts rebuild their views from scratch per run —
  * ref `code/03_SQLOperations.scala`; this is the always-current variant
  * a 24/7 pipeline needs.)
  *
  *  - **Per-batch compaction**: a micro-batch may carry several updates
  *    for one key; last-write-wins by the monotonic `seq` column (one
  *    keyed hash-agg — co-partitioned, no window over the batch).
  *  - **Merge shape**: base LEFT-ANTI batch-keys ∪ survivors — the same
  *    one-shuffle core as the batch `Etl.upsertMerge` entry.
  *  - **Atomic swap**: the merged result is fully written to `<base>.tmp`
  *    BEFORE the old dir is replaced, so readers never observe a partial
  *    table and the source is never overwritten while still being read.
  *  - **Effectively exactly-once**: after a failure `foreachBatch` can
  *    REPLAY the last batch; the merge is idempotent per (key, seq) —
  *    replaying rewrites the same survivors — so checkpointed offsets +
  *    idempotent apply give end-to-end exactly-once without a commit log.
  *  - **At 100 TB** the full-table rewrite becomes a table format's job
  *    (snapshot dirs + atomic pointer swap, partition-scoped rewrites);
  *    the streaming mechanics here — compaction, merge shape, checkpoint
  *    recovery — carry over unchanged.
  */
object MergeSink {

  /** One survivor per key: the row with the highest `seq`. */
  private[streaming] def compactBatch(batch: DataFrame, key: String,
                                      seq: String): DataFrame = {
    val others = batch.columns.filter(c => c != key && c != seq)
    batch.groupBy(col(key))
      .agg(max_by(struct((Seq(seq) ++ others).map(col): _*), col(seq)).as("s"))
      .select(col(key) +: (Seq(seq) ++ others).map(c => col(s"s.$c").as(c)): _*)
  }

  /** Merge compacted `changes` into the parquet table at `basePath`
    * (created on first call), replacing it atomically. */
  private[streaming] def applyMerge(changes: DataFrame, basePath: String,
                                    key: String, seq: String): Unit = {
    val spark = changes.sparkSession
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = new Path(basePath)
    val compacted = compactBatch(changes, key, seq)
    val merged =
      if (!fs.exists(base)) compacted
      else {
        val cur = spark.read.parquet(basePath)
        cur.join(compacted.select(col(key)), Seq(key), "left_anti")
          .unionByName(compacted)
      }
    val tmp = new Path(basePath + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(base)) fs.delete(base, true)
    require(fs.rename(tmp, base), s"swap failed: $tmp -> $base")
  }

  /** Start the change stream merging into `basePath`; offsets tracked in
    * `checkpoint` so a restarted query resumes where it left off. */
  def start(changes: DataFrame, basePath: String, checkpoint: String,
            key: String = "k", seq: String = "seq"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyMerge(batch, basePath, key, seq)
      }
      .start()
}
