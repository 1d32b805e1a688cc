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
  *  - **Rename-aside swap**: the merged result is fully written to
  *    `<base>.tmp` BEFORE the old dir is moved away, so readers never
  *    observe a partial table, the source is never overwritten while
  *    still being read, and a crash at any point leaves a complete old
  *    or new table that the next batch's recovery step restores.
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

  /** One survivor per key: the row with the highest `seq`; ties on `seq`
    * (two updates in one source transaction) broken by the remaining
    * columns lexicographically, so replayed batches compact to the SAME
    * survivor regardless of partition order — without that tiebreak the
    * idempotent-replay claim would be false for non-unique seqs. */
  private[streaming] def compactBatch(batch: DataFrame, key: String,
                                      seq: String): DataFrame = {
    val others = batch.columns.filter(c => c != key && c != seq)
    val ordered = Seq(seq) ++ others
    batch.groupBy(col(key))
      .agg(max_by(struct(ordered.map(col): _*),
        struct(ordered.map(col): _*)).as("s"))
      .select(col(key) +: ordered.map(c => col(s"s.$c").as(c)): _*)
  }

  /** Merge compacted `changes` into the parquet table at `basePath`
    * (created on first call), replacing it via rename-aside:
    * write `.tmp` fully → rename base → `.old` → rename `.tmp` → base →
    * drop `.old`. Every crash window leaves either the old or the new
    * COMPLETE table recoverable (recoverSwap below restores it before the
    * replayed batch re-merges); a plain delete-then-rename would lose the
    * whole base if the process died between the two calls. The one
    * reader-visible gap (base briefly absent between the two renames) is
    * what a transactional table format's pointer swap removes — the merge
    * and recovery mechanics are the same. */
  private[streaming] def applyMerge(changes: DataFrame, basePath: String,
                                    key: String, seq: String): Unit = {
    val spark = changes.sparkSession
    val base = new Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(basePath + ".old")
    val tmp = new Path(basePath + ".tmp")
    recoverSwap(fs, base, old)
    val compacted = compactBatch(changes, key, seq)
    val merged =
      if (!fs.exists(base)) compacted
      else {
        val cur = spark.read.parquet(basePath)
        cur.join(compacted.select(col(key)), Seq(key), "left_anti")
          .unionByName(compacted)
      }
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(base))
      require(fs.rename(base, old), s"swap failed: $base -> $old")
    require(fs.rename(tmp, base), s"swap failed: $tmp -> $base")
    fs.delete(old, true)
  }

  /** Restore a complete base after a crash mid-swap: if only `.old`
    * exists the new table never landed — roll back; if both exist the
    * new table landed and only the cleanup was lost — finish it. */
  private[streaming] def recoverSwap(fs: FileSystem, base: Path, old: Path): Unit =
    if (fs.exists(old)) {
      if (!fs.exists(base))
        require(fs.rename(old, base), s"recovery failed: $old -> $base")
      else fs.delete(old, true)
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
