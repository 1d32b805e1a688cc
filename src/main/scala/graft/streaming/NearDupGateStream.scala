package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables
import graft.operators.Dedup

/** ONLINE NEAR-DUP ADMISSION GATE: a stream of arriving documents judged
  * against the standing corpus's MinHash band index — the ingest-time
  * half of the dedup family. The batch entries enumerate duplicate pairs
  * after the fact; a production pipeline wants each arriving document
  * admitted or rejected AT THE DOOR, before it ever lands in the corpus,
  * with the duplicate-of provenance logged on every drop.
  *
  * Shape: `foreachBatch` running the IDENTICAL relational kernel the
  * batch twin (`dedup_admission_gate`) runs — [[Dedup.shingleDocs]] →
  * [[Dedup.bandRelation]] → band equi-join against the STATIC index →
  * exact-Jaccard verify ≥ 0.7 → best-match verdict — so stream and batch
  * verdicts agree by construction (NearDupGateStreamSpec proves it, plus
  * micro-batch-slicing invariance). Zero streaming state: each arrival is
  * judged within its own micro-batch against the static index, so there
  * is no watermark or state store, and replaying a batch reproduces its
  * verdicts exactly (idempotent per doc_id) — the AnnServeStream /
  * MergeSink foreachBatch pattern.
  *
  * Scale: the corpus-side band index and shingle sets are built ONCE at
  * stream start and cached — per batch the work is the arrivals' pure-
  * projection signatures plus a band equi-join whose output is Σ bucket²
  * over colliding buckets, never |batch|·|corpus|. Admitted arrivals
  * append to the index the same way `sim_index_append` appends codes:
  * their (doc_id, band) rows are plain INSERTs against the same
  * relations; this gate reads a FROZEN snapshot per start, the standard
  * index-refresh cadence. */
object NearDupGateStream {

  /** Start gating. `docs` is a streaming DataFrame with columns
    * `(doc_id: Long, text: String)`; arrival doc_ids must not collide
    * with corpus doc_ids (use a high id range, as planted-probe entries
    * do). `onBatch` receives each micro-batch's verdicts
    * `(doc_id, verdict admit|reject, dup_of, jaccard)`. */
  def start(docs: DataFrame, dir: String, checkpoint: String)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    val baseSh = Dedup.shingleDocs(Tables.documents(spark, dir)).cache()
    val baseBands = Dedup.bandRelation(baseSh)
      .select(col("doc_id").as("base_id"), col("band_idx"), col("band_val"))
      .cache()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val arrSh = Dedup.shingleDocs(batch).cache()
        try onBatch(Dedup.gateVerdicts(arrSh, baseSh, baseBands), epoch)
        finally arrSh.unpersist()
      }
      .start()
  }

  /** The GROWING-INDEX variant — the full production shape: admitted
    * arrivals JOIN the index, so a duplicate of something admitted five
    * minutes ago is rejected like a duplicate of the standing corpus
    * ([[start]]'s frozen snapshot would admit it). Each batch's admitted
    * docs append their shingle sets to a plain-parquet store
    * (`sim_index_append`'s INSERT-rows pattern; dedup-on-read by doc_id
    * keeps replays idempotent), and later batches judge against
    * base ∪ store, with the store side's bands re-derived from the pure
    * signature projection (cheap: |admitted| rows, no corpus rescan).
    *
    * Intra-batch semantics are deliberately STREAM-STATIC: two copies
    * arriving in the SAME micro-batch are both judged against the
    * pre-batch index (both admit if novel) — the sequential tie-break
    * between them belongs to the downstream exact-digest CDC merge
    * (MergeSink), not the probabilistic gate; the spec pins both this
    * and the cross-batch rejection. */
  def startGrowing(docs: DataFrame, dir: String, storeDir: String,
                   checkpoint: String)
                  (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    val baseSh = Dedup.shingleDocs(Tables.documents(spark, dir)).cache()
    val baseBands = Dedup.bandRelation(baseSh) // corpus signatures ONCE
      .select(col("doc_id").as("base_id"), col("band_idx"), col("band_val"))
      .cache()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val arrSh = Dedup.shingleDocs(batch).cache()
        try {
          val storePath = s"$storeDir/admitted_sh"
          // probe existence rather than catching read errors: a corrupt
          // or unreadable store must FAIL the batch, not silently degrade
          // the gate to a frozen base-only index. The probe goes through
          // the Hadoop FileSystem of the store's own URI — a java.io.File
          // probe would be always-false on HDFS/S3 and silently freeze
          // the index to base-only, exactly the degradation this branch
          // exists to prevent
          val hPath = new org.apache.hadoop.fs.Path(storePath)
          val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
          val stored =
            if (fs.exists(hPath))
              spark.read.parquet(storePath).dropDuplicates("doc_id")
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], arrSh.schema)
          val indexSh = baseSh.select(col("doc_id"), col("shingles"))
            .unionByName(stored.select(col("doc_id"), col("shingles")))
          val indexBands = baseBands.unionByName(Dedup.bandRelation(stored)
            .select(col("doc_id").as("base_id"), col("band_idx"), col("band_val")))
          val verdicts = Dedup.gateVerdicts(arrSh, indexSh, indexBands).cache()
          try {
            val admitted = verdicts.filter(col("verdict") === "admit")
              .select(col("doc_id"))
              .join(arrSh, Seq("doc_id"))
            admitted.write.mode("append").parquet(storePath)
            onBatch(verdicts, epoch)
          } finally verdicts.unpersist()
          ()
        } finally arrSh.unpersist()
      }
      .start()
  }
}
