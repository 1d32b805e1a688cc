package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** STREAMING eval decontamination — the online face of
  * `pipe_contamination` (the batch entry keeps the DuckDB oracle): a
  * benchmark-ingestion endpoint must reject an arriving eval document the
  * moment ANY of its 5-gram shingles already exists in the training
  * corpus, without rescanning that corpus per arrival.
  *
  * Shape — the `NearDupGateStream` admission-gate pattern applied
  * verbatim: the training side's DISTINCT shingle hash set is built ONCE
  * from the standing corpus and cached (it is the |distinct shingles|-
  * bounded index, the only corpus-sized relation in play); each
  * micro-batch of arriving docs is shingled with the SAME guarded
  * 5-window kernel the batch entry uses (one shared definition,
  * `TextAnalysis.shingleArr5`) and semi-joined against the cached set —
  * per-batch work is |arrival shingles|, never corpus × arrivals. Zero
  * streaming state: verdicts depend only on (arrival, frozen train set),
  * so replayed batches reproduce exactly and batch-slicing cannot change
  * any verdict (ContaminationGateStreamSpec pins stream ≡ batch).
  *
  * At 100 TB the train set is a hash-bucketed distinct relation that
  * lives partitioned across the cluster; arrivals shuffle only their own
  * shingles to it — the standard industrial decontamination shape run
  * incrementally. */
object ContaminationGateStream {

  /** Start the gate. `docs` is a streaming DataFrame with columns
    * `(doc_id: Long, source: String, text: String)` — arriving eval
    * candidates. `onBatch` receives each micro-batch's verdicts
    * `(doc_id, source, n_shingles, verdict ∈ contaminated|clean)`. */
  def start(docs: DataFrame, dir: String, checkpoint: String)
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    val train = TextAnalysis.trainShingleSet(spark, dir).cache()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        onBatch(TextAnalysis.contaminationVerdicts(batch, train), epoch)
      }
      .start()
  }
}
