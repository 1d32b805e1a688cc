package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability without a second scan: `observe()` attaches
  * aggregate metrics to a plan node and the engine collects them as a side
  * effect of the ONE job that produces the output. At 100 TB the
  * alternative — a separate count() per audit counter — re-reads the
  * input once per counter; an ingest job wants "rows in / rows rejected /
  * bytes kept" for free on the same scan. The metrics must equal
  * independently computed answers exactly (they are plain Catalyst
  * aggregates, not samples). */
class ObservationSpec extends SparkSpec {

  test("observe() audit counters equal separate counts, collected in one pass") {
    val docs = Tables.documents(spark, sf0001)
    val shortDoc = length(col("text")) < 200
    val obs = Observation("ingest_audit")
    val kept = docs
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(when(shortDoc, 1L).otherwise(0L)).as("n_rejected"),
        sum(when(!shortDoc, length(col("text")).cast("long")).otherwise(0L))
          .as("chars_kept"))
      .filter(!shortDoc)
      .count()
    val m = obs.get
    val expectIn = docs.count()
    val expectChars = docs.filter(!shortDoc)
      .agg(sum(length(col("text")).cast("long"))).head().getLong(0)
    assert(m("n_in") == expectIn, s"n_in ${m("n_in")} != $expectIn")
    assert(m("n_rejected") == expectIn - kept,
      s"n_rejected ${m("n_rejected")} != ${expectIn - kept}")
    assert(m("chars_kept") == expectChars,
      s"chars_kept ${m("chars_kept")} != $expectChars")
  }
}
