package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.ContaminationGateStream

/** The streaming contamination gate against the batch entry on the SAME
  * eval docs and the SAME training corpus: per-doc verdicts must equal
  * the batch kernel's, be independent of micro-batch slicing, and
  * aggregating them per source must reproduce the ORACLED
  * `pipe_contamination` counts — two independent formulations (per-doc
  * verdict fold vs semi-join+distinct aggregate) agreeing on a relation
  * the DuckDB oracle also pins. */
object ContaminationGateStreamSpec {
  final case class EvalDoc(doc_id: Long, source: String, text: String)
}

class ContaminationGateStreamSpec extends SparkSpec {
  import ContaminationGateStreamSpec.EvalDoc

  /** The REAL held-out split (md5 first hex e/f) streamed as arrivals —
    * exactly the docs the batch entry scores. */
  private lazy val evalDocs: Seq[EvalDoc] = {
    import spark.implicits._
    Tables.documents(spark, sf0001)
      .filter(substring(md5(col("text")), 1, 1).isin("e", "f"))
      .select(col("doc_id"), col("source"), col("text"))
      .as[EvalDoc].collect().toSeq.sortBy(_.doc_id)
  }

  private def key(r: Row) = (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
    r.getAs[Long]("n_shingles"), r.getAs[String]("verdict"))

  test("stream verdicts equal the batch kernel and reproduce the oracled counts") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    assert(evalDocs.nonEmpty, "fixture has no held-out docs")

    // stream in three uneven micro-batches
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[EvalDoc]
    val ckpt = Files.createTempDirectory("contam_gate_ckpt").toString
    val q = ContaminationGateStream.start(mem.toDF(), sf0001, ckpt) { (batch, _) =>
      out.synchronized { out ++= batch.collect() }
    }
    try {
      val n = evalDocs.size
      Seq(evalDocs.take(1), evalDocs.slice(1, n / 2), evalDocs.drop(n / 2))
        .foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    assert(out.size == evalDocs.size, s"expected ${evalDocs.size} verdicts, got ${out.size}")
    val streamed = out.map(key).toSet

    // batch twin: the same docs as one static relation through the same kernel
    val train = TextAnalysis.trainShingleSet(spark, sf0001)
    val batchVerdicts = TextAnalysis.contaminationVerdicts(
      evalDocs.toDF(), train).collect().map(key).toSet
    assert(streamed == batchVerdicts,
      s"stream diverged from batch kernel: only-stream=${streamed -- batchVerdicts} " +
        s"only-batch=${batchVerdicts -- streamed}")

    // both obvious lanes are exercised (non-vacuous fixture)
    assert(streamed.exists(_._4 == "contaminated"), "no contaminated eval doc in fixture")
    assert(streamed.exists(_._4 == "clean"), "no clean eval doc in fixture")

    // aggregating the gate's verdicts per source reproduces the ORACLED
    // batch entry — an independent formulation of the same relation
    val entry = TextAnalysis.contamination(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_eval_docs"), r.getAs[Long]("n_contaminated"))).toMap
    val fromGate = streamed.groupBy(_._2).map { case (src, rows) =>
      src -> (rows.size.toLong, rows.count(_._4 == "contaminated").toLong)
    }
    assert(fromGate == entry,
      s"gate aggregate $fromGate != oracled entry $entry")
  }
}
