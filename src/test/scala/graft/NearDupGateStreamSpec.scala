package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.NearDupGateStream

/** The streaming near-dup admission gate against its batch kernel on the
  * SAME arrivals and the SAME corpus index: verdicts must match exactly,
  * must be independent of micro-batch slicing, and must call the obvious
  * cases right (an exact copy is rejected with jaccard 1 and corpus
  * provenance; a fresh document is admitted). */
object NearDupGateStreamSpec {
  final case class Arrival(doc_id: Long, text: String)
}

class NearDupGateStreamSpec extends SparkSpec {
  import NearDupGateStreamSpec.Arrival

  private val IdBase = 1L << 41 // arrival ids above any corpus doc_id

  /** 6 arrivals: three exact copies of corpus docs, one 5-word fresh doc
    * of out-of-vocabulary tokens, one sub-3-word doc (empty shingle set —
    * must admit, null lanes never collide), one shuffled-word variant. */
  private lazy val arrivals: Seq[Arrival] = {
    val texts = Tables.documents(spark, sf0001)
      .orderBy(col("doc_id")).limit(3)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val copies = texts.zipWithIndex.map { case ((_, t), i) =>
      Arrival(IdBase + i, t)
    }
    val shuffled = Arrival(IdBase + 3,
      texts.head._2.split(" ").reverse.mkString(" "))
    copies.toSeq :+ Arrival(IdBase + 4, "zxqv wbfk pltm djrn ghsc") :+
      Arrival(IdBase + 5, "two words") :+ shuffled
  }

  private def key(r: Row) = (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
    Option(r.getAs[java.lang.Long]("dup_of")).map(Long2long),
    Option(r.getAs[java.lang.Double]("jaccard")).map(Double2double))

  private def runStream(chunks: Seq[Seq[Arrival]]): Set[(Long, String, Option[Long], Option[Double])] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Arrival]
    val ckpt = Files.createTempDirectory("neardup_gate_ckpt").toString
    val q = NearDupGateStream.start(mem.toDF(), sf0001, ckpt) { (batch, _) =>
      out.synchronized { out ++= batch.collect() }
    }
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    assert(out.size == arrivals.size, s"expected ${arrivals.size} verdicts, got ${out.size}")
    out.map(key).toSet
  }

  test("stream verdicts equal the batch kernel's and survive re-slicing") {
    import spark.implicits._
    val arrSh = Dedup.shingleDocs(arrivals.toDF("doc_id", "text"))
    val baseSh = Dedup.shingleDocs(Tables.documents(spark, sf0001)).cache()
    val baseBands = Dedup.bandRelation(baseSh)
      .select(col("doc_id").as("base_id"), col("band_idx"), col("band_val"))
    val batchVerdicts = Dedup.gateVerdicts(arrSh, baseSh, baseBands)
      .collect().map(key).toSet

    val streamed = runStream(Seq(arrivals.take(2), arrivals.slice(2, 5), arrivals.drop(5)))
    assert(streamed == batchVerdicts,
      s"stream-only ${streamed -- batchVerdicts}, batch-only ${batchVerdicts -- streamed}")

    val resliced = runStream(Seq(arrivals))
    assert(resliced == streamed, "verdicts depend on micro-batch slicing")
    baseSh.unpersist()
  }

  private def runGrowing(chunks: Seq[Seq[Arrival]]): Map[Long, (String, Option[Long])] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Arrival]
    val store = Files.createTempDirectory("neardup_grow_store").toString
    val ckpt = Files.createTempDirectory("neardup_grow_ckpt").toString
    val q = NearDupGateStream.startGrowing(mem.toDF(), sf0001, store, ckpt) { (batch, _) =>
      out.synchronized { out ++= batch.collect() }
    }
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(Long2long))).toMap
  }

  test("growing index: admitted docs gate later arrivals; same-batch copies stay stream-static") {
    val fresh = Arrival(IdBase + 10, "qwpv mlkt znrx bhgd cfsy wuje")
    val copyOfFresh = Arrival(IdBase + 11, fresh.text)
    // cross-batch: the copy arrives AFTER its original was admitted —
    // the grown index must reject it with provenance pointing at the
    // admitted doc (a frozen-snapshot gate would admit it)
    val cross = runGrowing(Seq(Seq(fresh), Seq(copyOfFresh)))
    assert(cross(fresh.doc_id)._1 == "admit", "novel doc rejected")
    assert(cross(copyOfFresh.doc_id) == ("reject", Some(fresh.doc_id)),
      s"copy of an admitted doc not rejected against it: ${cross(copyOfFresh.doc_id)}")
    // same-batch: both judged against the pre-batch index (stream-static
    // intra-batch semantics — the documented contract; downstream exact-
    // digest CDC owns the within-batch tie-break)
    val same = runGrowing(Seq(Seq(fresh, copyOfFresh)))
    assert(same(fresh.doc_id)._1 == "admit")
    assert(same(copyOfFresh.doc_id)._1 == "admit",
      "same-batch copy was rejected — intra-batch semantics changed")
    // and corpus duplicates are still rejected through the grown index
    val corpusCopy = arrivals.head
    val mixed = runGrowing(Seq(Seq(fresh), Seq(corpusCopy)))
    assert(mixed(corpusCopy.doc_id)._1 == "reject")
    // replay idempotence: the SAME doc (same id) re-delivered after its
    // admission landed in the store — the at-least-once re-execution
    // shape — must re-admit, not reject against itself (self-exclusion
    // in the candidate join)
    val replayed = runGrowing(Seq(Seq(fresh), Seq(fresh)))
    assert(replayed(fresh.doc_id)._1 == "admit",
      s"re-delivered doc rejected against itself: ${replayed(fresh.doc_id)}")
  }

  test("exact copies are rejected with jaccard 1; fresh and tiny docs admitted") {
    val verdicts = runStream(Seq(arrivals)).toSeq.sortBy(_._1)
      .map(v => v._1 -> v).toMap
    (0 until 3).foreach { i =>
      val v = verdicts(IdBase + i)
      assert(v._2 == "reject", s"exact copy ${IdBase + i} was admitted")
      assert(v._4.contains(1.0), s"copy jaccard ${v._4}, want 1.0")
      assert(v._3.exists(_ < IdBase), "dup_of must point into the corpus")
    }
    assert(verdicts(IdBase + 4)._2 == "admit", "fresh OOV doc was rejected")
    assert(verdicts(IdBase + 5)._2 == "admit", "sub-3-word doc was rejected")
    // the reversed-word doc shares NO 3-word shingles with its source, so
    // the gate must admit it — word order is part of near-dup identity
    assert(verdicts(IdBase + 3)._2 == "admit", "reversed-word doc was rejected")
  }
}
