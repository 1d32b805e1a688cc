package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.AnnServeStream

/** Online ANN serving (AnnServeStream) against the offline serve path on
  * the SAME queries and the SAME persisted index: answers must match
  * row-for-row, and must be independent of how queries are sliced into
  * micro-batches — the property that makes a streaming retrieval endpoint
  * trustworthy (a query's neighbors cannot depend on what else happened
  * to share its batch). */
object AnnServeStreamSpec {
  /** Top-level so Spark can derive an Encoder (inner classes can't). */
  final case class Query(q_id: Long, qv: Seq[Double])
}

class AnnServeStreamSpec extends SparkSpec {
  import AnnServeStreamSpec.Query

  /** Unit-normalized corpus vectors used as test queries (ids ≥ the
    * offline QueryBudget so self-exclusion semantics match the offline
    * twin's for OTHER vectors but the query set is distinct from it). */
  private lazy val queryRows: Seq[Query] = {
    import spark.implicits._
    Similarity.vectors(spark, sf0001)
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
      .select(col("vec_id"), col("vn"))
      .filter(col("vec_id") >= 100L && col("vec_id") < 106L)
      .as[(Long, Seq[Double])].collect().toSeq
      .map { case (id, v) => Query(id, v) }
  }

  private def key(r: Row): (Long, Long, Long) =
    (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("rn"))

  test("streamed micro-batches answer exactly like the offline serve") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    assert(queryRows.size == 6, "fixture expects 6 query vectors")

    // offline twin: same queries as one static batch through the same
    // serving plan over the same persisted index
    val (idx, nprobe, refineT) = Similarity.ensureIvfPqIndex(spark, sf0001)
    val corpus = Similarity.vectors(spark, sf0001)
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
      .select(col("vec_id"), col("vn"))
    val offline = Similarity.serveIvfPqQueries(
      queryRows.toDF("q_id", "qv"), corpus,
      spark.read.parquet(s"$idx/centroids"),
      spark.read.parquet(s"$idx/codebook"),
      spark.read.parquet(s"$idx/cells"),
      spark.read.parquet(s"$idx/codes"),
      nprobe, refineT).collect().map(key).toSet
    assert(offline.nonEmpty, "offline serve returned nothing")

    // stream the same 6 queries in three uneven micro-batches
    val answers = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val mem = MemoryStream[Query]
    val ckpt = Files.createTempDirectory("ann_serve_ckpt").toString
    val q = AnnServeStream.start(mem.toDF(), sf0001, ckpt) { (batch, _) =>
      answers.synchronized { answers ++= batch.collect().map(key) }
    }
    try {
      Seq(queryRows.take(1), queryRows.slice(1, 4), queryRows.drop(4)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      // row-for-row equality with the offline twin: same neighbors, same
      // ranks, regardless of micro-batch slicing
      assert(answers.toSet == offline,
        s"stream ${answers.size} rows vs offline ${offline.size}")
      assert(answers.size == offline.size, "duplicate answers across batches")
      // every query answered within its own batch (top-3 per query)
      val perQuery = answers.groupBy(_._1).view.mapValues(_.size)
      assert(queryRows.forall(qr => perQuery.getOrElse(qr.q_id, 0) > 0),
        "a query went unanswered")
    } finally q.stop()
  }

  test("mid-stream delete: the next micro-batch stops returning the tombstoned vector") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    // per-epoch capture so wave-1 (pre-delete) and wave-2 (post-delete)
    // answers are distinguishable even though the queries repeat
    val byEpoch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long)]]
    val mem = MemoryStream[Query]
    val ckpt = Files.createTempDirectory("ann_tomb_ckpt").toString
    val store = Files.createTempDirectory("ann_tomb_store").toString + "/tombstones"
    val wave = queryRows.take(3)
    val q = AnnServeStream.start(mem.toDF(), sf0001, ckpt, Some(store)) { (batch, ep) =>
      byEpoch.synchronized { byEpoch(ep) = batch.collect().map(key).toSet }
    }
    try {
      mem.addData(wave)
      q.processAllAvailable()
      val pre = byEpoch.values.flatten.toSet
      assert(pre.nonEmpty, "pre-delete wave returned nothing")
      // delete the rank-1 neighbor of the first query, mid-stream
      val victim = pre.filter(t => t._1 == wave.head.q_id && t._3 == 1L).head._2
      Seq(victim).toDF("vec_id").write.mode("overwrite").parquet(store)
      val preEpochs = byEpoch.keySet.toSet
      mem.addData(wave)
      q.processAllAvailable()
      val post = (byEpoch.keySet -- preEpochs).flatMap(byEpoch(_))
      assert(post.nonEmpty, "post-delete wave returned nothing")
      // the tombstoned id is gone from every answer of the next batch...
      assert(!post.exists(_._2 == victim),
        s"deleted vec $victim still served after the tombstone landed")
      assert(pre.exists(_._2 == victim), "victim was not served pre-delete")
      // ...and stream ≡ batch is preserved: the post-delete answers equal
      // the OFFLINE serve over the same masked index (the batch kernel of
      // sim_index_delete's tombstone phase)
      val (idx, nprobe, refineT) = Similarity.ensureIvfPqIndex(spark, sf0001)
      val tombs = spark.read.parquet(store).select(col("vec_id"))
      val corpus = Similarity.vectors(spark, sf0001)
        .withColumn("vn", transform(col("v"), x => x / col("nrm")))
        .select(col("vec_id"), col("vn"))
        .join(tombs, Seq("vec_id"), "left_anti")
      val offlineMasked = Similarity.serveIvfPqQueries(
        wave.toDF("q_id", "qv"), corpus,
        spark.read.parquet(s"$idx/centroids"),
        spark.read.parquet(s"$idx/codebook"),
        spark.read.parquet(s"$idx/cells").join(tombs, Seq("vec_id"), "left_anti"),
        spark.read.parquet(s"$idx/codes"),
        nprobe, refineT).collect().map(key).toSet
      assert(post == offlineMasked,
        s"post-delete stream diverged from masked offline serve: " +
          s"only-stream=${post -- offlineMasked} only-offline=${offlineMasked -- post}")
    } finally q.stop()
  }
}
