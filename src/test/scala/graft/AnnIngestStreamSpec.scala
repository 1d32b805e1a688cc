package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.AnnIngestStream

/** Streaming index ingest (AnnIngestStream) against the batch encode on
  * the SAME vectors and the SAME frozen quantizers: N micro-batches of
  * stream ingest must produce exactly the rows one batch encode produces
  * (append-composability under streaming), replayed batches must not
  * duplicate rows, and a vector that arrived in the LAST micro-batch must
  * be servable at rank 1 — "searchable the moment its encode lands",
  * streamed. */
object AnnIngestStreamSpec {
  /** Top-level so Spark can derive an Encoder (inner classes can't). */
  final case class Vec(vec_id: Long, vn: Seq[Double])
}

class AnnIngestStreamSpec extends SparkSpec {
  import AnnIngestStreamSpec.Vec

  private def normalized = Similarity.vectors(spark, sf0001)
    .withColumn("vn", transform(col("v"), x => x / col("nrm")))
    .select(col("vec_id"), col("vn"))

  private def cellSet(df: DataFrame) =
    df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toSet
  private def codeSet(df: DataFrame) =
    df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m"), r.getAs[Int]("code"))).toSet

  test("stream ingest across micro-batches equals one batch encode; last arrival serves at rank 1") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val (idx, nprobe, refineT) = Similarity.ensureIvfPqIndex(spark, sf0001)
    val all = normalized.cache()
    val maxId = all.agg(max(col("vec_id"))).head.getLong(0)
    val cut = maxId - maxId / 5
    val fresh = all.filter(col("vec_id") >= cut)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
      .map { case (id, v) => Vec(id, v) }
    assert(fresh.size >= 6, s"fixture too small: ${fresh.size} fresh vectors")

    val ingestDir = Files.createTempDirectory("graft_ingest_").toString
    val checkpoint = Files.createTempDirectory("graft_ingest_ckpt_").toString
    val stream = MemoryStream[Vec]
    val q = AnnIngestStream.start(
      stream.toDF().select(col("vec_id"), col("vn")), idx, ingestDir, checkpoint)
    try {
      // three arrival waves; each must be encoded within its own batch
      val waves = fresh.grouped(math.max(1, fresh.size / 3 + 1)).toSeq
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
    } finally q.stop()

    val (dCells, dCodes) = AnnIngestStream.deltas(spark, ingestDir)
    val centroids = spark.read.parquet(s"$idx/centroids")
    val codebook = spark.read.parquet(s"$idx/codebook")
    val (bCells, bCodes) = Similarity.encodeWithIndex(
      all.filter(col("vec_id") >= cut), centroids, codebook)
    assert(cellSet(dCells) == cellSet(bCells),
      "streamed cell deltas differ from the one-shot batch encode")
    assert(codeSet(dCodes) == codeSet(bCodes),
      "streamed code deltas differ from the one-shot batch encode")

    // serve over base ∪ deltas: a twin of a LAST-wave vector must come
    // back at rank 1 with cosine ~ 1
    val cells = spark.read.parquet(s"$idx/cells").filter(col("vec_id") < cut)
      .unionByName(dCells)
    val codes = spark.read.parquet(s"$idx/codes").filter(col("vec_id") < cut)
      .unionByName(dCodes)
    val probeId = fresh.last.vec_id
    val probe = Seq(Vec(probeId + 1000000L, fresh.last.vn)).toDF()
      .select(col("vec_id").as("q_id"), col("vn").as("qv"))
    val served = Similarity.serveIvfPqQueries(
      probe, all, centroids, codebook, cells, codes, nprobe, refineT).collect()
    assert(served.nonEmpty, "serve over streamed index returned nothing")
    val top = served.minBy(_.getAs[Long]("rn"))
    assert(top.getAs[Long]("vec_id") == probeId,
      s"last-wave twin not at rank 1: got ${top.getAs[Long]("vec_id")}")
    assert(top.getAs[Double]("cos") > 0.999999,
      s"twin cosine ${top.getAs[Double]("cos")}")

    // replaying an epoch overwrites its own delta dir — no duplicates
    // (runs last: it deliberately re-lands rows already ingested)
    val lastVecs = fresh.takeRight(2).toDF()
      .select(col("vec_id"), col("vn"))
    AnnIngestStream.ingestBatch(lastVecs, 99L, centroids, codebook, ingestDir)
    val before = AnnIngestStream.deltas(spark, ingestDir)._1.count()
    AnnIngestStream.ingestBatch(lastVecs, 99L, centroids, codebook, ingestDir)
    val after = AnnIngestStream.deltas(spark, ingestDir)._1.count()
    assert(before == after, s"replayed epoch duplicated rows: $before -> $after")
    all.unpersist()
  }
}
