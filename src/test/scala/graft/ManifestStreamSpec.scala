package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ManifestStream

/** The streaming manifest against a from-scratch batch zone map on the
  * same rows: after EVERY micro-batch the folded manifest must equal the
  * batch aggregation of all rows seen so far — (count, min, max) is a
  * commutative monoid, so batch slicing must be invisible — INCLUDING
  * across the r10 append-only store's periodic compaction. Replay and
  * crash-mid-compaction idempotence are pinned directly on commitEpoch. */
object ManifestStreamSpec {
  final case class FileRow(file_id: Long, ts: Timestamp)
}

class ManifestStreamSpec extends SparkSpec {
  import ManifestStreamSpec.FileRow

  private def key(r: Row) = (r.getAs[Long]("file_id"), r.getAs[Long]("n_rows"),
    r.getAs[Timestamp]("mn"), r.getAs[Timestamp]("mx"))

  private def gens(store: String): Seq[String] = {
    val base = new Path(store)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n.startsWith("e") || n.startsWith("c"))
  }

  test("folded manifest equals the batch zone map after every batch, across compaction") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows: Seq[FileRow] = Tables.lineitem(spark, sf0001)
      .select(expr("l_orderkey DIV 2048").as("file_id"),
        col("l_shipdate").cast("timestamp").as("ts"))
      .as[FileRow].collect().toSeq
    assert(rows.size > 100, "fixture too small")

    val perEpoch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Timestamp, Timestamp)]]
    val mem = MemoryStream[FileRow]
    val ckpt = Files.createTempDirectory("manifest_ckpt").toString
    val store = Files.createTempDirectory("manifest_store").toString + "/manifest"
    val q = ManifestStream.start(mem.toDF(), store, ckpt) { (folded, ep) =>
      perEpoch.synchronized { perEpoch(ep) = folded.collect().map(key).toSet }
    }
    try {
      // 7 micro-batches: enough older generations accumulate that the
      // CompactEvery=4 trigger fires at least once mid-run
      val n = rows.size
      val cuts = (1 to 6).map(i => i * n / 7)
      val chunks = (Seq(0) ++ cuts :+ n).sliding(2).map { case Seq(a, b) => rows.slice(a, b) }.toSeq
      var seen = Seq.empty[FileRow]
      chunks.zipWithIndex.foreach { case (c, i) =>
        mem.addData(c)
        q.processAllAvailable()
        seen = seen ++ c
        val expected = seen.toDF()
          .groupBy(col("file_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("ts")).as("mn"), max(col("ts")).as("mx"))
          .collect().map(key).toSet
        val got = perEpoch.synchronized { perEpoch(perEpoch.keys.max) }
        assert(got == expected,
          s"batch $i: folded manifest diverged from batch zone map: " +
            s"only-stream=${got -- expected} only-batch=${expected -- got}")
      }
      // the store compacted: fewer generations than commits, at least one
      // compacted generation, and every epoch's rows survive inside it
      val names = gens(store)
      assert(names.length < 7, s"no compaction happened: $names")
      assert(names.exists(_.startsWith("c")), s"no compacted generation: $names")
      assert(ManifestStream.readManifest(spark, store)
        .select("epoch").distinct().count() == 7L,
        "per-epoch rows must survive compaction verbatim")
    } finally q.stop()
  }

  test("commitEpoch is idempotent under replay and under crash-mid-compaction") {
    import spark.implicits._
    val store = Files.createTempDirectory("manifest_replay").toString + "/manifest"
    def stats(fid: Long, nRows: Long): org.apache.spark.sql.DataFrame =
      Seq((fid, nRows, Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-02 00:00:00")))
        .toDF("file_id", "n_rows", "mn", "mx")
    def invokeCommit(fid: Long, epoch: Long): Unit = {
      val m = ManifestStream.getClass.getDeclaredMethods
        .find(_.getName == "commitEpoch").get
      m.setAccessible(true)
      m.invoke(ManifestStream, spark, store, stats(fid, 10L), java.lang.Long.valueOf(epoch))
    }
    // epochs 0..4: the 5th commit sees 4 older generations -> compacts
    (0L to 4L).foreach(e => invokeCommit(e, e))
    val afterCompact = gens(store)
    assert(afterCompact.contains("c4") && afterCompact.count(_.startsWith("e")) == 1,
      s"expected c4 + e4 only, got $afterCompact")
    val total = ManifestStream.foldedManifest(
      ManifestStream.readManifest(spark, store))
      .agg(sum(col("n_rows"))).collect().head.getLong(0)
    assert(total == 50L)
    // REPLAY of epoch 4 (the only epoch that can replay): the epoch dir is
    // overwritten, the complete compaction is kept — totals unchanged
    invokeCommit(4L, 4L)
    val total2 = ManifestStream.foldedManifest(
      ManifestStream.readManifest(spark, store))
      .agg(sum(col("n_rows"))).collect().head.getLong(0)
    assert(total2 == 50L, s"replayed epoch double-counted: $total2")
    // crash-mid-compaction: resurrect a source generation that the
    // compaction already covers (compaction written, cleanup lost) — the
    // (file_id, epoch) dedup absorbs the duplicate at read...
    stats(2L, 10L).withColumn("epoch", lit(2L))
      .write.mode("overwrite").parquet(s"$store/e2")
    val total3 = ManifestStream.foldedManifest(
      ManifestStream.readManifest(spark, store))
      .agg(sum(col("n_rows"))).collect().head.getLong(0)
    assert(total3 == 50L, s"mid-cleanup duplicate double-counted: $total3")
    // ...and the next epoch's commit garbage-collects it
    invokeCommit(5L, 5L)
    assert(!gens(store).contains("e2"), s"leftover source not cleaned: ${gens(store)}")
    val total4 = ManifestStream.foldedManifest(
      ManifestStream.readManifest(spark, store))
      .agg(sum(col("n_rows"))).collect().head.getLong(0)
    assert(total4 == 60L)
  }
}
