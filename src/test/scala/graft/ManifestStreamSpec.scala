package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ManifestStream

/** The streaming manifest against a from-scratch batch zone map on the
  * same rows: after EVERY micro-batch the folded manifest must equal the
  * batch aggregation of all rows seen so far — (count, min, max) is a
  * commutative monoid, so batch slicing must be invisible. */
object ManifestStreamSpec {
  final case class FileRow(file_id: Long, ts: Timestamp)
}

class ManifestStreamSpec extends SparkSpec {
  import ManifestStreamSpec.FileRow

  private def key(r: Row) = (r.getAs[Long]("file_id"), r.getAs[Long]("n_rows"),
    r.getAs[Timestamp]("mn"), r.getAs[Timestamp]("mx"))

  test("folded manifest equals the batch zone map after every micro-batch") {
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
      val n = rows.size
      val chunks = Seq(rows.take(n / 3), rows.slice(n / 3, n / 2), rows.drop(n / 2))
      var seen = Seq.empty[FileRow]
      chunks.zipWithIndex.foreach { case (c, i) =>
        mem.addData(c)
        q.processAllAvailable()
        seen = seen ++ c
        // from-scratch batch zone map over everything streamed so far
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
      // the store is epoch-keyed (per-snapshot manifests), one set per batch
      val raw = spark.read.parquet(store)
      assert(raw.select("epoch").distinct().count() == 3L,
        "expected one manifest generation per micro-batch")
    } finally q.stop()
  }
}
