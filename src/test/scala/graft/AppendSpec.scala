package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The encode-only index-append path: appending must be exactly
  * equivalent to having encoded the vectors at build time (with the same
  * frozen quantizers), must involve no retraining, and must make the
  * appended vectors immediately searchable. */
class AppendSpec extends SparkSpec {

  private def normalized = Similarity.vectors(spark, sf0001)
    .withColumn("vn", transform(col("v"), x => x / col("nrm")))
    .select(col("vec_id"), col("vn"))

  test("encode is append-composable: encode(A) ∪ encode(B) == encode(A ∪ B)") {
    val (idx, _, _) = Similarity.ensureIvfPqIndex(spark, sf0001)
    val centroids = spark.read.parquet(s"$idx/centroids")
    val codebook = spark.read.parquet(s"$idx/codebook")
    val all = normalized.cache()
    val mid = all.agg(max(col("vec_id"))).head.getLong(0) / 2
    val (cellsA, codesA) = Similarity.encodeWithIndex(all.filter(col("vec_id") < mid), centroids, codebook)
    val (cellsB, codesB) = Similarity.encodeWithIndex(all.filter(col("vec_id") >= mid), centroids, codebook)
    val (cellsAll, codesAll) = Similarity.encodeWithIndex(all, centroids, codebook)
    def cellSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toSet
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m"), r.getAs[Int]("code"))).toSet
    assert(cellSet(cellsA) ++ cellSet(cellsB) == cellSet(cellsAll),
      "cell assignment is not append-composable")
    assert(codeSet(codesA) ++ codeSet(codesB) == codeSet(codesAll),
      "PQ encoding is not append-composable")
    // sanity: every vector got exactly one cell and PqM codes
    assert(cellsAll.count() == all.count())
    assert(codesAll.count() == all.count() * Similarity.PqM)
    all.unpersist()
  }

  test("appended vectors are immediately searchable: planted twins at rank 1") {
    val served = Similarity.indexAppendServe(spark, sf0001).collect()
    assert(served.nonEmpty, "append-serve returned nothing")
    val byQuery = served.groupBy(_.getAs[Long]("q_id"))
    assert(byQuery.size == 3, s"expected 3 planted queries, got ${byQuery.size}")
    byQuery.foreach { case (qid, rows: Array[Row]) =>
      val top = rows.minBy(_.getAs[Long]("rn"))
      // the planted query IS an appended vector (q_id = vec_id + 2^41);
      // its twin must come back first with cosine ~ 1 — proof the freshly
      // appended rows participate in cell probing, ADC, and exact refine
      assert(top.getAs[Long]("vec_id") == qid - (1L << 41),
        s"query $qid: twin not at rank 1 (got ${top.getAs[Long]("vec_id")})")
      assert(top.getAs[Double]("cos") > 0.999999,
        s"query $qid: twin cosine ${top.getAs[Double]("cos")}")
    }
  }
}
