package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (array<float>, 64-dim) — SURVEY.md §7.5.
  *
  * Two paths, as a real pipeline would ship them:
  *  - `sim_knn_brute`: exact top-k per query vector. Query set × corpus is
  *    a broadcast-able join (|queries| ≪ |corpus|); per-query top-k via a
  *    partitioned window, so no global sort and no driver collect.
  *  - `sim_knn_lsh`: the scale path — a sign-bit coarse quantizer (LSH on
  *    the first 6 dimensions) buckets the corpus; each query probes only
  *    its own bucket. Candidate work drops from |Q|·|corpus| to
  *    |Q|·|bucket|; recall is traded for the 64× fan-in cut exactly like
  *    an IVF index with nprobe=1.
  *
  * All cosine math is double-fold arithmetic identical to the DuckDB
  * oracle's sequential list_reduce (see VectorOps) — bit-exact, so even
  * rank order needs no tolerance.
  */
object Similarity {

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))

  /** Sign-bit bucket over the first `bits` dimensions (deterministic
    * hyperplane-free LSH; portable to plain SQL). */
  private def signBucket(v: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map(j =>
      when(element_at(v, j + 1) >= 0.0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)

  /** Exact brute-force top-5 neighbors for each query vector
    * (every 100th vec_id). */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val all = vectors(spark, dir).cache()
    val q = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(q).join(all, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        VectorOps.cosine(VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .orderBy(col("q_id"), col("rn"))
  }

  /** LSH/IVF-style bucketed top-3: query probes only its sign bucket. */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val all = vectors(spark, dir)
      .withColumn("bucket", signBucket(col("v"), 6))
      .cache()
    val q = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val scored = broadcast(q).join(all, Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("bucket"), col("vec_id"),
        VectorOps.cosine(VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("q_id"), col("rn"))
  }

  /** True IVF (inverted-file) ANN: a KMeans coarse quantizer (k=16,
    * seeded) partitions the corpus; each query probes only its own cell
    * (nprobe=1), top-3 by exact cosine within the cell. The real-index
    * upgrade over the hyperplane-free sign bucket of `sim_knn_lsh`:
    * centroids adapt to the data distribution, so cells are balanced even
    * when mass concentrates in a few orthants. Candidate work drops from
    * |Q|·|corpus| to |Q|·|corpus|/k.
    *
    * NOT oracle'd: the trained centroids depend on float reduction order
    * (rows-only driver check); SimilaritySpec gates recall vs the exact
    * brute-force baseline instead. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val all = vectors(spark, dir)
      .withColumn("fv", array_to_vector(col("v")))
      .cache()
    val model = new KMeans().setK(16).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(all) // 5 iters: a coarse quantizer needs rough cells, not convergence
    val assigned = model.transform(all).drop("fv").cache()
    val q = assigned.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val scored = broadcast(q).join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("cell"), col("vec_id"),
        VectorOps.cosine(VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("q_id"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn_brute" -> (knnBrute _),
    "sim_knn_lsh"   -> (knnLsh _),
    "sim_knn_ivf"   -> (knnIvf _)
  )

  private val dotSql =
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip(%s, %s), z -> z[1] * z[2])), (x, y) -> x + y)"

  private val bucketSql = (0 until 6)
    .map(j => s"CASE WHEN v[${j + 1}] >= 0.0 THEN ${1L << j} ELSE 0 END")
    .mkString("CAST(", " + ", " AS BIGINT)")

  val oracle: Map[String, String] = Map(
    "sim_knn_brute" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, v,
        |    sqrt(${dotSql.format("v", "v")}) AS nrm
        |  FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, a.vec_id, a.label,
        |    ${dotSql.format("q.v", "a.v")} / (q.nrm * a.nrm) AS cos
        |  FROM n q JOIN n a ON q.vec_id % 100 = 0 AND q.vec_id <> a.vec_id),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM scored)
        |SELECT q_id, vec_id, label, cos, rn FROM r
        |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "sim_knn_lsh" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, v,
        |    sqrt(${dotSql.format("v", "v")}) AS nrm,
        |    $bucketSql AS bucket
        |  FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, q.bucket, a.vec_id,
        |    ${dotSql.format("q.v", "a.v")} / (q.nrm * a.nrm) AS cos
        |  FROM n q JOIN n a ON q.bucket = a.bucket
        |   AND q.vec_id % 100 = 0 AND q.vec_id <> a.vec_id),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM scored)
        |SELECT q_id, bucket, vec_id, cos, rn FROM r
        |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
  )
}
