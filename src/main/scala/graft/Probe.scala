package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for optimization work — not part of the driver
  * contract. Usage: runMain graft.Probe */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val d = Tables.documents(spark, dir)
    time("docs count")(d.count())
    val toks = split(col("text"), " ")
    val sh = d.select(
      col("doc_id"),
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(1), size(toks) - 2),
          i => array_join(slice(toks, i, lit(3)), " "))))
        .otherwise(array().cast("array<string>")).as("shingles"))
    time("shingled")(sh.count())
    val shc = sh.cache()
    time("shingled cached")(shc.count())
    val ex = shc.select(col("doc_id"), explode(col("shingles")).as("g"))
      .withColumn("h", md5(col("g")))
    time("explode+md5")(ex.count())
    val sigCols = (0 until 8).map(i => min(substring(col("h"), 4 * i + 1, 4)).as(s"s$i"))
    val sig = ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    time("signatures")(sig.count())
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map(b =>
        struct(lit(b).as("band_idx"), concat(col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("band_val"))): _*
    )).as("band")).select(col("doc_id"), col("band.band_idx"), col("band.band_val"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(cand.count())
    val withSets = cand
      .join(shc.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), Seq("doc_a"))
      .join(shc.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), Seq("doc_b"))
    val out = withSets
      .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("n_inter")))
      .filter(col("jaccard") >= 0.7)
    time("verify jaccard")(out.count())
    spark.stop()
  }
}
