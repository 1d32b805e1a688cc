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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup
    time("warmup agg")(operators.Aggregates.nationRevenue(spark, dir).count())
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      // plan audit of the round-2 rewrites
      Seq(
        "win_ntile_tiers" -> operators.Windows.ntileTiers(spark, dir),
        "join_inner_revenue" -> operators.Joins.innerRevenue(spark, dir),
        "dedup_embedding_lsh" -> operators.Dedup.embeddingLsh(spark, dir),
        "pipe_corpus_clean" -> operators.TextAnalysis.corpusClean(spark, dir)
      ).foreach { case (n, df) =>
        println(s"===== $n =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    } else {
      time("minhash full")(operators.Dedup.minhashLsh(spark, dir).count())
      time("minhash full 2nd")(operators.Dedup.minhashLsh(spark, dir).count())
      time("ngram full")(operators.Dedup.ngramJaccard(spark, dir).count())
      time("embedding lsh")(operators.Dedup.embeddingLsh(spark, dir).count())
      time("fingerprint")(operators.TextAnalysis.fingerprint(spark, dir).count())
      time("anti join")(operators.Joins.antiUnsoldParts(spark, dir).count())
      time("tfidf")(operators.TextAnalysis.tfidfTopTerms(spark, dir).count())
      time("corpus clean")(operators.TextAnalysis.corpusClean(spark, dir).count())
    }
    spark.stop()
  }
}
