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
      // each heavy entry twice: run 1 = plan+codegen+execute, run 2 ≈ pure
      // execution (codegen cache warm) — the gap is the compile floor
      Seq[(String, () => Long)](
        "minhash" -> (() => operators.Dedup.minhashLsh(spark, dir).count()),
        "ngram" -> (() => operators.Dedup.ngramJaccard(spark, dir).count()),
        "embedding lsh" -> (() => operators.Dedup.embeddingLsh(spark, dir).count()),
        "knn ivf" -> (() => operators.Similarity.knnIvf(spark, dir).count()),
        "fingerprint" -> (() => operators.TextAnalysis.fingerprint(spark, dir).count()),
        "tfidf" -> (() => operators.TextAnalysis.tfidfTopTerms(spark, dir).count()),
        "corpus clean" -> (() => operators.TextAnalysis.corpusClean(spark, dir).count()),
        "salted wc" -> (() => operators.TextAnalysis.saltedWordCount(spark, dir).count()),
        "sessionization" -> (() => operators.Events.sessionization(spark, dir).count())
      ).foreach { case (n, f) =>
        time(s"$n cold")(f()); time(s"$n warm")(f())
      }
    }
    spark.stop()
  }
}
