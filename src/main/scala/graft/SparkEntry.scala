package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each catalog module contributes `(name -> query)` pairs plus the matching
  * DuckDB oracle SQL. Invariants (enforced by ContractSpec):
  *  - every oracleSql key exists in queries;
  *  - Spark result column names == oracle result column names (the driver
  *    sorts columns by name before hashing, so aliases must agree);
  *  - every query output carries a deterministic total ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.3 composite: join → multi-agg + countDistinct → HAVING →
    * RANK() window → top-k. */
  def entry(spark: SparkSession): DataFrame =
    Windows.rankTopNations(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Aggregates.queries, Aggregates.oracle),
      (Windows.queries, Windows.oracle),
      (Joins.queries, Joins.oracle),
      (TpchTail.queries, TpchTail.oracle),
      (SortsAndSets.queries, SortsAndSets.oracle),
      (Etl.queries, Etl.oracle),
      (TextAnalysis.queries, TextAnalysis.oracle),
      (Dedup.queries, Dedup.oracle),
      (Similarity.queries, Similarity.oracle),
      (Events.queries, Events.oracle),
      (Behavior.queries, Behavior.oracle),
      (Graph.queries, Graph.oracle),
      (Recommend.queries, Recommend.oracle),
      (Layout.queries, Layout.oracle),
      (Multimodal.queries, Multimodal.oracle),
      (Sql.queries, Sql.oracle),
      (Sources.queries, Sources.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
