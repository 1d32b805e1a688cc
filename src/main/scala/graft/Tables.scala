package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness star schema (TESTDATA.md / FIXTURES.md §A).
  *
  * Parquet carries its own schema, so we rely on the embedded footer types
  * (int32/int64/double/string/timestamp) instead of re-declaring StructTypes;
  * the vectorized reader + pushdown/pruning come for free. Each loader is a
  * plain scan — callers compose filters/projections so Catalyst can push them
  * into the scan (SURVEY.md §4).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL). Read it as raw INT64 nanos via an
    * explicit schema, then truncate to microseconds — the same truncation
    * DuckDB applies when it reads nanos, so oracle comparisons agree. */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
