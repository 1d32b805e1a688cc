package graft

import org.apache.spark.sql.functions._

/** Data-layout lever (SURVEY.md §4 / README scale stance): bucketing both
  * sides of a repeated fact⨝fact join on the join key makes the join
  * exchange-free — the shuffle is paid once at write time, not per query.
  * At 100 TB this is the difference between re-shuffling the fact table for
  * every join and a co-located sort-merge join per bucket.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Tables.orders(spark, sf0001)
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
      Tables.customer(spark, sf0001)
        .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // the join inputs must read pre-bucketed data: no Exchange below the join
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      val exchangeBeforeAgg = joinSection.linesIterator
        .takeWhile(l => !l.contains("HashAggregate"))
        .exists(_.contains("Exchange"))
      assert(!exchangeBeforeAgg, s"join still shuffles its inputs:\n$plan")

      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
