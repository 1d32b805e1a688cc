package graft

import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (README scale stance: "skewed keys → salting or
  * AQE skew-join"). A planted 99%-hot key exercises both shapes; each must
  * produce results identical to the unsalted plan — salting changes the
  * partitioning, never the answer.
  */
class SkewSpec extends SparkSpec {

  // ~99% of rows share key 0; the rest are unique keys
  private lazy val fact = spark.range(50000)
    .select(
      when(col("id") % 100 === 0, col("id")).otherwise(lit(0L)).as("key"),
      col("id").as("v"))
    .cache()

  test("salted two-phase aggregation == direct aggregation") {
    val salted = fact
      .withColumn("salt", pmod(hash(col("v")), lit(8)))
      .groupBy(col("key"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("key"))
      .agg(sum(col("ps")).as("sum_v"), sum(col("pc")).as("n"))
    val direct = fact.groupBy(col("key"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("AQE splits the skewed join partition at runtime (skew=true)") {
    // the OTHER half of the skew stance: no rewrite at all — AQE detects the
    // oversized shuffle partition from map-output stats and splits it into
    // advisory-sized subpartitions, replicating the matching right side.
    // Thresholds are lowered so the planted 99%-hot key (~1 MB in one
    // partition) trips detection on test-sized data; at real scale the
    // defaults (256 MB) do the same job untouched.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: skew split needs a shuffle join
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // a PLAIN relation on the dim side: OptimizeSkewedJoin only matches
      // SMJ(Sort(shuffle), Sort(shuffle)) — an aggregate (e.g. distinct)
      // between the sort and the shuffle stage disqualifies the split
      val dim = spark.range(500)
        .select((col("id") * 100).as("key"), (col("id") * 10).as("payload"))
      val joined = fact.join(dim, Seq("key"))
      // collect() on the SAME Dataset so ITS queryExecution finalizes
      // (count() would spin up a separate QueryExecution and leave this
      // one's adaptive plan un-executed)
      assert(joined.collect().length == 50000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not flag/split the skewed partition:\n$finalPlan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("salted join (replicated dim side) == plain join") {
    val nSalt = 8
    val dim = fact.select(col("key")).distinct()
      .withColumn("payload", col("key") * 10)
    val dimSalted = dim.crossJoin(
      spark.range(nSalt).select(col("id").cast("int").as("salt")))
    val salted = fact
      .withColumn("salt", pmod(hash(col("v")), lit(nSalt)))
      .join(dimSalted, Seq("key", "salt"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("sum_payload"))
    val plain = fact.join(dim, Seq("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("sum_payload"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("join_salted_skew's planted hot key: salt divides the max partition load") {
    // quantifies WHY the catalog's skew twin salts, using HashPartitioning's
    // own partition-id formula — pmod(murmur3(join keys), N) is exactly how
    // Spark assigns a shuffle row to a reduce task, so per-partition row
    // counts computed relationally ARE the per-task input sizes, with no
    // listener race. Same derived key + salt as the join_salted_skew entry.
    val n = 32
    val nSalt = 8
    val rows = Tables.lineitem(spark, sf0001)
      .select(
        when(col("l_orderkey") % 2 === 0, lit(1L))
          .otherwise(col("l_suppkey")).as("hk"),
        pmod(hash(col("l_orderkey")), lit(nSalt)).as("salt"))
      .cache()
    try {
      val total = rows.count()
      def maxLoad(pid: org.apache.spark.sql.Column): Long = rows
        .groupBy(pid.as("pid")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      val unsalted = maxLoad(pmod(hash(col("hk")), lit(n)))
      val salted = maxLoad(pmod(hash(col("hk"), col("salt")), lit(n)))
      // the planted key really is degenerate: one task reads >=50% of rows
      assert(unsalted >= total / 2,
        s"fixture not skewed: max $unsalted of $total rows")
      // and the salt really moves it: hottest task at most half the hot key
      // (expected ~1/nSalt of it plus hash-collision noise)
      assert(salted <= unsalted / 2,
        s"salt did not spread the hot key: $salted vs $unsalted (total $total)")
    } finally rows.unpersist()
  }
}
