package graft

import org.apache.spark.sql.functions._

/** Runtime filter pin — the other half of the data-pruning story next to
  * static partition/footer pruning (PlanSpec, ZorderLayoutSpec): when a
  * fact table shuffle-joins a dimension that carries a selective
  * predicate, Spark can build a bloom filter from the dim keys at runtime
  * and apply it to the fact side BEFORE the shuffle, cutting the shuffled
  * volume to ~the join's selectivity. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling only the rows
  * that can possibly match. The thresholds here are shrunk so the sf0.001
  * fixture qualifies; at production scale the defaults (10 MB creation
  * side, 10 GB application side) gate the same rewrite.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim shuffle join injects a bloom runtime filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // force the shuffle join: broadcast would leave nothing to prune
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val dim = Tables.part(spark, sf0001).filter(col("p_size") === 1)
    val fact = Tables.lineitem(spark, sf0001)
    // baseline BEFORE enabling the rewrite — computed under the same confs
    // it could not catch a row-dropping bloom filter (both sides would
    // drop the same rows)
    val expected = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      .count()
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
        .groupBy(col("p_size")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom runtime filter in the optimized plan:\n$optimized")
      // and the rewrite must not change the answer
      assert(joined.collect().map(_.getLong(1)).sum == expected)
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("join to a filtered dim prunes the partitioned fact scan dynamically (DPP)") {
    // the runtime half of src_partitioned_prune's static directory pruning:
    // the year values come from the DIM side at execution time, so the fact
    // scan must carry a dynamicpruning PartitionFilter, not a literal one
    val fact = graft.operators.Sources.partitionedOrdersTable(spark, sf0001)
    // a file-backed dim (a LocalRelation's filter would be constant-folded
    // away, and DPP requires a selective predicate on the dim side):
    // region keys 0..4 → years 1992..1996, filtered to one region = one year
    val dim = Tables.region(spark, sf0001)
      .select((col("r_regionkey") + 1992).cast("int").as("d_year"), col("r_name"))
      .filter(col("r_name") === "EUROPE")
    val joined = fact.join(dim, fact("o_year") === dim("d_year"))
      .groupBy(col("d_year")).agg(count(lit(1)).as("n"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("dynamicpruning"),
      s"no dynamic partition pruning in the plan:\n$physical")
    // and the pruned result equals the statically-filtered count
    val targetYear = dim.collect().map(_.getInt(0)).toSeq match {
      case Seq(y) => y
      case other => fail(s"expected one dim year, got $other")
    }
    val expected = fact.filter(col("o_year") === targetYear).count()
    assert(joined.collect().map(_.getLong(1)).sum == expected)
  }
}
