package graft

import org.apache.spark.sql.functions._

import graft.operators.Sources

/** Seeded sampling ops (SURVEY.md U2/U3) can't be hash-oracled
  * (partition-order-sensitive survivors) — per §7.6 they're gated by rate
  * and invariant assertions instead. */
class SamplingSpec extends SparkSpec {

  test("stratifiedSample achieves ~20% per stratum (±10pp at sf0.001)") {
    val totals = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_total"))
    val sampled = Sources.stratifiedSample(spark, sf0001)
    val joined = sampled.join(totals, "o_orderstatus")
      .select(col("o_orderstatus"), col("n_sampled"), col("n_total")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val rate = r.getLong(1).toDouble / r.getLong(2)
      assert(rate > 0.10 && rate < 0.30,
        s"stratum ${r.getString(0)}: rate $rate outside [0.10, 0.30]")
    }
  }

  test("randomSplitSizes: partitions the table, ~70/30") {
    val rows = Sources.randomSplitSizes(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.orders(spark, sf0001).count()
    assert(rows("train") + rows("test") == total, "split lost or duplicated rows")
    val frac = rows("train").toDouble / total
    assert(frac > 0.6 && frac < 0.8, s"train fraction $frac outside [0.6, 0.8]")
  }

  test("csvRoundtrip aggregate equals the parquet-side aggregate") {
    val fromCsv = Sources.csvRoundtrip(spark, sf0001).collect().toSeq
    val fromParquet = Tables.supplier(spark, sf0001)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        graft.functions.Det.dsum(col("s_acctbal")).as("sum_acctbal"),
        min(col("s_name")).as("first_name"))
      .orderBy(col("s_nationkey")).collect().toSeq
    assert(fromCsv == fromParquet)
  }
}
