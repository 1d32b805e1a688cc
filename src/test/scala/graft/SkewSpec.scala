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
}
