package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sort / limit / top-k (SURVEY.md §2.7) and set operations (§2.8).
  *
  * Scale notes: ORDER BY + LIMIT plans as TakeOrderedAndProject — each task
  * keeps a k-row heap, the driver merges k·|tasks| rows; no global sort, no
  * driver collect (this replaces the reference's `collect().takeRight(10)`
  * bottom-k, /root/reference/code/02_RDDOperations.scala:427-443).
  * Set ops are union-all (no shuffle) vs distinct-union/except/intersect
  * (one hash shuffle on the full row).
  */
object SortsAndSets {

  /** O2 top-k: highest-value orders, unique tiebreak on key. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** O7 bottom-k: ascending twin (in-plan, not a driver takeRight). */
  def bottomkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey"))
      .limit(10)

  /** EXPLICIT null ordering — the classic silent dialect divergence:
    * Spark orders NULLS FIRST on ASC / LAST on DESC by default, while
    * DuckDB defaults to NULLS LAST everywhere (and makes it configurable)
    * — so any rank/window over a NULLABLE key with implicit null order
    * can produce different row numbers per engine. This entry pins the
    * policy explicitly on BOTH sides (`desc_nulls_last` ↔ `DESC NULLS
    * LAST`): top-3 events per type by the nullable `value`, with the
    * per-type null count carried so the data genuinely contains the
    * hazard the entry is about. */
  def nullsExplicit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc_nulls_last, col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    val nulls = e.groupBy(col("event_type"))
      .agg(count(when(col("value").isNull, 1)).as("n_null_values"))
    e.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .join(nulls, "event_type")
      .select(col("event_type"), col("rn"), col("event_id"),
        col("value"), col("n_null_values"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** UNION ALL of two filtered projections + re-aggregation. */
  def unionHighValue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_totalprice") > 5000.0)
      .select(col("o_custkey"), lit("high").as("bucket"))
    val lo = o.filter(col("o_totalprice") < 100.0)
      .select(col("o_custkey"), lit("low").as("bucket"))
    hi.unionByName(lo)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"), countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("bucket"))
  }

  /** EXCEPT (distinct): customer keys with orders but no high-priority order. */
  def exceptCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val all  = o.select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    all.except(urgent).orderBy(col("o_custkey"))
  }

  /** INTERSECT (distinct): customer keys appearing in both priority classes. */
  def intersectCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val high   = o.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
    urgent.intersect(high).orderBy(col("o_custkey"))
  }

  /** EXCEPT ALL — the MULTISET difference the distinct variant silently
    * loses: each occurrence cancels one matching occurrence, so a customer
    * with 5 orders and 2 urgent ones keeps 3 rows (bag semantics; Spark
    * plans a count-and-replicate aggregate, not a distinct). Aggregated to
    * per-customer surviving multiplicities so the output is compact and
    * the bag arithmetic is what the hash gate checks. */
  def exceptAllOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val all = o.select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    all.exceptAll(urgent)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_surviving"))
      .orderBy(col("o_custkey"))
  }

  /** INTERSECT ALL twin: per-customer min(multiplicity) across the two
    * priority classes, kept as rows. */
  def intersectAllOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val high   = o.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
    urgent.intersectAll(high)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_common"))
      .orderBy(col("o_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_nulls_explicit" -> (nullsExplicit _),
    "set_except_all"      -> (exceptAllOrders _),
    "set_intersect_all"   -> (intersectAllOrders _),
    "sort_topk_orders"    -> (topkOrders _),
    "sort_bottomk_orders" -> (bottomkOrders _),
    "set_union_buckets"   -> (unionHighValue _),
    "set_except_cust"     -> (exceptCustomers _),
    "set_intersect_cust"  -> (intersectCustomers _)
  )

  val oracle: Map[String, String] = Map(
    "sort_nulls_explicit" ->
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value DESC NULLS LAST, event_id) AS rn
        |  FROM events),
        |n AS (
        |  SELECT event_type,
        |    COUNT(CASE WHEN value IS NULL THEN 1 END) AS n_null_values
        |  FROM events GROUP BY event_type)
        |SELECT r.event_type, r.rn, r.event_id, r.value, n.n_null_values
        |FROM r JOIN n ON r.event_type = n.event_type
        |WHERE r.rn <= 3
        |ORDER BY r.event_type, r.rn""".stripMargin,
    "set_except_all" ->
      """WITH s AS (
        |  SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_custkey, COUNT(*) AS n_surviving
        |FROM s GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "set_intersect_all" ->
      """WITH s AS (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        |SELECT o_custkey, COUNT(*) AS n_common
        |FROM s GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "sort_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "sort_bottomk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 10""".stripMargin,
    "set_union_buckets" ->
      """WITH u AS (
        |  SELECT o_custkey, 'high' AS bucket FROM orders WHERE o_totalprice > 5000.0
        |  UNION ALL
        |  SELECT o_custkey, 'low' AS bucket FROM orders WHERE o_totalprice < 100.0)
        |SELECT bucket, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers
        |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin,
    "set_except_cust" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect_cust" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin
  )
}
