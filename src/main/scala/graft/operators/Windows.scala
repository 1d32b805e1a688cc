package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det._

/** Window-function catalog — SURVEY.md §2.6–2.7 (W1/W2, A9 replacement,
  * O2/O7) over the harness tables.
  *
  * Scale notes: the reference's windows use an empty PARTITION BY (a single-
  * partition exchange — fine over grouped output of ~25 rows, an anti-pattern
  * over raw data; SURVEY.md §7.6). Catalog rule: unpartitioned windows only
  * ever run on top of an aggregate whose cardinality is O(|groups|); all
  * row-level windows partition by a real key (custkey/suppkey/user_id).
  */
object Windows {

  /** W2 + flagship (SURVEY.md §7.3): CTE → multi-agg + countDistinct →
    * HAVING → RANK() → top-k. Ref: /root/reference/code/03_SQLOperations.scala:106-127. */
  def rankTopNations(spark: SparkSession, dir: String): DataFrame = {
    val agg = Aggregates.nationRevenue(spark, dir)
      .filter(col("n_orders") >= 20)
    // unique tiebreak (n_name) so rank is deterministic across engines
    val w = Window.orderBy(col("avg_order_value").desc, col("n_name"))
    agg.withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .orderBy(col("rnk"), col("n_name"))
  }

  /** W1: grand-total analytic over an aggregate — AVG(AVG(x)) OVER ().
    * Unpartitioned window over ≤25 grouped rows (documented constraint).
    * Ref: /root/reference/code/03_SQLOperations.scala:79-94. */
  def grandAvgDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val byPriority = o.groupBy(col("o_orderpriority"))
      .agg(davg(col("o_totalprice")).as("avg_price"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy() // empty: grand total over grouped output
    // overall_avg sums 5 doubles in engine-dependent order → round to 6
    // (the catalog's libm/fold-order determinism rule); diff subtracts the
    // ROUNDED value so both engines subtract identical doubles
    byPriority
      .withColumn("overall_avg", round(avg(col("avg_price")).over(w), 6))
      .withColumn("diff_from_overall", round(col("avg_price") - col("overall_avg"), 6))
      .orderBy(col("o_orderpriority"))
  }

  /** A9 replacement: percentile tiering WITHOUT a global window. The naive
    * shape — `ntile(3) OVER (ORDER BY price)` on the raw fact table — forces
    * a SinglePartition exchange (every row through one task; round-1 verdict
    * flagged it as the catalog's worst scale anti-pattern). Instead: exact
    * 1/3–2/3 cutoffs in a 1-row aggregate (partial agg buffers a value→count
    * map bounded by distinct-price cardinality, not row count), broadcast
    * back over the fact scan, tier via a `when` chain, hash-agg per tier.
    * No global sort anywhere; at extreme scale swap `percentile` for
    * `approx_percentile` with no plan change.
    * Ref: /root/reference/code/02_RDDOperations.scala:111-156 (driver-side
    * percentile cutoffs → here an in-plan broadcast relation). */
  def ntileTiers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    // cutoffs rounded to 6 (the module's libm/fold-order determinism rule,
    // cf. grandAvgDiff): Spark's percentile and DuckDB's quantile_cont use
    // different interpolation formulas that can differ in the last ulp —
    // a price landing exactly on an unrounded cutoff would flip tiers in
    // one engine only. Prices have 2 decimals, so round-6 can't move a
    // cutoff across a data value.
    val cuts = o.agg(
      round(percentile(col("o_totalprice"), lit(1.0 / 3)), 6).as("c1"),
      round(percentile(col("o_totalprice"), lit(2.0 / 3)), 6).as("c2"))
    o.crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col("o_totalprice") <= col("c1"), 1L)
          .when(col("o_totalprice") <= col("c2"), 2L)
          .otherwise(3L))
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        davg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("tier"))
  }

  /** lag/lead: per-customer consecutive order-value delta (partitioned
    * window — scales by key). Reference gap filled per SURVEY.md §2.6. */
  def lagDelta(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("delta", col("o_totalprice") - col("prev_price"))
      .withColumn("order_seq", row_number().over(w).cast("long"))
      .filter(col("order_seq") <= 3)
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** Explicit ROWS frame: per-supplier 3-row moving sum of quantities by
    * ship date (deterministic order via unique (orderkey, linenumber)). */
  def movingSum(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("moving_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(w.rowsBetween(-2, 0)).cast("double"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Explicit RANGE frame — the VALUE-based sibling of `movingSum`'s
    * ROWS frame: per-user trailing-1-hour event sum/count ordered by epoch
    * seconds (`RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW`). A RANGE
    * frame is what time-decayed features actually need: ROWS frames count
    * physical neighbors, RANGE frames select by timestamp distance, and
    * peers (same-second events) enter the frame together regardless of
    * tie order — which also makes the aggregate deterministic without a
    * peer tiebreak. Money stays exact: the summed metric is
    * `floor(value·100)` cents (floor of identical doubles — exact in both
    * engines), so the trailing sums are pure BIGINT. */
  def timeRangeSum(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("ts_s"),
        floor(col("value") * 100).cast("long").as("cents"))
    val wr = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-3599, 0)
    val wn = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    e.withColumn("hr_cents", sum(col("cents")).over(wr))
      .withColumn("hr_events", count(lit(1)).over(wr))
      .withColumn("rn", row_number().over(wn).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("user_id"), col("rn"))
  }

  /** Forward-fill (last observation carried forward) — the imputation
    * every feature/time-series pipeline needs for sparse signals: per
    * user, a deterministically-nulled metric (every 5th event reads as
    * missing) is filled with `last(..., ignoreNulls)` over a growing ROWS
    * frame — IGNORE NULLS window semantics, exercised nowhere else in the
    * catalog. Leading nulls (no prior observation) stay null, which the
    * oracle must reproduce exactly. Metric is floor-cents (exact BIGINT,
    * the win_time_range_sum rule); per-key window, scales by user. */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("ts_s"),
        when(col("event_id") % 5 =!= 0,
          floor(col("value") * 100).cast("long")).as("cents_obs"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    e.withColumn("cents_filled",
        last(col("cents_obs"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 4)
      .orderBy(col("user_id"), col("rn"))
  }

  /** Ranking-function breadth: row_number / dense_rank / percent_rank /
    * cume_dist / lead in one partitioned window (per-priority top-3 by
    * price). percent_rank and cume_dist are exact rationals — identical
    * IEEE doubles on both engines, no rounding needed. */
  def rankKinds(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Rolling OLS slope ("beta") of price on quantity per part — the
    * windowed-regression primitive (hedge ratios, sensor drift, price
    * elasticity) done with EXACT integer moments: the five sufficient
    * statistics (n, Σq, Σc, Σqc, Σq²) accumulate as BIGINT in ONE shared
    * 21-row frame (Spark evaluates all five in a single WindowExec pass —
    * one shuffle+sort on the part key), then
    * beta_micro = 10⁶·(nΣqc − ΣqΣc) div (nΣq² − (Σq)²), a micro-scaled
    * integral quotient. The numerator CAN be negative, where Spark's
    * `div` truncates toward zero but DuckDB's `//` floors — so the oracle
    * spells truncation explicitly (sign-split abs division); the
    * denominator is a scaled variance, ≥ 0 by Cauchy–Schwarz, NULLIF'd at
    * zero (constant-quantity windows have no defined slope). Peak
    * magnitude ~4·10¹⁷ < 2⁶³ — bounds in-comment, no silent wrap. */
  def rollingBeta(spark: SparkSession, dir: String): DataFrame = {
    val fr = Window.partitionBy(col("part"))
      .orderBy(col("sd"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(-20, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_partkey") <= 200)
      .select(col("l_partkey").as("part"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("sd"),  // ordering only, never output: no epoch conversion needed
        col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .select(col("part"), col("l_orderkey"), col("l_linenumber"),
        count(lit(1)).over(fr).as("n"),
        sum(col("q")).over(fr).as("sq"),
        sum(col("c")).over(fr).as("sc"),
        sum(col("q") * col("c")).over(fr).as("sqc"),
        sum(col("q") * col("q")).over(fr).as("sqq"))
      .select(col("part"), col("l_orderkey"), col("l_linenumber"), col("n"),
        expr("(1000000L * (n*sqc - sq*sc)) div nullif(n*sqq - sq*sq, 0)")
          .as("beta_micro"))
      .orderBy(col("part"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Peak-to-trough drawdown over the daily revenue series — the ops/
    * finance curve behind "how far below our best day are we": daily
    * purchase revenue vs its running peak, per-day drawdown in cents and
    * basis points, plus the running maximum drawdown so the final row
    * carries the headline number. The unpartitioned window is legal by
    * the module rule: it sits on the DAILY AGGREGATE (O(|days|) rows,
    * ~90 here and bounded by calendar at any corpus size), never on raw
    * events — the one user_id-free shuffle is |days|-sized.
    *
    * Determinism: revenue is exact cents (`decimal(18,2)·100 → long`,
    * the events-module money rule); dd_bp is integer `x·10000 DIV peak`
    * with a `peak > 0` guard mirrored in the oracle (Spark DIV NULL vs
    * DuckDB `//` error on a zero-cent opening day). */
  def peakDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("rev_cents"))
    val cum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak_cents", max(col("rev_cents")).over(cum))
      .withColumn("dd_cents", col("peak_cents") - col("rev_cents"))
      .withColumn("dd_bp", when(col("peak_cents") > 0,
        expr("dd_cents * 10000 DIV peak_cents")))
      .withColumn("max_dd_cents", max(col("dd_cents")).over(cum))
      .orderBy(col("day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_peak_drawdown" -> (peakDrawdown _),
    "win_rolling_beta" -> (rollingBeta _),
    "win_rank_topn"      -> (rankTopNations _),
    "win_grand_avg_diff" -> (grandAvgDiff _),
    "win_ntile_tiers"    -> (ntileTiers _),
    "win_lag_delta"      -> (lagDelta _),
    "win_moving_sum"     -> (movingSum _),
    "win_time_range_sum" -> (timeRangeSum _),
    "win_forward_fill"   -> (forwardFill _),
    "win_rank_kinds"     -> (rankKinds _)
  )

  val oracle: Map[String, String] = Map(
    "win_peak_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |curve AS (
        |  SELECT day, rev_cents,
        |    MAX(rev_cents) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_cents
        |  FROM daily)
        |SELECT day, rev_cents, peak_cents,
        |  peak_cents - rev_cents AS dd_cents,
        |  CASE WHEN peak_cents > 0
        |    THEN (peak_cents - rev_cents) * 10000 // peak_cents END AS dd_bp,
        |  MAX(peak_cents - rev_cents) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_dd_cents
        |FROM curve
        |ORDER BY day""".stripMargin,
    "win_rolling_beta" ->
      """WITH x AS (
        |  SELECT l_partkey AS part, l_orderkey, l_linenumber,
        |    l_shipdate AS sd,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem WHERE l_partkey <= 200),
        |w AS (
        |  SELECT part, l_orderkey, l_linenumber,
        |    COUNT(*)  OVER fr AS n,
        |    SUM(q)    OVER fr AS sq,
        |    SUM(c)    OVER fr AS sc,
        |    SUM(q*c)  OVER fr AS sqc,
        |    SUM(q*q)  OVER fr AS sqq
        |  FROM x
        |  WINDOW fr AS (PARTITION BY part ORDER BY sd, l_orderkey, l_linenumber
        |                ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT part, l_orderkey, l_linenumber, n,
        |    1000000 * (n*sqc - sq*sc) AS numer,
        |    NULLIF(n*sqq - sq*sq, 0) AS denom
        |  FROM w)
        |SELECT part, l_orderkey, l_linenumber, n,
        |  CASE WHEN numer < 0 THEN -((-numer) // denom)
        |       ELSE numer // denom END AS beta_micro
        |FROM m ORDER BY part, l_orderkey, l_linenumber""".stripMargin,
    "win_rank_topn" ->
      """WITH agg AS (
        |  SELECT n_name,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value,
        |    COUNT(DISTINCT c_custkey) AS n_customers
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |  HAVING COUNT(*) >= 20)
        |SELECT n_name, n_orders, total_value, avg_order_value, n_customers, rnk
        |FROM (SELECT *, RANK() OVER (ORDER BY avg_order_value DESC, n_name) AS rnk FROM agg)
        |WHERE rnk <= 10
        |ORDER BY rnk, n_name""".stripMargin,
    "win_grand_avg_diff" ->
      """WITH byp AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, avg_price, n_orders,
        |  ROUND(AVG(avg_price) OVER (), 6) AS overall_avg,
        |  ROUND(avg_price - ROUND(AVG(avg_price) OVER (), 6), 6) AS diff_from_overall
        |FROM byp
        |ORDER BY o_orderpriority""".stripMargin,
    "win_ntile_tiers" ->
      """WITH cuts AS (
        |  SELECT ROUND(quantile_cont(o_totalprice, 1.0/3), 6) AS c1,
        |         ROUND(quantile_cont(o_totalprice, 2.0/3), 6) AS c2
        |  FROM orders)
        |SELECT CAST(CASE WHEN o_totalprice <= c1 THEN 1
        |                 WHEN o_totalprice <= c2 THEN 2
        |                 ELSE 3 END AS BIGINT) AS tier,
        |  COUNT(*) AS n_orders,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
        |FROM orders, cuts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_lag_delta" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |    LAG(o_totalprice, 1) OVER w AS prev_price,
        |    o_totalprice - LAG(o_totalprice, 1) OVER w AS delta,
        |    ROW_NUMBER() OVER w AS order_seq
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE order_seq <= 3
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "win_rank_kinds" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER w AS rn,
        |    DENSE_RANK() OVER w AS drnk,
        |    PERCENT_RANK() OVER w AS pct_rank,
        |    CUME_DIST() OVER w AS cume,
        |    LEAD(o_totalprice, 1) OVER w AS next_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "win_time_range_sum" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id,
        |    epoch_us(ts) // 1000000 AS ts_s,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS BIGINT) AS hr_cents,
        |    COUNT(*) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS hr_events,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000000, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,
    "win_forward_fill" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id,
        |    epoch_us(ts) // 1000000 AS ts_s,
        |    CASE WHEN event_id % 5 <> 0
        |      THEN CAST(floor(value * 100) AS BIGINT) END AS cents_obs,
        |    LAST_VALUE(CASE WHEN event_id % 5 <> 0
        |        THEN CAST(floor(value * 100) AS BIGINT) END IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000000, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000000, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 4
        |ORDER BY user_id, rn""".stripMargin,
    "win_moving_sum" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |      PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin
  )
}
