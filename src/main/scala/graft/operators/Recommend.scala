package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket and item–item collaborative filtering over the order
  * graph — the recommendation leg next to `agg_basket_pairs`' raw
  * co-occurrence counts: association RULES (confidence/lift, the
  * "customers who bought A also bought B" scorer) and item–item COSINE
  * over the customer–part incidence matrix (the classic neighborhood CF
  * of Sarwar et al., WWW'01, re-expressed relationally).
  *
  * Scale stance (both entries): candidates come ONLY from an equi-join on
  * the shared basket key (orderkey / custkey) — cost Σ|basket|², the
  * standard co-occurrence bound — never an all-pairs item join. Item
  * marginals are a hash-agg; the candidate relation joins them twice by
  * item key. Top-k is TakeOrderedAndProject. At 100 TB the only added
  * knob is a hot-basket cap (drop pathological |basket| > B baskets, the
  * usual co-occurrence guard), which the data here doesn't need.
  *
  * Determinism: supports are exact longs; confidence/lift are exact
  * integer micro/ppm units via DIV (all operands positive, so Spark's
  * truncating `div` ≡ DuckDB's flooring `//`); cosine is the module libm
  * rule — ONE shared `ROUND(co / sqrt(na*nb), 6)` formula string, cast to
  * DECIMAL(18,6) in both engines. Long bounds: `n_ab·N·1e6` needs
  * |pairs-per-basket sum| · |baskets| < 9.2e12 — holds through sf10; at
  * warehouse scale lift the product to DECIMAL(38,0) (HUGEINT), the
  * repo-wide overflow rule. */
object Recommend {

  /** Association rules a→b with support/confidence/lift over order
    * baskets. Pair candidates from the orderkey equi-join (a < b keeps
    * one undirected candidate; both rule directions are emitted from it),
    * top-20 rules by lift with full tie-break. */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .cache() // feeds marginals AND the pair self-join (2×; released by
               // Verify/Bench's per-entry clearCache, the repo contract)
    val nBaskets = op.select(col("o")).distinct().agg(count(lit(1)).as("n_baskets"))
    val marg = op.groupBy(col("p")).agg(count(lit(1)).as("n_item"))
    val pairs = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
    // both rule directions from each undirected pair
    val rules = pairs.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("n_ab"))
      .unionByName(pairs.select(col("pb").as("antecedent"), col("pa").as("consequent"), col("n_ab")))
      .join(marg.select(col("p").as("antecedent"), col("n_item").as("n_ante")), "antecedent")
      .join(marg.select(col("p").as("consequent"), col("n_item").as("n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
    rules
      .withColumn("conf_ppm", expr("n_ab * 1000000 DIV n_ante"))
      .withColumn("lift_ppm", expr("n_ab * n_baskets * 1000000 DIV (n_ante * n_cons)"))
      .select(col("antecedent"), col("consequent"), col("n_ab"), col("n_ante"),
        col("n_cons"), col("n_baskets"), col("conf_ppm"), col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("conf_ppm").desc,
        col("antecedent"), col("consequent"))
      .limit(20)
  }

  /** Item–item cosine similarity over the binary customer×part incidence
    * matrix (a customer "rates" a part by having ever ordered it):
    * cos(a,b) = |Ua ∩ Ub| / √(|Ua|·|Ub|). Top-25 part pairs. */
  def itemCosine(spark: SparkSession, dir: String): DataFrame = {
    val cp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      .cache() // marginals + self-join (repo cache contract)
    val marg = cp.groupBy(col("p")).agg(count(lit(1)).as("n_users"))
    val co = cp.as("a").join(cp.as("b"),
        col("a.c") === col("b.c") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
      .agg(count(lit(1)).as("co_users"))
    co
      .join(marg.select(col("p").as("part_a"), col("n_users").as("n_a")), "part_a")
      .join(marg.select(col("p").as("part_b"), col("n_users").as("n_b")), "part_b")
      .withColumn("cosine",
        expr("ROUND(co_users / sqrt(n_a * n_b), 6)")
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .select(col("part_a"), col("part_b"), col("co_users"), col("n_a"),
        col("n_b"), col("cosine").cast("double").as("cosine"))
      .orderBy(col("cosine").desc, col("co_users").desc,
        col("part_a"), col("part_b"))
      .limit(25)
  }

  /** Sequential next-item recommendation — the TEMPORAL member of the
    * family: assoc rules and item-cosine score what sells TOGETHER; this
    * scores what sells NEXT ("customers who bought A came back for B"),
    * from consecutive order pairs per customer (orderdate order, orderkey
    * tie-break). Transition candidates come from two orderkey equi-joins
    * against the adjacent-order relation — cost Σ|basket_k|·|basket_k+1|
    * over adjacent pairs, the sequential analogue of the co-occurrence
    * bound, never an all-pairs item join; the adjacency window is
    * per-customer (never global). Confidence in exact ppm (positive DIV);
    * top-20 transitions by count with full tie-break. */
  def nextPart(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c")).orderBy(col("o_orderdate"), col("o"))
    val nxt = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c"), col("o_orderkey").as("o"), col("o_orderdate"))
      .withColumn("o_next", lead(col("o"), 1).over(w))
      .filter(col("o_next").isNotNull)
      .select(col("o"), col("o_next"))
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
      .cache() // both transition legs (repo cache contract)
    val trans = nxt
      .join(op.select(col("ok").as("o"), col("p").as("p_from")), "o")
      .join(op.select(col("ok").as("o_next"), col("p").as("p_to")), "o_next")
      .groupBy(col("p_from"), col("p_to"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTot = trans.groupBy(col("p_from")).agg(sum(col("n_trans")).as("n_from"))
    trans.join(fromTot, "p_from")
      .withColumn("conf_ppm", expr("n_trans * 1000000 DIV n_from"))
      .select(col("p_from"), col("p_to"), col("n_trans"), col("n_from"),
        col("conf_ppm"))
      .orderBy(col("n_trans").desc, col("p_from"), col("p_to"))
      .limit(20)
  }

  /** Rank-1 matrix factorization trained by ALS, entirely in-plan — the
    * MODEL-BASED member of the family (assoc rules and item-cosine are
    * memory-based): ratings r(c,p) = purchase counts over the customer ×
    * part incidence, factor vectors u (customers) and v (parts) fit by
    * two alternating least-squares rounds, then top-5 UNOBSERVED parts
    * per budget customer by predicted score u·v — the actual
    * recommendation readout. Rank-1 ALS on a nonnegative matrix is the
    * power iteration toward the dominant singular pair (the
    * `sim_pca_power` lesson applied to collaborative filtering), and
    * each half-step is the exact relational shape rank-k ALS shards at
    * 100 TB: join ratings to the fixed side on its key, one hash-agg per
    * entity, broadcast nothing data-sized.
    *
    * Determinism: ratings are exact longs; every update is
    * round6(double(Σ r·w) / double(Σ w²)) — exact decimal sums, ONE IEEE
    * division on identical operands in both engines, re-entering the
    * decimal lattice (the lrStep/Lloyd rule); scores are
    * round6(double(u)·double(v)); ranking ties break on part id. The
    * candidate set is |budget|·|parts| — bounded by the fixed serving
    * budget, the knnBrute contract. */
  def mfRank1(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d6 = DecimalType(18, 6)
    val obs = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .agg(count(lit(1)).as("r"))
      .cache() // 4 half-steps + the serving anti-join read it
    def updU(v: DataFrame): DataFrame = obs.join(v, "p")
      .groupBy(col("c"))
      .agg(round(sum(col("r") * col("v")).cast("double") /
        sum(col("v") * col("v")).cast("double"), 6).cast(d6).as("u"))
    def updV(u: DataFrame): DataFrame = obs.join(u, "c")
      .groupBy(col("p"))
      .agg(round(sum(col("r") * col("u")).cast("double") /
        sum(col("u") * col("u")).cast("double"), 6).cast(d6).as("v"))
    val v0 = obs.select(col("p")).distinct()
      .withColumn("v", lit(BigDecimal(1).setScale(6)).cast(d6))
    val u1 = updU(v0)
    val v1 = updV(u1)
    val u2 = updU(v1).cache() // candidate expansion + (transitively) v2
    val v2 = updV(u2)
    val cand = v2.crossJoin(broadcast(u2.filter(col("c") < 20)))
      .select(col("c"), col("p"),
        round(col("u").cast("double") * col("v").cast("double"), 6).as("score"))
    val unobs = cand.join(obs, Seq("c", "p"), "left_anti")
    unobs.withColumn("rn", row_number().over(
        Window.partitionBy(col("c")).orderBy(col("score").desc, col("p"))).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("c").as("custkey"), col("p").as("partkey"),
        col("score"), col("rn"))
      .orderBy(col("custkey"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_assoc_rules" -> (assocRules _),
    "rec_item_cosine" -> (itemCosine _),
    "rec_next_part" -> (nextPart _),
    "rec_mf_rank1" -> (mfRank1 _)
  )

  val oracle: Map[String, String] = Map(
    "rec_mf_rank1" ->
      """WITH obs AS (
        |  SELECT o_custkey AS c, l_partkey AS p, COUNT(*) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT p, CAST(1.000000 AS DECIMAL(18,6)) AS v FROM obs),
        |u1 AS (
        |  SELECT c, CAST(ROUND(CAST(SUM(r * v) AS DOUBLE)
        |    / CAST(SUM(v * v) AS DOUBLE), 6) AS DECIMAL(18,6)) AS u
        |  FROM obs JOIN v0 USING (p) GROUP BY c),
        |v1 AS (
        |  SELECT p, CAST(ROUND(CAST(SUM(r * u) AS DOUBLE)
        |    / CAST(SUM(u * u) AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
        |  FROM obs JOIN u1 USING (c) GROUP BY p),
        |u2 AS (
        |  SELECT c, CAST(ROUND(CAST(SUM(r * v) AS DOUBLE)
        |    / CAST(SUM(v * v) AS DOUBLE), 6) AS DECIMAL(18,6)) AS u
        |  FROM obs JOIN v1 USING (p) GROUP BY c),
        |v2 AS (
        |  SELECT p, CAST(ROUND(CAST(SUM(r * u) AS DOUBLE)
        |    / CAST(SUM(u * u) AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
        |  FROM obs JOIN u2 USING (c) GROUP BY p),
        |cand AS (
        |  SELECT u2.c, v2.p,
        |    ROUND(CAST(u2.u AS DOUBLE) * CAST(v2.v AS DOUBLE), 6) AS score
        |  FROM u2 CROSS JOIN v2 WHERE u2.c < 20),
        |unobs AS (
        |  SELECT cand.c, cand.p, cand.score FROM cand
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM obs WHERE obs.c = cand.c AND obs.p = cand.p)),
        |ranked AS (
        |  SELECT c, p, score,
        |    ROW_NUMBER() OVER (PARTITION BY c ORDER BY score DESC, p) AS rn
        |  FROM unobs)
        |SELECT c AS custkey, p AS partkey, score, rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY custkey, rn""".stripMargin,
    "rec_next_part" ->
      """WITH nxt0 AS (
        |  SELECT o_orderkey AS o,
        |    LEAD(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS o_next
        |  FROM orders),
        |nx AS (SELECT o, o_next FROM nxt0 WHERE o_next IS NOT NULL),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |trans AS (
        |  SELECT f.p AS p_from, t.p AS p_to, CAST(COUNT(*) AS BIGINT) AS n_trans
        |  FROM nx
        |  JOIN op f ON nx.o = f.ok
        |  JOIN op t ON nx.o_next = t.ok
        |  GROUP BY f.p, t.p),
        |ft AS (
        |  SELECT p_from, CAST(SUM(n_trans) AS BIGINT) AS n_from
        |  FROM trans GROUP BY p_from)
        |SELECT t.p_from, t.p_to, t.n_trans, ft.n_from,
        |  t.n_trans * 1000000 // ft.n_from AS conf_ppm
        |FROM trans t JOIN ft USING (p_from)
        |ORDER BY n_trans DESC, p_from, p_to
        |LIMIT 20""".stripMargin,
    "rec_assoc_rules" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |nb AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM op),
        |marg AS (SELECT p, COUNT(*) AS n_item FROM op GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_ab
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p),
        |rules AS (
        |  SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
        |  UNION ALL
        |  SELECT pb AS antecedent, pa AS consequent, n_ab FROM pairs),
        |j AS (
        |  SELECT r.antecedent, r.consequent, r.n_ab,
        |    ma.n_item AS n_ante, mc.n_item AS n_cons, nb.n_baskets
        |  FROM rules r
        |  JOIN marg ma ON ma.p = r.antecedent
        |  JOIN marg mc ON mc.p = r.consequent
        |  CROSS JOIN nb)
        |SELECT antecedent, consequent, n_ab, n_ante, n_cons, n_baskets,
        |  n_ab * 1000000 // n_ante AS conf_ppm,
        |  n_ab * n_baskets * 1000000 // (n_ante * n_cons) AS lift_ppm
        |FROM j
        |ORDER BY lift_ppm DESC, conf_ppm DESC, antecedent, consequent
        |LIMIT 20""".stripMargin,
    "rec_item_cosine" ->
      """WITH cp AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |marg AS (SELECT p, COUNT(*) AS n_users FROM cp GROUP BY p),
        |co AS (
        |  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS co_users
        |  FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
        |  GROUP BY a.p, b.p)
        |SELECT co.part_a, co.part_b, co_users, ma.n_users AS n_a,
        |  mb.n_users AS n_b,
        |  CAST(CAST(ROUND(co_users / sqrt(ma.n_users * mb.n_users), 6)
        |    AS DECIMAL(18,6)) AS DOUBLE) AS cosine
        |FROM co
        |JOIN marg ma ON ma.p = co.part_a
        |JOIN marg mb ON mb.p = co.part_b
        |ORDER BY cosine DESC, co_users DESC, part_a, part_b
        |LIMIT 25""".stripMargin
  )
}
