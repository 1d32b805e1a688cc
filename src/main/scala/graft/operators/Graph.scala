package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the supplier–part bipartite graph implied by
  * lineitem (edge = "supplier ships part") — SURVEY.md §7.5 extension next
  * to dedup_cc_clusters' connected components: iterative computation
  * expressed as bounded rounds of join + hash-agg, the only graph pattern
  * that survives 100 TB (each round is one shuffle on the edge key; the
  * driver never sees a vertex).
  *
  * Node encoding: suppkey·2 for suppliers, partkey·2+1 for parts — a BIGINT
  * key keeps the per-round shuffle narrow (vs string-typed "s:123" ids).
  *
  * Determinism (hash-gate): the whole iteration runs in FIXED-POINT
  * micro-units (BIGINT, 1.0 = 1,000,000) — `r div d` integer division,
  * exact integer sums, damping as `150000 + (85·Σ) div 100`. Integer
  * arithmetic is bit-identical across engines (round-6 of a damped double
  * is NOT: a value landing within an ulp of a scale-6 midpoint rounds
  * differently in Spark's BigDecimal-HALF_UP vs DuckDB's scaled-multiply
  * round — observed at sf0.01 iteration 3). The only float op is the final
  * display divide r/1e6: one IEEE op on an exactly-representable long,
  * identical in both engines.
  */
object Graph {

  private val Iters = 3

  /** Undirected edge list, both directions, from the distinct
    * supplier–part pairs. */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    e0.select((col("s") * 2).as("src"), (col("p") * 2 + 1).as("dst"))
      .unionByName(e0.select((col("p") * 2 + 1).as("src"), (col("s") * 2).as("dst")))
  }

  /** PageRank, `Iters` damped power iterations (d=0.85, uniform init 1.0),
    * top-25 nodes. Each iteration: join static (edges ⋈ degrees) with the
    * current ranks on src — one shuffle of the edge list per round — then
    * hash-agg on dst with map-side partials. The edge⋈degree relation is
    * cached once (real 3× reuse) and PRE-PARTITIONED on the join key: the
    * cached InMemoryTableScan reports HashPartitioning(src), so
    * EnsureRequirements skips the exchange on the edge side every
    * iteration — only the (node-sized, much smaller) rank relation
    * shuffles per round. Rank relations stay lazy lineage. A fixed
    * iteration count (not convergence-to-ε) keeps the plan static and the
    * oracle expressible as chained CTEs. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val ed = edges(spark, dir)
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val withDeg = ed.join(deg, "src").repartition(col("src")).cache()
    var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to Iters) {
      r = withDeg.join(r, withDeg("src") === r("node"))
        .select(col("dst"), expr("r div d").as("contrib"))
        .groupBy(col("dst"))
        .agg(expr("150000L + (85 * sum(contrib)) div 100").as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    r.select(col("node"), (col("r") / lit(1000000.0)).as("rank"))
      .orderBy(desc("rank"), col("node")).limit(25)
  }

  /** Degree distribution — the first diagnostic run on any production
    * graph (skew detection before the expensive iteration): node degree →
    * frequency histogram. Two chained hash-aggs, output bounded by
    * |distinct degrees|. */
  def degreeHistogram(spark: SparkSession, dir: String): DataFrame =
    edges(spark, dir)
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank"   -> (pagerank _),
    "graph_degree_hist" -> (degreeHistogram _)
  )

  private val edgeCtes =
    """e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT s * 2 AS src, p * 2 + 1 AS dst FROM e0
      |  UNION ALL
      |  SELECT p * 2 + 1 AS src, s * 2 AS dst FROM e0),
      |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)""".stripMargin

  private def iterCte(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT e.dst AS node,
       |    150000 + (85 * CAST(SUM(r.r // deg.d) AS BIGINT)) // 100 AS r
       |  FROM edges e
       |  JOIN $prev r ON e.src = r.node
       |  JOIN deg ON e.src = deg.src
       |  GROUP BY e.dst)""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH $edgeCtes,
         |r0 AS (SELECT src AS node, 1000000::BIGINT AS r FROM deg),
         |${iterCte("r0", "r1")},
         |${iterCte("r1", "r2")},
         |${iterCte("r2", "r3")}
         |SELECT node, r / 1000000.0 AS rank FROM r3
         |ORDER BY rank DESC, node
         |LIMIT 25""".stripMargin,
    "graph_degree_hist" ->
      s"""WITH $edgeCtes
         |SELECT d AS degree, COUNT(*) AS n_nodes
         |FROM deg
         |GROUP BY d
         |ORDER BY degree""".stripMargin
  )
}
