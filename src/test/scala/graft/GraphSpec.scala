package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Invariants for the graph module (fixed-point PageRank + degree
  * histogram) that the DuckDB hash gate can't express:
  * handshake-lemma mass balance, the damping floor, and run-to-run
  * bit-determinism of the integer iteration.
  */
class GraphSpec extends SparkSpec {

  test("degree histogram obeys the handshake lemma") {
    val pairs = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), col("l_partkey")).distinct().count()
    val mass = Graph.degreeHistogram(spark, sf0001)
      .agg(sum(col("degree") * col("n_nodes"))).head().getLong(0)
    // undirected doubling: every distinct (s,p) pair contributes one out-edge
    // at each endpoint
    assert(mass == 2 * pairs, s"edge mass $mass != 2 * $pairs")
  }

  test("pagerank: top-25, every rank at or above the damping floor") {
    val rows = Graph.pagerank(spark, sf0001).collect()
    assert(rows.length == 25)
    val ranks = rows.map(_.getDouble(1))
    // r = 0.15 + 0.85 * (truncated nonneg sum) >= 0.15 for every node
    assert(ranks.forall(_ >= 0.15), s"rank below damping floor: ${ranks.min}")
    assert(ranks.sameElements(ranks.sorted(Ordering[Double].reverse)),
      "top-25 not rank-descending")
  }

  test("fixed-point iteration is bit-deterministic across runs") {
    val a = Graph.pagerank(spark, sf0001).collect().toSeq
    spark.catalog.clearCache()
    val b = Graph.pagerank(spark, sf0001).collect().toSeq
    assert(a == b)
  }
}
