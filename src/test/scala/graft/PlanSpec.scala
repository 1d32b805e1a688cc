package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.operators._

/** Physical-plan assertions (SURVEY.md §4): the catalog's scale behavior is
  * a property of the plans, not the data — so the plans are what the tests
  * pin. Each assertion encodes a "would this survive 100×?" invariant:
  * filters reach the parquet scan, dimension joins broadcast, aggregates
  * get map-side partials, top-k never globally sorts, and nothing
  * cartesian-products by accident.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("validity filter predicates push into the parquet scan") {
    val p = plan(Etl.validityFilter(spark, sf0001))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]].*"), // non-empty list
      s"no pushed filters:\n$p")
  }

  test("star join broadcasts every dimension side") {
    val p = plan(Joins.innerRevenue(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("aggregates use two-phase hash aggregation (map-side partials)") {
    val p = plan(Aggregates.nationRevenue(spark, sf0001))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(SortsAndSets.topkOrders(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("column pruning: scan of a 2-column aggregate reads only needed columns") {
    val p = plan(
      Tables.lineitem(spark, sf0001)
        .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
        .agg(org.apache.spark.sql.functions.sum("l_quantity")))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("no accidental cartesian products anywhere in the catalog") {
    // the all-pairs similarity shapes are *documented* nested-loop joins
    // (brute-force scoring); everything else must be hash/broadcast/sort-merge
    // text_tfidf crossJoins a broadcast 1-row aggregate (the in-plan scalar
    // pattern replacing a driver .count(), SURVEY.md A4/A9) — constant-size
    // build side, legal at any scale
    val allowedNestedLoop =
      Set("dedup_embedding_pairs", "sim_knn_brute", "sim_knn_lsh", "text_tfidf")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = try plan(fn(spark, sf0001)) catch { case _: Throwable => "" }
      if (p.contains("CartesianProduct")) Some(name)
      else if (p.contains("BroadcastNestedLoopJoin") &&
               !allowedNestedLoop.contains(name) &&
               !p.contains("Join LeftSemi") && name != "join_range_price_bands")
        Some(s"$name (nested loop)")
      else None
    }
    assert(offenders.isEmpty, s"unexpected cartesian/nested-loop: $offenders")
  }

  test("whole-stage codegen covers the dot-product pair loop") {
    val df = Dedup.embeddingPairs(spark, sf0001)
    df.collect() // materialize so AQE finalizes stages and codegen is decided
    // simple mode marks codegen'd operators with "*(id)"
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("*("), s"no whole-stage codegen span:\n$finalPlan")
    assert(plan(df).contains("graft_dot"), "custom expression missing from plan")
  }
}
