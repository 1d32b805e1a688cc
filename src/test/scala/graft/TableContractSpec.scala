package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Data-contract smoke tests for every `Tables` loader.
  *
  * The harness regenerates `/root/testdata` between rounds and has already
  * changed the physical encoding of `events.ts` once (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)), which silently compressed the decoded timeline ~1000×
  * under the then-hard-coded `div 1000` decode and broke 25 oracled entries
  * without a single red test. These assertions make the NEXT silent
  * regeneration fail loudly instead:
  *
  *   - `events.ts` must decode to TimestampType and span more than one day
  *     at sf0.001 (TESTDATA.md promises a ~30-day synthetic timeline; a
  *     1000×-compressed decode spans ~43 minutes and fails here).
  *   - every table must be non-empty and sit inside a generous row-count
  *     band for its scale factor — wide enough to survive regeneration
  *     noise, tight enough to catch an off-by-1000 scale mix-up.
  */
class TableContractSpec extends SparkSpec {

  test("events.ts decodes to a timestamp spanning the synthetic timeline") {
    val ev = Tables.events(spark, sf0001)
    val tsField = ev.schema.fields.find(_.name == "ts").getOrElse(fail("events has no ts column"))
    assert(
      tsField.dataType == TimestampType || tsField.dataType == TimestampNTZType,
      s"events.ts decoded as ${tsField.dataType}, expected a timestamp type")

    val row = ev.agg(
      min(col("ts")).as("lo"),
      max(col("ts")).as("hi"),
      count(lit(1)).as("n")
    ).head()
    val lo = row.getTimestamp(0).getTime
    val hi = row.getTimestamp(1).getTime
    val spanDays = (hi - lo).toDouble / 86400000.0
    assert(row.getLong(2) > 0, "events is empty")
    assert(spanDays > 1.0,
      f"events.ts spans only $spanDays%.3f days — a sub-day span means the " +
        "decode path divided real microseconds (or the generator changed); " +
        "check Tables.events' footer probe against the parquet schema")
    // and not absurdly long either — a nanos value decoded as micros would
    // inflate the timeline ~1000× past any plausible synthetic window
    assert(spanDays < 3650.0,
      f"events.ts spans $spanDays%.1f days — decode likely inflated the timeline")
  }

  test("every table loads non-empty with row counts in the sf0.001 band") {
    // bands are ±10× around the counts observed at sf0.001 — loose enough
    // for generator tweaks, tight enough to catch a scale-factor mix-up
    val bands: Seq[(String, Long, Long)] = Seq(
      ("region", 1L, 50L),
      ("nation", 5L, 250L),
      ("customer", 15L, 15000L),
      ("supplier", 1L, 1000L),
      ("part", 20L, 200000L),
      ("orders", 150L, 150000L),
      ("lineitem", 600L, 600000L),
      ("events", 100L, 1000000L),
      ("documents", 10L, 100000L),
      ("embeddings", 10L, 100000L)
    )
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation, "customer" -> Tables.customer,
      "supplier" -> Tables.supplier, "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    for ((name, lo, hi) <- bands) {
      val n = loaders(name)(spark, sf0001).count()
      assert(n >= lo && n <= hi,
        s"$name has $n rows at sf0.001, outside expected band [$lo, $hi] — " +
          "testdata regenerated with a different scale or a loader regressed")
    }
  }
}
