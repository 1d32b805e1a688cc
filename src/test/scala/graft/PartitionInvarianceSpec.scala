package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-wide cluster-size independence: every deterministic entry must
  * return the exact same multiset of rows no matter how the engine
  * partitions the work. On a real cluster the shuffle partition count is a
  * deployment knob (AQE retunes it per stage); an answer that shifts when
  * the knob does is a latent 100 TB wrong-answer bug that small-SF oracle
  * gates can miss (they always run at one fixed partitioning).
  *
  * Method: run each entry twice on isolated `newSession()` clones — same
  * SparkContext, separate SQLConf and temp-view catalogs, so the sweep
  * cannot leak config into suites running in parallel (the same shared-
  * session clobbering class the graft_topk_keys builder fix closed) — at
  * deliberately co-prime shuffle-partition counts (3 vs 17, both != the
  * suite default 4) — the second run additionally with broadcast joins
  * and AQE disabled, so one compare certifies partition-count,
  * join-strategy, AND adaptive-replan independence — and compare an
  * order-invariant multiset digest computed in-plan (no driver-side row
  * materialization):
  *   count, sum(xxhash64(cols) mod p1), sum(xxhash64(cols) mod p2).
  * Residues are < 2^31 so the sums stay far from Long overflow under
  * ANSI mode at any realistic row count.
  *
  * Exclusions = exactly the catalog's no-oracle set (derived, so it can
  * never drift): the seeded-sample / trained-quantizer / approx entries
  * whose outputs are partition-dependent BY CONTRACT (per-partition RNG
  * streams, KMeans aggregation order) and are spec-gated elsewhere
  * (SamplingSpec rate bounds, SimilaritySpec recall floors).
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val mod1 = 1000000007L // both prime, keep each term < 2^31
  private val mod2 = 998244353L

  private def digest(df: DataFrame): Seq[Any] = {
    // columns sorted by name, values stringified — the driver's compare
    // canonicalization, so this digest certifies the same surface the
    // oracle gate hashes
    val h = xxhash64(df.columns.sorted.map(c => col(c).cast("string")).toSeq: _*)
    df.select(
        count(lit(1)),
        sum(pmod(h, lit(mod1))),
        sum(pmod(h, lit(mod2))))
      .head().toSeq
  }

  private def runAt(partitions: Int, name: String, hostile: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): Seq[Any] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    if (hostile) {
      // the "hostile deployment" run: no broadcast joins (every join
      // becomes a shuffle join — strategy choice must never change the
      // answer) and no adaptive re-planning (static plans only). One
      // digest compare thus certifies partition-count, join-strategy,
      // and AQE independence at once.
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
    }
    digest(fn(s, sf0001))
  }

  test("every oracled entry is invariant to the shuffle partition count") {
    val partitionDependent = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val swept = SparkEntry.queries.toSeq
      .filterNot { case (n, _) => partitionDependent(n) }
      .sortBy(_._1)
    assert(swept.size >= 140, s"sweep unexpectedly small: ${swept.size}")
    val failures = swept.flatMap { case (name, fn) =>
      try {
        val a = runAt(3, name)(fn)
        val b = runAt(17, name, hostile = true)(fn)
        if (a == b) None
        else Some(s"$name: digest@3=$a digest@17/hostile=$b")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // entries cache() intermediates and the CacheManager is shared across
    // the newSession() isolates — drop the sweep's residue so later
    // suites (PlanSpec's shape pins especially) see fresh plans
    spark.catalog.clearCache()
  }
}
