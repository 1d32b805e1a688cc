package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Pins the HAND-ROLLED bloom prefilter's two contracts
  * (`pipe_bloom_prefilter`; the engine-injected twin is RuntimeFilterSpec):
  *
  *  1. soundness — the candidate set NEVER loses a true match (bloom
  *     filters have no false negatives), so the exact verify step can
  *     recover the precise answer from candidates alone;
  *  2. selectivity — candidates are a strict subset of the probe side.
  *     Without this pin the entry could silently degenerate into
  *     "candidates = everything" (e.g. a broken hash making every
  *     position hit) and the oracle gate would still pass, because the
  *     final exact semi-join hides the prefilter entirely.
  */
class BloomSpec extends SparkSpec {

  test("bloom prefilter keeps every true match and narrows the probe side") {
    val (probe, candidates, evalFps) = TextAnalysis.bloomStages(spark, sf0001)
    val nProbe = probe.count()
    val nCand = candidates.count()
    val exactMatches = probe.join(evalFps, Seq("fp"), "left_semi")
    val nExact = exactMatches.count()
    assert(nExact > 0, "fixture must contain cross-split fingerprint matches")
    // soundness: every exact match survives the bloom (set inclusion, not
    // just counts — an FP hiding an FN would fool a count compare)
    assert(exactMatches.join(candidates, Seq("doc_id"), "left_anti").count() === 0,
      "bloom prefilter dropped a true match (false negative)")
    // selectivity: the prefilter must actually prefilter
    assert(nCand < nProbe,
      s"bloom candidates ($nCand) did not narrow the probe side ($nProbe)")
  }

  test("entry answer equals the bloom-free exact semi-join") {
    val viaBloom = TextAnalysis.bloomPrefilter(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (probe, _, evalFps) = TextAnalysis.bloomStages(spark, sf0001)
    val exact = probe.join(evalFps, Seq("fp"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_matched"))
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaBloom === exact)
  }
}
