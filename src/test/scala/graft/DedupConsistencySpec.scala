package graft

import graft.operators.Dedup

/** Cross-operator consistency: the dedup paths are independent
  * implementations over the same corpus, so set-algebra relations between
  * their outputs are theorems, not coincidences — stronger evidence than
  * any single oracle because a bug would have to break two pipelines in
  * the same way to pass.
  */
class DedupConsistencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH pairs are a subset of exact inverted-index Jaccard pairs") {
    // minhash verifies candidates with the SAME exact jaccard >= 0.7 the
    // inverted-index path computes, and the inverted-index path is complete
    // (df cap is a no-op here, pinned by OperatorSpec) — so minhash ⊆ ngram,
    // with the gap = banding recall loss
    val mh = pairSet(Dedup.minhashLsh(spark, sf))
    val exact = pairSet(Dedup.ngramJaccard(spark, sf))
    assert(mh.nonEmpty && exact.nonEmpty)
    val invented = mh -- exact
    assert(invented.isEmpty, s"minhash invented pairs not in exact set: $invented")
    val recall = (mh intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall vs exact inverted index")
  }

  test("exact simhash clusters are a subset of the Hamming<=1 pair set") {
    // same-signature pairs have hamming 0, so every cluster pair must
    // reappear in the hamming entry's output
    val clusters = Dedup.simhashClusters(spark, sf).collect()
    val hamming = pairSet(Dedup.simhashHamming(spark, sf))
    assert(clusters.nonEmpty && hamming.nonEmpty)
    // each cluster's (min_doc, max_doc) is one of its same-signature pairs
    clusters.filter(_.getAs[Long]("n_docs") > 1).foreach { c =>
      val pair = (c.getAs[Long]("min_doc"), c.getAs[Long]("max_doc"))
      assert(hamming.contains(pair), s"cluster pair $pair missing from hamming set")
    }
  }

  test("containment dominates Jaccard on every shared pair") {
    // theorem: C(a→b) = |∩|/|S(a)| >= |∩|/|∪| = J(a,b). So any jaccard
    // pair with jaccard >= 0.8 (containment's own cut) and n_inter >= 5
    // (which forces |S(a)| >= 5, clearing the min-size floor) MUST
    // reappear in the containment entry, scored at least as high — two
    // independent pipelines over the same index agreeing on a strict
    // inequality, not just set overlap
    val jac = Dedup.ngramJaccard(spark, sf)
      .filter("jaccard >= 0.8 AND n_inter >= 5")
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    val cont = Dedup.containmentPairs(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("containment"))
      .toMap
    assert(jac.nonEmpty && cont.nonEmpty)
    jac.foreach { case (pair, j) =>
      val c = cont.get(pair)
      assert(c.isDefined, s"jaccard pair $pair (j=$j) missing from containment set")
      assert(c.get >= j - 1e-12, s"containment ${c.get} < jaccard $j for $pair")
    }
  }
}
