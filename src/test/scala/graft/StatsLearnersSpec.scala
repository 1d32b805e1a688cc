package graft

import org.apache.spark.sql.functions._

import graft.operators.{Aggregates, Behavior, Events, Similarity, TextAnalysis}

/** Semantic pins for the r8 statistics/learning wave that the DuckDB hash
  * gate can't express: mass-balance identities, monotonicity/bounds the
  * algorithms guarantee by construction, and agreement between the exact
  * and approximate arms. The oracle proves Spark ≡ DuckDB; these prove
  * both compute the THING the entry claims.
  */
class StatsLearnersSpec extends SparkSpec {

  test("markov attribution: removal effects and credits are coherent") {
    val rows = Behavior.markovAttribution(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pFull = rows.map(_.getLong(1)).distinct
    assert(pFull.length == 1, "p_full must be identical on every row")
    assert(pFull.head >= 0 && pFull.head <= 1000000)
    val removals = rows.map(_.getLong(2))
    // truncation is monotone: a removed-channel chain never converts MORE
    assert(removals.forall(r => r >= 0 && r <= 1000000))
    val credits = rows.map(_.getLong(3))
    // credit shares are a ppm partition of 1 (up to one DIV truncation ulp
    // per channel) whenever any removal effect is nonzero
    if (removals.sum > 0) {
      assert(credits.sum <= 1000000 &&
        credits.sum >= 1000000 - rows.length,
        s"credit shares ${credits.toSeq} do not partition 1e6")
    }
    // ordering coherence: bigger removal effect => bigger credit
    assert(rows.sortBy(_.getLong(2)).map(_.getLong(3)).toSeq ==
      rows.map(_.getLong(3)).toSeq.sorted,
      "credit order must follow removal order")
  }

  test("mutual information and chi-square are nonnegative and consistent") {
    val mi = Aggregates.mutualInfo(spark, sf0001).collect()
    assert(mi.nonEmpty)
    val miTotal = mi.head.getDouble(7)
    // MI >= 0 up to the round-9 lattice (one quantum per cell)
    assert(miTotal >= -1e-9 * mi.length, s"MI $miTotal negative beyond lattice")
    val chi = Aggregates.chi2Independence(spark, sf0001).collect()
    val chiTotal = chi.head.getDouble(5)
    assert(chiTotal >= 0.0)
    val v = chi.head.getDouble(7)
    assert(v >= 0.0 && v <= 1.0, s"Cramer's V $v outside [0,1]")
    // both probes must agree on the verdict's direction: (near-)independent
    // columns give small MI AND small V; strongly dependent give both large.
    // On this fixture the pair is near-independent.
    assert((miTotal < 0.05) == (v < 0.2),
      s"MI $miTotal and V $v disagree on dependence")
  }

  test("mmr: first pick is the relevance top-1, picks are distinct per query") {
    val picks = Similarity.mmrRerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity.knnBrute(spark, sf0001).collect()
      .filter(_.getLong(4) == 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byQ = picks.groupBy(_._1)
    byQ.foreach { case (q, ps) =>
      val ids = ps.sortBy(_._2).map(_._3)
      assert(ids.distinct.length == ids.length, s"q=$q picked a duplicate")
      val first = ps.find(_._2 == 1L).get
      assert(brute(q) == first._3,
        s"q=$q MMR pos-1 ${first._3} != brute top-1 ${brute(q)}")
    }
  }

  test("decision stump: split counts balance and the ranking is by gain") {
    val rows = Aggregates.decisionStump(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byFeature = rows.groupBy(_.getString(0))
    byFeature.foreach { case (_, rs) =>
      val tot = rs.map(r => r.getLong(2) + r.getLong(4)).distinct
      assert(tot.length == 1, "n_left + n_right must be constant per feature")
      rs.foreach { r =>
        assert(r.getLong(3) <= r.getLong(2) && r.getLong(5) <= r.getLong(4),
          "positives exceed split size")
      }
    }
    val gains = rows.sortBy(_.getLong(7)).map(_.getDouble(6))
    assert(gains.sameElements(gains.sorted(Ordering[Double].reverse)),
      "rk order must be gain-descending")
    assert(gains.forall(_ >= -1e-9), s"negative gain beyond lattice: ${gains.min}")
  }

  test("naive bayes: confusion matrix accounts for every test doc") {
    val rows = TextAnalysis.naiveBayes(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nTest = rows.map(_.getLong(3)).distinct
    assert(nTest.length == 1)
    assert(rows.map(_.getLong(2)).sum == nTest.head,
      "confusion cells must sum to n_test")
    val expected = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 5 === 0).count()
    assert(nTest.head == expected, s"n_test ${nTest.head} != fold size $expected")
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(diag == rows.head.getLong(4), "n_correct must equal the diagonal")
  }

  test("lloyd k-means: every vector is assigned, and IVF stays within cells") {
    val km = Similarity.kmeansLloyd(spark, sf0001).collect()
    val clusters = km.map(_.getLong(0)).distinct
    assert(clusters.length <= 8)
    val members = km.filter(_.getLong(1) == 1L).map(_.getLong(3)).sum
    val corpus = Tables.embeddings(spark, sf0001).count()
    assert(members == corpus, s"cluster sizes $members != corpus $corpus")
    val ivf = Similarity.knnIvfLloyd(spark, sf0001).collect()
    assert(ivf.nonEmpty)
    // top-5 relation shape: per query ranks are 1..k with k <= 5
    ivf.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val rns = rs.map(_.getLong(3)).sorted
      assert(rns.toSeq == (1L to rns.length).toSeq, s"q=$q ranks $rns not dense")
      assert(rns.length <= 5)
    }
  }

  test("growth accounting: weekly statuses partition that week's actives") {
    val ledger = Events.growthAccounting(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) + r.getLong(2) + r.getLong(3)))
      .toMap
    val actives = Tables.events(spark, sf0001)
      .select(expr("unix_micros(ts) DIV 604800000000").as("w"), col("user_id"))
      .distinct().groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    actives.foreach { case (w, n) =>
      assert(ledger.getOrElse(w, 0L) == n,
        s"week $w: new+retained+resurrected ${ledger.get(w)} != active $n")
    }
  }

  test("snaive backtest and acf agree on the hourly grid length") {
    val acf = Events.autocorrHourly(spark, sf0001).collect()
    assert(acf.nonEmpty)
    // n_terms at lag k must be grid_size - k: recover grid size from lag 1
    val byLag = acf.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grid = byLag(1L) + 1
    byLag.foreach { case (k, n) =>
      assert(n == grid - k, s"lag $k n_terms $n != ${grid - k}")
    }
    val bt = Events.snaiveBacktest(spark, sf0001).collect()
    assert(bt.length == 24, s"backtest must cover exactly the final day: ${bt.length}")
  }

  test("cms sketch never underestimates, and exact entries have zero overcount") {
    val rows = TextAnalysis.cmsSketch(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("halfsample ci brackets the overall mean with a positive width") {
    val rows = Behavior.halfsampleCi(spark, sf0001).collect()
    assert(rows.length == 16, s"expected 16 replicates, got ${rows.length}")
    val h = rows.head
    val (mean, lo, hi) = (h.getDouble(5), h.getDouble(7), h.getDouble(8))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] does not bracket $mean")
    assert(h.getDouble(6) >= 0.0)
  }

  test("lsh recall is a valid ppm ratio and matches its own mean") {
    val rows = Similarity.lshRecall(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val hits = rows.map(_.getLong(2)).sum
    val truths = rows.map(_.getLong(1)).sum
    val mean = rows.head.getLong(4)
    assert(mean == hits * 1000000L / truths,
      s"mean_recall_ppm $mean != recomputed ${hits * 1000000L / truths}")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "hits cannot exceed truth size")
    }
  }
}
