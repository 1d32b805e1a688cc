package graft

import graft.ml.PriceModel

/** ML gate (SURVEY.md §5, mirroring the reference's baseline-vs-model
  * comparison at /root/reference/code/04_MachineLearning.scala:259-286):
  * a trained model must beat the mean predictor on the seeded 70/30 split.
  * Seeds are fixed, but metric values remain partition-order sensitive, so
  * the assertions are threshold-based, not exact (never DuckDB-oracled). */
class MLSpec extends SparkSpec {

  test("linear regression beats the mean-predictor baseline at sf0.001") {
    val metrics = PriceModel.run(spark, sf0001, Seq("lr"))
    val baseline = metrics.find(_.model == "baseline_mean").get
    val lr = metrics.find(_.model == "lr").get
    assert(baseline.rmse > 0.0)
    assert(lr.rmse < baseline.rmse,
      s"lr rmse ${lr.rmse} did not beat baseline ${baseline.rmse}")
    assert(lr.r2 > 0.0, s"lr r2 ${lr.r2} not positive")
  }

  test("GBT beats the mean-predictor baseline at sf0.001 (M12)") {
    val metrics = PriceModel.run(spark, sf0001, Seq("gbt"))
    val baseline = metrics.find(_.model == "baseline_mean").get
    val gbt = metrics.find(_.model == "gbt").get
    assert(gbt.rmse < baseline.rmse,
      s"gbt rmse ${gbt.rmse} did not beat baseline ${baseline.rmse}")
    assert(gbt.r2 > 0.0, s"gbt r2 ${gbt.r2} not positive")
  }

  private def assertImportancesSane(imps: Seq[(Int, Double)]): Unit = {
    assert(imps.nonEmpty)
    assert(imps.forall(_._2 >= 0.0))
    assert(imps.map(_._2) == imps.map(_._2).sorted.reverse, "not descending")
    assert(imps.map(_._2).sum <= 1.0 + 1e-9)
    assert(imps.head._2 > 0.0, "no feature carries any importance")
  }

  test("RF feature importances: top-k non-negative, sorted, sums <= 1") {
    assertImportancesSane(PriceModel.treeFeatureImportances(spark, sf0001, "rf", k = 15))
  }

  test("GBT feature importances: top-k non-negative, sorted, sums <= 1 (M14)") {
    assertImportancesSane(PriceModel.treeFeatureImportances(spark, sf0001, "gbt", k = 15))
  }

  test("cross-validated selection: picks a grid point, CV and test RMSE coherent") {
    val (bestReg, cvRmse, testRmse) = PriceModel.crossValidated(spark, sf0001)
    assert(Set(0.01, 0.5).contains(bestReg), s"best regParam $bestReg not in grid")
    assert(cvRmse > 0 && cvRmse.isFinite, s"degenerate CV rmse $cvRmse")
    assert(testRmse > 0 && testRmse.isFinite, s"degenerate test rmse $testRmse")
    // the CV estimate must be in the same regime as held-out truth: a 3x
    // divergence would mean the folds are broken (leakage or tiny folds)
    assert(testRmse < cvRmse * 3 && cvRmse < testRmse * 3,
      s"CV estimate $cvRmse vs test $testRmse diverge")
    // selection is seeded end-to-end: a second run must agree
    val (bestReg2, cvRmse2, _) = PriceModel.crossValidated(spark, sf0001)
    assert(bestReg2 == bestReg && cvRmse2 == cvRmse, "CV selection not reproducible")
  }
}
