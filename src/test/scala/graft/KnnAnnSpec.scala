package graft

import org.apache.spark.sql.functions._

/** Pins the contract of the kNN classifier's ANN tier
  * (`emb_knn_classifier_ann`) against the exact tier
  * (`emb_knn_classifier`): the band-candidate swap may trade a little
  * coverage and accuracy for the sub-quadratic plan, but both must stay
  * within declared bounds — and the plan itself must be the candidate
  * shape (no cartesian cross product, no global window over the scored
  * rows). */
class KnnAnnSpec extends SparkSpec {

  private def accuracyAndCoverage(name: String): (Double, Long) = {
    val cm = SparkEntry.queries(name)(spark, sfDir)
      .select(col("truth"), col("pred"), col("n_vecs")).collect()
    val total = cm.map(_.getLong(2)).sum
    val correct = cm.filter(r => r.get(0) == r.get(1)).map(_.getLong(2)).sum
    (correct.toDouble / total, total)
  }

  test("ANN tier: coverage and accuracy stay within declared bounds of the exact tier") {
    val (accExact, nExact) = accuracyAndCoverage("emb_knn_classifier")
    val (accAnn, nAnn) = accuracyAndCoverage("emb_knn_classifier_ann")
    // every classified test vector was a real test vector; the ANN tier
    // may drop (band-miss) but never invent
    assert(nAnn <= nExact)
    // coverage: at least 70% of test vectors share a band with some
    // train vector at the fixture banding (measured ~100% at sf0.001)
    assert(nAnn >= (nExact * 7) / 10,
      s"ANN classified $nAnn of $nExact test vectors")
    // accuracy: within 0.2 of the exact tier (measured delta ~0 —
    // candidates at this banding recover the true neighbors)
    assert(math.abs(accExact - accAnn) <= 0.2,
      s"exact=$accExact ann=$accAnn")
    graft.util.Views.unpersistAll()
  }

  test("ANN tier plans no cartesian product and no unpartitioned window") {
    val plan = SparkEntry.queries("emb_knn_classifier_ann")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    graft.util.Views.unpersistAll()
  }
}
