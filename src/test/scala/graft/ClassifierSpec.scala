package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier
import graft.sources.Tables

class ClassifierSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.documents(spark, sf)

  test("training moves the weights and is bit-deterministic across runs") {
    val w1 = Classifier.trainWeights(docs)
    val w2 = Classifier.trainWeights(docs)
    assert(w1 === w2, "same corpus must train the same model bit-for-bit")
    assert(w1.exists(_ != 0.0), "three GD iterations must move some weight")
    assert(w1.size === Classifier.featureNames.size)
  }

  test("scores are probabilities; predicted_keep is exactly score >= 0.5") {
    val r = Classifier.score(docs).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val s = row.getDouble(1)
      assert(s > 0.0 && s < 1.0, "fast sigmoid maps finite margins inside (0,1)")
      assert(row.getBoolean(2) === (s >= 0.5))
    }
    // the model is trained ON the rule verdict: report (don't overfit
    // an assertion to) its training-set agreement — 3 full-batch GD
    // steps from zero is a weak learner, the point is the PIPELINE
    val agree = r.count(row => row.getBoolean(2) == row.getBoolean(3))
    info(f"rule-label agreement = ${agree.toDouble / r.length}%.2f (${r.length} docs)")
  }

  test("weights stay finite on the real corpus; model table carries all features") {
    val w = Classifier.trainWeights(docs)
    assert(w.forall(x => !x.isNaN && !x.isInfinite),
      "degenerate features must not blow up the margin")
    val table = Classifier.train(docs).collect()
    assert(table.map(_.getString(0)).toSeq === Classifier.featureNames.sorted)
    assert(table.map(_.getDouble(1)).toSeq === w,
      "feature order in the artifact matches the weight vector")
  }
}
