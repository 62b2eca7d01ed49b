package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Learned quality classifier — the model-based filter stage a
  * production corpus pipeline trains on top of its rule-based verdict
  * (the fastText/logreg quality-classifier pattern: rules label a
  * seed set, a cheap linear model generalizes them). Here the label
  * IS the engine's own [[TextOps.qualityVerdict]] and the features
  * are engine-exact text statistics, so the whole train+score loop is
  * reproducible bit-for-bit across engines and cluster sizes:
  *
  *  - link function: the algebraic "fast sigmoid"
  *    p = 0.5·(1 + z/(1+|z|)) — add/div/abs only, every IEEE engine
  *    computes it identically, where exp()'s last-ulp varies by libm
  *    (the same reason the tf-idf family avoids ln());
  *  - gradients: per-doc contributions are rounded to INTEGER
  *    nano-units and summed as Longs — associative, so the result is
  *    independent of task/shuffle order (the embedding_centroids
  *    discipline), and the DuckDB oracle unrolls the SAME iterations
  *    as CTEs (the kmeans Lloyd-unroll pattern);
  *  - driver state: the weight vector (#features doubles) — the
  *    k-means-codebook bargain; each iteration is ONE map-side-
  *    combined aggregate over the checkpointed feature matrix.
  *
  * At 100 TB: feature extraction + labeling is one corpus scan
  * materialized once (narrow: 6 doubles/doc); each GD iteration scans
  * that, never the text again.
  */
object Classifier {

  val featureNames: Seq[String] = Seq("x0", "x1", "x2", "x3", "x4")
  val learningRate = 0.01
  val iterations = 3

  /** Engine-exact features: bias, chars/100, tokens/10, chars-per-
    * token, digit ratio. All integer counts or exact rational
    * divisions (empty-text guard on the ratios).
    */
  private def featureFrame(documents: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nTok = size(split(trim(col("text")), "\\s+")).cast("double")
    val digits =
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).cast("double")
    documents.select(col("doc_id"),
      lit(1.0).as("x0"),
      (nChars / 100.0).as("x1"),
      (nTok / 10.0).as("x2"),
      (nChars / nTok).as("x3"),
      when(length(col("text")) > 0, digits / nChars).otherwise(lit(0.0)).as("x4"))
  }

  private def labeled(documents: DataFrame): DataFrame =
    featureFrame(documents).join(
      TextOps.qualityVerdict(documents)
        .select(col("doc_id"), when(col("keep"), 1.0).otherwise(0.0).as("y")),
      "doc_id")

  /** z = w·x as the left-associated explicit sum — the association the
    * oracle's SQL `+` chain reproduces.
    */
  private def margin(w: Seq[Double]): Column =
    w.zipWithIndex.map { case (wj, j) => lit(wj) * col(s"x$j") }.reduce(_ + _)

  private def fastSigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** Full-batch GD. Returns the trained weight vector. */
  def trainWeights(documents: DataFrame): Seq[Double] = {
    val feats = labeled(documents).localCheckpoint(true)
    try {
      var w: Seq[Double] = Seq.fill(featureNames.size)(0.0)
      for (_ <- 1 to iterations) {
        val err = fastSigmoid(col("z")) - col("y")
        val row = feats.withColumn("z", margin(w))
          .select(featureNames.indices.map(j =>
            sum(round(err * col(s"x$j") * 1e9).cast(LongType)).as(s"g$j")): _*)
          .collect()(0)
        w = w.zipWithIndex.map { case (wj, j) =>
          // empty corpus → null sums → no update (weights stay 0)
          val g = if (row.isNullAt(j)) 0L else row.getLong(j)
          wj - learningRate * (g.toDouble / 1e9)
        }
      }
      w
    } finally org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(feats)
  }

  /** The trained model as a (feature, weight) table — the artifact. */
  def train(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    featureNames.zip(trainWeights(documents))
      .toDF("feature", "weight").orderBy("feature")
  }

  /** Per-doc classifier score under the trained weights, the
    * model's keep decision (p ≥ 0.5), and the rule label it was
    * trained against. Training happens inline (the weights are
    * driver-bounded literals in the scoring plan — no join).
    */
  def score(documents: DataFrame): DataFrame = {
    val w = trainWeights(documents)
    labeled(documents)
      .withColumn("z", margin(w))
      .withColumn("score", fastSigmoid(col("z")))
      .select(col("doc_id"), col("score"),
        (col("score") >= 0.5).as("predicted_keep"),
        (col("y") === 1.0).as("keep"))
      .orderBy("doc_id")
  }
}
