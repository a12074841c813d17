package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trains the model-based quality filter (the GPT-3 / CCNet loop):
  * fit a logistic classifier on weakly-labeled documents — curated
  * corpus = positive, raw crawl = negative is the standard recipe —
  * then FREEZE the coefficients and score the full corpus with
  * [[graft.operators.TextAnalysis.classifierQualityFilter]], which
  * compiles the same weights into a pure per-row codegen expression.
  *
  * Training cost is one pass over the (small) labeled set; scoring
  * cost at 100 TB is zero beyond the scan the corpus already pays —
  * no model object is shipped to executors, just four double literals
  * in the plan. The featurizer is THE same expression triple the
  * filter uses (TextAnalysis.qualityFeatures), so train/serve skew is
  * structurally impossible. */
object QualityClassifier {

  /** Adds the three feature columns used at both train and serve time. */
  def featurize(df: DataFrame, textCol: String): DataFrame = {
    val (lenScore, punctClean, alphaRatio) =
      graft.operators.TextAnalysis.qualityFeatures(col(textCol))
    df.withColumn("__f_len", lenScore)
      .withColumn("__f_punct", punctClean)
      .withColumn("__f_alpha", alphaRatio)
  }

  /** Fit on `labeled` (labelCol ∈ {0, 1}; 1 = high quality). Returns
    * the frozen (bias, w_len, w_punctClean, w_alpha) tuple that
    * [[graft.operators.TextAnalysis.classifierQualityFilter]] accepts
    * directly. Deterministic: LBFGS from a zero start on a fixed
    * feature order has no seeded randomness. */
  def fit(labeled: DataFrame, textCol: String, labelCol: String,
      maxIter: Int = 100, regParam: Double = 0.0)
      : (Double, Double, Double, Double) = {
    val assembled = new VectorAssembler()
      .setInputCols(Array("__f_len", "__f_punct", "__f_alpha"))
      .setOutputCol("__features")
      .transform(featurize(labeled, textCol))
      .withColumn("__label", col(labelCol).cast("double"))
    val model = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(assembled)
    val w = model.coefficients.toArray
    (model.intercept, w(0), w(1), w(2))
  }
}
