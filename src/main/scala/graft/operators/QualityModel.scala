package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the LEARNED stage of a training-data
  * pipeline that follows the heuristic gates (reference behavior:
  * CCNet / GPT-3-style "quality classifier" pass; the heuristic gates
  * live in [[TextAnalysis.qualityFilter]]).
  *
  * A linear classifier over hashed bag-of-tokens features is fit on a
  * WEAK label (any boolean column — a heuristic gate, a domain
  * whitelist, human ratings joined in) and its calibrated probability
  * becomes the corpus-wide quality score, replacing the hard heuristic
  * with a rankable signal.
  *
  * 100 TB shape: the fit runs on the non-holdout subset of whatever
  * `df` the caller passes — at scale pass a bounded deterministic
  * sample (e.g. `hashBucket(id) < n`, [[Splits.hashBucket]]); fitting
  * a linear model never needs the full corpus. SCORING does see every
  * row and is map-only: HashingTF (murmur3, engine-deterministic) and
  * the model's coefficient vector (a few KB, broadcast inside
  * spark.ml's transform) make the score a pure per-row projection —
  * no shuffle at any corpus size. The fitted model is a pure function
  * of (input, params), so it is cached per process ([[ModelCache]])
  * like the LSH planes and IVF centroids.
  */
object QualityModel {

  /** Fit on the weak label, score every row.
    *
    * Output: (idCol, holdout, weak_label, prob, predicted) — `holdout`
    * rows (deterministic md5-bucket split, [[Splits.hashBucket]] %
    * `holdoutDen` == 0) are excluded from the fit, so agreement between
    * `predicted` and `weak_label` on them is an unbiased generalization
    * check (the q_quality_model gate).
    */
  def fitScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weakLabel: Column,
      numFeatures: Int = 1 << 10,
      holdoutDen: Int = 4,
      maxIter: Int = 20,
      regParam: Double = 0.01): DataFrame = {
    require(holdoutDen >= 2, "holdoutDen must leave rows to train on")
    val featured = df.select(
      col(idCol),
      weakLabel.cast("double").as("__label"),
      TextAnalysis.tokens(col(textCol)).as("__toks"),
      (Splits.hashBucket(col(idCol)) % holdoutDen === 0).as("__holdout"))
    val tf = new HashingTF()
      .setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    val vectors = tf.transform(featured)
      .select(col(idCol), col("__label"), col("__holdout"), col("__features"))
    val model = ModelCache.getOrFit[LogisticRegressionModel](
      vectors, s"lrq|$numFeatures|$holdoutDen|$maxIter|$regParam") {
      // The train side is small by contract (callers pre-sample at
      // scale); cache it across LBFGS iterations, few partitions so
      // each iteration is not 32 near-empty tasks.
      val train = vectors.filter(!col("__holdout"))
        .select("__label", "__features").coalesce(8).cache()
      val lr = new LogisticRegression()
        .setLabelCol("__label").setFeaturesCol("__features")
        .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      try lr.fit(train)
      finally train.unpersist(blocking = false)
    }
    model.transform(vectors)
      .select(col(idCol), col("__holdout").as("holdout"),
        col("__label").cast("boolean").as("weak_label"),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("prob"),
        (col("prediction") > 0.5).as("predicted"))
  }
}
