package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  /** Fit only: the LogisticRegressionModel for `df`'s non-holdout side
    * (cached per (input, params) — see [[fitScore]] for the contract).
    * Use with [[scoreColumn]] when the scoring pass should stay inside
    * whole-stage codegen instead of spark.ml's transform UDF. */
  /** The ONE featurization both [[fit]] and [[fitScore]] go through —
    * label cast, tokenization, md5-bucket holdout, HashingTF — so the
    * trained feature space and the scored feature space cannot drift
    * apart (a tokenizer change applied to one path but not the other
    * would silently train on one space and score on another). */
  private def featurize(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weakLabel: Column,
      numFeatures: Int,
      holdoutDen: Int,
      withId: Boolean): DataFrame = {
    val idCols = if (withId) Seq(col(idCol)) else Nil
    val featured = df.select(idCols ++ Seq(
      weakLabel.cast("double").as("__label"),
      TextAnalysis.tokens(col(textCol)).as("__toks"),
      (Splits.hashBucket(col(idCol)) % holdoutDen === 0).as("__holdout")): _*)
    val tf = new HashingTF()
      .setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    tf.transform(featured).select(idCols ++ Seq(
      col("__label"), col("__holdout"), col("__features")): _*)
  }

  def fit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weakLabel: Column,
      numFeatures: Int = 1 << 10,
      holdoutDen: Int = 4,
      maxIter: Int = 20,
      regParam: Double = 0.01): LogisticRegressionModel = {
    require(holdoutDen >= 2, "holdoutDen must leave rows to train on")
    val vectors = featurize(df, idCol, textCol, weakLabel,
      numFeatures, holdoutDen, withId = false)
    ModelCache.getOrFit[LogisticRegressionModel](
      vectors, s"lrq|$numFeatures|$holdoutDen|$maxIter|$regParam") {
      val train = vectors.filter(!col("__holdout"))
        .select("__label", "__features").coalesce(8).cache()
      val lr = new LogisticRegression()
        .setLabelCol("__label").setFeaturesCol("__features")
        .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      try lr.fit(train)
      finally train.unpersist(blocking = false)
    }
  }

  /** Codegen'd map-only scoring: the fitted model's probability as a
    * pure expression — `HashingTF`'s exact bucketing via the native
    * [[graft.functions.TfBucket]] expression (murmur3 `hashUnsafeBytes2`
    * seed 42 + nonNegativeMod; NOT SQL `hash()`, which uses a different
    * byte-tail fold) and the LR margin as an array-literal dot product,
    * so it matches `model.transform`'s probability up to double-addition
    * reordering (spec-pinned). spark.ml's transform routes every row
    * through a scala UDF (codegen barrier, vector boxing); this stays
    * inside whole-stage codegen — the shape the 100 TB scoring pass
    * should have. Coefficients ride the plan as an array literal
    * (numFeatures ≤ ~64k keeps that sane; default 1024). */
  def scoreColumn(
      text: Column,
      coefficients: Array[Double],
      intercept: Double): Column = {
    val n = coefficients.length
    require(n > 0, "empty coefficient vector")
    val coefLit = array(coefficients.toIndexedSeq.map(lit(_)): _*)
    val margin = aggregate(
      TextAnalysis.tokens(text),
      lit(intercept),
      (acc, t) => acc + element_at(coefLit,
        graft.functions.TfBucket.tfBucket(t, n) + 1))
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

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
    val model = fit(df, idCol, textCol, weakLabel,
      numFeatures, holdoutDen, maxIter, regParam)
    val vectors = featurize(df, idCol, textCol, weakLabel,
      numFeatures, holdoutDen, withId = true)
    model.transform(vectors)
      .select(col(idCol), col("__holdout").as("holdout"),
        col("__label").cast("boolean").as("weak_label"),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("prob"),
        (col("prediction") > 0.5).as("predicted"))
  }

  /** Reliability (calibration) table for a probabilistic score in
    * [0, 1] against a boolean label: scores bucket into `bins`
    * equal-width bins (1.0 folds into the top bin), and each bin
    * reports count, mean score, empirical label rate, and their gap —
    * the reliability-diagram table (DeGroot & Fienberg 1983; Guo et
    * al., "On Calibration of Modern Neural Networks", ICML 2017). The
    * report any learned quality scorer should ship with: a filter
    * thresholding an uncalibrated score keeps a different corpus than
    * its probability claims.
    *
    * Mean scores sum per-row FIXED-POINT micros (`round(score*1e6)`
    * as long) before dividing — integer addition commutes, so the
    * mean is bit-stable under Spark's partial-aggregation merge order
    * and hash-comparable against a SQL replay (the IVF drift report's
    * discipline).
    *
    * Scale shape: ONE partial-aggregating exchange on the bin key —
    * count/sum only, so every partition pre-folds to <= `bins` rows
    * before the wire regardless of corpus size (never a
    * distinct-aggregate funnel on the low-cardinality key). */
  def calibrationReport(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    val s = col(scoreCol).cast("double")
    // Null-label rows drop along with null scores — the shared contract
    // of all three report operators (rocAuc, thresholdReport): left in,
    // a null label counts toward each bin's n and mean_score while
    // sum(__pos) skips it, silently deflating label_rate and gap.
    df.filter(s.isNotNull && col(labelCol).isNotNull)
      // out-of-range scores clip into the edge bins (1.0 folds into
      // the top bin; a negative score would otherwise mint bin −k)
      .select(greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))
          .as("bin"),
        round(s * 1e6).cast("long").as("__micros"),
        col(labelCol).cast("boolean").cast("int").as("__pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__micros")).as("__sm"), sum(col("__pos")).as("__np"))
      .select(col("bin") +: col("n") +: reportRatioCols: _*)
  }

  /** The rounded report ratios (mean_score, label_rate, gap) over the
    * aggregated `(n, __sm, __np)` columns — INTEGER half-up rounding at
    * the micros level, `(2·x + n) div (2·n)`, shared by the global and
    * keyed reports (r17). The previous `round(double, 6)` form was
    * engine-DEPENDENT exactly at half-micro ties (sum/n = K.5e-6, which
    * small per-bin counts hit readily): Spark's round decimalizes the
    * double's shortest string representation (half-up), DuckDB rounds
    * the binary value — at sf0.001 nineteen keyed bins sat on ties and
    * one flipped (q_calibration_by mean_score 0.258459 vs 0.258458,
    * found and fixed this round; inherited, pre-dates the optimization
    * work). Integer division cannot disagree between engines, and at
    * every non-tie it equals the old rounding; at ties it fixes the
    * answer to half-up — the value Spark already produced. Overflow
    * bound unchanged: 2·n·1e6 must fit a long (n per bin < ~4.6e12). */
  private def reportRatioCols: Seq[Column] = Seq(
    (expr("(2 * __sm + n) div (2 * n)").cast("double") / 1e6)
      .as("mean_score"),
    (expr("(2 * __np * 1000000 + n) div (2 * n)").cast("double") / 1e6)
      .as("label_rate"),
    (expr("""CASE WHEN __np * 1000000 - __sm >= 0
        THEN (2 * (__np * 1000000 - __sm) + n) div (2 * n)
        ELSE -((2 * (__sm - __np * 1000000) + n) div (2 * n)) END""")
      .cast("double") / 1e6).as("gap"))

  /** ROC-AUC for a score against a boolean label, by the Mann-Whitney
    * rank identity: `AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg)`
    * with `R_pos` the positives' rank sum, tied scores carrying their
    * tie-block's AVERAGE rank (so AUC = P(s_pos > s_neg) + ½P(=), the
    * standard estimator). The ranking companion to
    * [[calibrationReport]]: calibration says whether the probabilities
    * are honest, AUC says whether the ORDER is useful — a threshold
    * filter only consumes the order.
    *
    * Scale shape: never a row-level global sort. Scores quantize to
    * `scale` decimals INSIDE the operator (half-up, the engine's
    * `round`), rows collapse to DISTINCT quantized values (one
    * partial-aggregating exchange on the score key — the hostReport
    * discipline), the running-count window then orders only the
    * distinct-score table — hard-bounded at 10^scale + 1 rows for
    * scores in [0, 1], so a caller feeding raw LR probabilities can no
    * longer trip a row-cardinality single-task sort (the round-14
    * unenforced-precondition finding) — and one final aggregate folds
    * the rank sums. Quantizing at 6 decimals moves AUC by at most
    * ~n_pos·n_neg·5e-7 worth of newly-tied pairs (each counted ½
    * instead of 0/1) — noise at any realistic score resolution; pass a
    * larger `scale` if the score genuinely carries more precision
    * (each extra decimal is a 10× wider window, still one exchange).
    * Every average rank is a multiple of ½ and rank-mass products are
    * exact in doubles, so the sums are order-independent — bit-stable
    * without fixed-point. */
  def rocAuc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9,
      s"scale must be in [0, 9] (10^scale bounds the ordered window); got $scale")
    val s = round(col(scoreCol).cast("double"), scale)
    // null LABELS drop too (same contract as thresholdReport): left
    // in, they would occupy rank positions while vanishing from
    // n_pos/n_neg, silently pushing AUC outside [0, 1].
    val grouped = df.filter(s.isNotNull && col(labelCol).isNotNull)
      .select(s.as("__score"),
        col(labelCol).cast("boolean").cast("int").as("__pos"))
      .groupBy(col("__score"))
      .agg(count(lit(1)).as("__n"), sum(col("__pos")).as("__np"))
    val w = Window.orderBy(col("__score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grouped
      // inclusive running count = rank of the tie block's LAST member;
      // the block's average rank is that minus (n−1)/2.
      .withColumn("__avg_rank",
        sum(col("__n")).over(w).cast("double") -
          (col("__n").cast("double") - 1) / 2)
    ranked.agg(
        sum(col("__np")).as("__npos"),
        sum(col("__n") - col("__np")).as("__nneg"),
        sum(col("__np").cast("double") * col("__avg_rank")).as("__rpos"))
      .select(col("__npos").as("n_pos"), col("__nneg").as("n_neg"),
        // single-class input: AUC undefined -> null, never an ANSI
        // divide-by-zero (thresholdReport's guard discipline)
        when(col("__npos") > 0 && col("__nneg") > 0,
          round((col("__rpos") -
              col("__npos").cast("double") * (col("__npos") + 1) / 2) /
            (col("__npos").cast("double") * col("__nneg")), 6)).as("auc"))
  }

  /** Confusion counts and the derived rates at a decision threshold —
    * what actually ships when a quality score becomes a FILTER: one
    * row `(tp, fp, fn, tn, precision, recall, f1)` for
    * `score >= threshold` against the boolean label. Rates are plain
    * count ratios rounded 6 (null when undefined: no predicted
    * positives → null precision, no actual positives → null recall —
    * never a silent 0 that reads as "terrible", never a division
    * error). One partial-aggregating global fold; the threshold
    * compare is row-local. */
  def thresholdReport(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame =
    confusionCore(df, Nil, scoreCol, labelCol, threshold)

  /** The ONE copy of the confusion/rate arithmetic both threshold
    * reports share (the [[isotonicFit]] discipline: empty `keys` IS
    * the global plan, so the two forms cannot silently fork). */
  private def confusionCore(
      df: DataFrame,
      keys: Seq[String],
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame = {
    keys.foreach(k => require(
      !Set("tp", "fp", "fn", "tn", "precision", "recall", "f1")
        .contains(k),
      s"key column '$k' collides with a report output column"))
    val s = col(scoreCol).cast("double")
    val pos = col(labelCol).cast("boolean")
    val pred = s >= threshold
    val keyFilter = keys
      .map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val cells = Seq(
      count(when(pred && pos, 1)).as("tp"),
      count(when(pred && !pos, 1)).as("fp"),
      count(when(!pred && pos, 1)).as("fn"),
      count(when(!pred && !pos, 1)).as("tn"))
    val filtered = df.filter(s.isNotNull && keyFilter)
    val agg =
      if (keys.isEmpty) filtered.agg(cells.head, cells.tail: _*)
      else filtered.groupBy(keys.map(col): _*)
        .agg(cells.head, cells.tail: _*)
    val prec = when(col("tp") + col("fp") > 0,
      round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
    val rec = when(col("tp") + col("fn") > 0,
      round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
    agg.select(keys.map(col) ++ Seq(
      col("tp"), col("fp"), col("fn"), col("tn"),
      prec.as("precision"), rec.as("recall"),
      when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
        round(lit(2.0) * col("tp") /
          (lit(2) * col("tp") + col("fp") + col("fn")), 6)).as("f1")): _*)
  }

  /** [[thresholdReport]] PER KEY — one confusion/rates row per group,
    * the filter-deployment view of the keyed family (a threshold
    * tuned on the pooled corpus can be badly wrong for one source):
    * same predicate arithmetic with the key carried, one keyed
    * partial-aggregating exchange, rates null where undefined. Rows
    * with a null score or null key drop (the shared keyed contract);
    * null-label rows count in no confusion cell, exactly as the
    * global form's `when` conditions skip them. */
  def thresholdReportBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame =
    confusionCore(df, Seq(keyCol), scoreCol, labelCol, threshold)

  /** Operating-point SELECTION — the step between the confusion
    * reports (which evaluate a caller-supplied threshold) and a
    * deployable filter: sweep every achievable threshold and return
    * the one maximizing the objective (`"f1"`, or `"youden"` =
    * TPR − FPR). Candidate thresholds are the QUANTIZED distinct
    * scores (`round(score, scale)` — the [[rocAuc]] grid contract:
    * for scores in [0, 1] the sweep is hard-bounded at 10^scale + 1
    * points regardless of corpus size; an unbounded score range
    * scales the grid with its span — quantize or squash upstream);
    * each candidate's confusion row comes from one descending
    * cumulative sum over that grid, NEVER a per-threshold corpus
    * pass. NaN scores drop with nulls (NaN sorts above every real
    * score in Spark, so left in it would become the top "threshold" —
    * an unmeasurable value must never be the operating point). Ties
    * on the (rounded) objective break to the HIGHEST threshold — the
    * most selective filter among equals, deterministically. The
    * selected row's counts are EXACTLY what [[applyThresholdBy]]
    * deploys: both sides evaluate `round(score, scale) >= threshold`,
    * so the prescription and the deployed filter cannot disagree
    * across the rounding half-band. The all-negative operating point
    * (threshold
    * above every score) is not a candidate: its F1 is never above an
    * achievable one, and with zero positives in the data the sweep
    * instead returns the max-threshold point (fewest false
    * positives), objective 0. Under `"youden"` a single-class input
    * has no measurable candidate and yields NO row — unmeasurable
    * never silently scores, the gate discipline.
    *
    * Output: `(threshold, tp, fp, fn, tn, precision, recall, f1,
    * youden)` — the [[thresholdReport]] arithmetic at the selected
    * point (both objectives always reported; `youden` null on a
    * single-class input). */
  def thresholdSelect(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      objective: String = "f1",
      scale: Int = 6): DataFrame =
    thresholdSelectCore(df, Nil, scoreCol, labelCol, objective, scale)

  /** [[thresholdSelect]] PER KEY — each source's own operating point
    * from its own score distribution (a pooled threshold can sit on
    * the wrong side of one source's score mass entirely), the
    * prescriptive arm the keyed report family ([[thresholdReportBy]],
    * [[rocAucBy]]) diagnoses for. One row per key with a measurable
    * objective; NULL-key rows drop (the shared keyed contract). Feed
    * the result to [[applyThresholdBy]] to deploy it as the per-source
    * filter.
    *
    * Scale shape: one keyed partial-aggregating exchange collapses
    * the corpus to the ≤ 10^scale + 1 distinct-score grid PER KEY,
    * the cumulative sweep windows PARTITION on the key over that
    * bounded grid, and the argmax is a keyed fold of grid rows —
    * corpus rows never cross more than the one grouped exchange
    * (spec-pinned: per-key ≡ global-on-slice, window partitions on
    * the key, grid bound via the aggregate's numOutputRows). */
  def thresholdSelectBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String,
      objective: String = "f1",
      scale: Int = 6): DataFrame =
    thresholdSelectCore(df, Seq(keyCol), scoreCol, labelCol, objective,
      scale)

  /** The ONE copy of the sweep/argmax arithmetic both selection forms
    * share (empty `keys` IS the global plan — the [[confusionCore]]
    * discipline, so per-key and pooled selection cannot silently
    * fork). */
  private def thresholdSelectCore(
      df: DataFrame,
      keys: Seq[String],
      scoreCol: String,
      labelCol: String,
      objective: String,
      scale: Int): DataFrame = {
    require(scale >= 0 && scale <= 9,
      s"scale must be in [0, 9] (10^scale bounds the sweep grid); got $scale")
    require(objective == "f1" || objective == "youden",
      s"objective must be 'f1' or 'youden', got '$objective'")
    keys.foreach(k => require(
      !Set("threshold", "tp", "fp", "fn", "tn", "precision", "recall",
        "f1", "youden").contains(k),
      s"key column '$k' collides with a selection output column"))
    val s = round(col(scoreCol).cast("double"), scale)
    val keyFilter = keys
      .map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val grouped = df
      .filter(s.isNotNull && !isnan(s) && col(labelCol).isNotNull &&
        keyFilter)
      .select(keys.map(col) ++ Seq(s.as("__score"),
        col(labelCol).cast("boolean").cast("int").as("__pos")): _*)
      .groupBy(keys.map(col) :+ col("__score"): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__pos")).as("__np"))
    // Both frames ride ONE key partitioning: the cumulative sweep
    // (ordered, running) and the per-key totals (whole partition).
    val part = Window.partitionBy(keys.map(col): _*)
    val cum = part.orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = grouped
      .withColumn("__tp", sum(col("__np")).over(cum))
      .withColumn("__pp", sum(col("__n")).over(cum))
      .withColumn("__npos", sum(col("__np")).over(part))
      .withColumn("__cn", sum(col("__n")).over(part))
      .withColumn("__fp", col("__pp") - col("__tp"))
      .withColumn("__fn", col("__npos") - col("__tp"))
      .withColumn("__tn", col("__cn") - col("__pp") - col("__fn"))
    // F1's denominator 2tp+fp+fn >= pp >= 1 at every candidate (each
    // grid point predicts at least its own rows positive), so the f1
    // objective is always measurable; Youden needs both classes.
    val f1 = round(lit(2.0) * col("__tp") /
      (lit(2) * col("__tp") + col("__fp") + col("__fn")), 6)
    val yj = when(col("__npos") > 0 && col("__cn") > col("__npos"),
      round(col("__tp").cast("double") / col("__npos") -
        col("__fp").cast("double") / (col("__cn") - col("__npos")), 6))
    val best = cand
      .withColumn("__obj", if (objective == "f1") f1 else yj)
      .filter(col("__obj").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(max(struct(col("__obj"), col("__score"), col("__tp"),
        col("__fp"), col("__fn"), col("__tn"))).as("__best"))
      // a global agg over zero candidates emits one all-null row;
      // keyed groupBy emits none — unify on none
      .filter(col("__best").isNotNull)
    val tp = col("__best").getField("__tp")
    val fp = col("__best").getField("__fp")
    val fn = col("__best").getField("__fn")
    val tn = col("__best").getField("__tn")
    best.select(keys.map(col) ++ Seq(
      col("__best").getField("__score").as("threshold"),
      tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"),
      when(tp + fp > 0,
        round(tp.cast("double") / (tp + fp), 6)).as("precision"),
      when(tp + fn > 0,
        round(tp.cast("double") / (tp + fn), 6)).as("recall"),
      when(lit(2) * tp + fp + fn > 0,
        round(lit(2.0) * tp / (lit(2) * tp + fp + fn), 6)).as("f1"),
      when(tp + fn > 0 && fp + tn > 0,
        round(tp.cast("double") / (tp + fn) -
          fp.cast("double") / (fp + tn), 6)).as("youden")): _*)
  }

  /** Deploy per-key operating points as the row filter they exist for:
    * keep rows whose QUANTIZED score clears THEIR key's threshold
    * (`round(score, scale) >= threshold` — the exact predicate the
    * [[thresholdSelectBy]] sweep counted with, so the selected row's
    * tp+fp IS the deployed kept count; comparing raw scores instead
    * would silently drop every row in the rounding half-band below
    * its own grid point). `thresholds` is a thresholdSelectBy output
    * (one row per key; only its key and `threshold` columns are
    * read — pass the same `scale`). Rows whose key has no selected
    * operating point DROP — a source without a measurable threshold
    * does not ship on a pooled guess, the unmeasurable-gates-false
    * discipline — as do null and NaN scores (Spark sorts NaN above
    * every real value, so an unguarded NaN would pass ANY threshold)
    * and null keys. The threshold side is O(keys) and broadcast; the
    * corpus side is filtered map-only, nothing shuffles. */
  def applyThresholdBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      thresholds: DataFrame,
      scale: Int = 6): DataFrame = {
    val t = broadcast(thresholds
      .select(col(keyCol), col("threshold").cast("double").as("__thr")))
    val s = round(col(scoreCol).cast("double"), scale)
    df.join(t, Seq(keyCol), "inner")
      .filter(!isnan(s) && s >= col("__thr"))
      .drop("__thr")
  }

  /** Population Stability Index between a BASELINE score distribution
    * and the CURRENT one — the standard deployed-model drift monitor
    * (credit-scoring practice; > 0.25 conventionally triggers a
    * re-fit): scores bucket into the same equal-width bins as
    * [[calibrationReport]], each side's bin masses smooth with the
    * Jeffreys +0.5 (so an empty bin is defined, not a log of zero),
    * and each bin contributes `(p_cur − p_base) · ln(p_cur/p_base)`.
    * Every term is non-negative; the TOTAL is the callers' gate — sum
    * the `psi` column (ten rounded doubles — exact enough for any
    * threshold, and the per-bin terms say WHERE the drift lives,
    * which the scalar alone cannot).
    *
    * The drift-gate discipline of the cache layer and
    * [[graft.operators.Similarity.quantizerDrift]], applied to the
    * quality scorer itself. Scale shape: one partial-aggregating
    * exchange per side on the bin key; the ≤ `bins`-row join is
    * trivial. */
  def populationStability(
      base: DataFrame,
      current: DataFrame,
      scoreCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 PSI bins")
    def binned(df: DataFrame, cnt: String): DataFrame = {
      val s = col(scoreCol).cast("double")
      df.filter(s.isNotNull)
        .select(greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))
          .as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    }
    val b = binned(base, "n_base")
    val c = binned(current, "n_cur")
    val allBins = b.sparkSession.range(bins)
      .select(col("id").cast("int").as("bin"))
    val joined = allBins
      .join(b, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // Totals via a whole-frame window over the ≤ bins POST-AGGREGATE
    // rows, NOT a self-join: `joined` consumed twice (totals + output)
    // re-runs each side's full corpus aggregation — the keyed form
    // measured that shape super-linear at 10× rows (round-16 probe),
    // and the checkpoint alternative costs two extra eager jobs that
    // dominate this sub-second query (measured 0.33 → 1.7 s on the
    // bench). The window keeps ONE corpus scan per side, one lazy
    // plan, zero extra jobs; its single partition holds ≤ bins rows.
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("__tb", sum(col("n_base")).over(w))
      .withColumn("__tc", sum(col("n_cur")).over(w))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round((col("n_base") + 0.5) / (col("__tb") + 0.5 * bins), 6)
          .as("p_base"),
        round((col("n_cur") + 0.5) / (col("__tc") + 0.5 * bins), 6)
          .as("p_cur"),
        round(
          ((col("n_cur") + 0.5) / (col("__tc") + 0.5 * bins) -
            (col("n_base") + 0.5) / (col("__tb") + 0.5 * bins)) *
            log(((col("n_cur") + 0.5) / (col("__tc") + 0.5 * bins)) /
              ((col("n_base") + 0.5) / (col("__tb") + 0.5 * bins))), 6)
          .as("psi"))
  }

  /** [[populationStability]]'s gate SCALAR: the summed per-bin PSI —
    * the single number a release report carries and a deployment gate
    * thresholds (> 0.25 conventionally triggers a re-fit). Folds the
    * ROUNDED per-bin terms back to integer micros before summing (the
    * [[expectedCalibrationError]] discipline), so the scalar is
    * bit-exact under any merge order. */
  def psiTotal(
      base: DataFrame,
      current: DataFrame,
      scoreCol: String,
      bins: Int = 10): DataFrame =
    populationStability(base, current, scoreCol, bins)
      .agg(round(
        sum(round(col("psi") * 1e6).cast("long")).cast("double") / 1e6, 6)
        .as("psi_total"))

  /** [[populationStability]] PER KEY — one independent drift table per
    * group (per crawl source, per language), the monitoring companion
    * to [[recalibrateBy]]: a scorer rarely drifts uniformly, and the
    * global PSI can read calm while one source's distribution walked
    * off (offsetting shifts cancel in the pooled bins). Bin grid =
    * every key seen on EITHER side × all bins, so a brand-new source
    * (no baseline mass — all its PSI is the smoothing floor's verdict)
    * and a vanished one both surface instead of silently dropping.
    * NULL-key rows drop on both sides ([[recalibrateBy]]'s contract).
    *
    * Scale shape: one partial-aggregating exchange per side on the
    * (key, bin) composite; totals fold per key via a key-partitioned
    * window over the ≤ keys × bins post-aggregate rows. Corpus rows
    * never cross a second exchange — the binned aggregates CHECKPOINT
    * LAZILY (≤ keys × bins rows each) because the grid below consumes
    * each side twice (key universe + grid join): left as lineage, the
    * corpus aggregation re-executed per consumer — measured 8-10 full
    * corpus scans and a super-linear 13× wall at 10× rows in the
    * round-16 probe; checkpointed, exactly one scan per side (probe
    * back to flat at 10×). Lazy (`eager = false`) keeps construction
    * plan-only — no jobs launch from merely building the frame; the
    * first ACTION materializes and pins the rows. The pin inherits
    * `spark.graft.checkpoint`'s documented trade: `local` truncates
    * lineage (an executor lost mid-job cannot recompute the blocks —
    * set `reliable` on a real cluster). */
  def populationStabilityBy(
      base: DataFrame,
      current: DataFrame,
      keyCol: String,
      scoreCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 PSI bins")
    require(!Set("bin", "n_base", "n_cur", "p_base", "p_cur", "psi")
      .contains(keyCol),
      s"key column '$keyCol' collides with a PSI output column")
    def binned(df: DataFrame, cnt: String): DataFrame = {
      val s = col(scoreCol).cast("double")
      df.filter(s.isNotNull && col(keyCol).isNotNull)
        .select(col(keyCol), greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))
          .as("bin"))
        .groupBy(col(keyCol), col("bin")).agg(count(lit(1)).as(cnt))
    }
    val b = Materialize.checkpoint(binned(base, "n_base"), eager = false)
    val c = Materialize.checkpoint(binned(current, "n_cur"), eager = false)
    val keysDf = b.select(col(keyCol))
      .unionByName(c.select(col(keyCol))).distinct()
    val allBins = keysDf.crossJoin(
      b.sparkSession.range(bins).select(col("id").cast("int").as("bin")))
    val joined = allBins
      .join(b, Seq(keyCol, "bin"), "left")
      .join(c, Seq(keyCol, "bin"), "left")
      .select(col(keyCol), col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // Per-key totals via a key-partitioned window over the
    // ≤ keys × bins post-aggregate rows — not a self-join, which would
    // consume `joined` twice (the global form's reasoning, keyed).
    val w = Window.partitionBy(col(keyCol)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("__tb", sum(col("n_base")).over(w))
      .withColumn("__tc", sum(col("n_cur")).over(w))
      .select(col(keyCol), col("bin"), col("n_base"), col("n_cur"),
        round((col("n_base") + 0.5) / (col("__tb") + 0.5 * bins), 6)
          .as("p_base"),
        round((col("n_cur") + 0.5) / (col("__tc") + 0.5 * bins), 6)
          .as("p_cur"),
        round(
          ((col("n_cur") + 0.5) / (col("__tc") + 0.5 * bins) -
            (col("n_base") + 0.5) / (col("__tb") + 0.5 * bins)) *
            log(((col("n_cur") + 0.5) / (col("__tc") + 0.5 * bins)) /
              ((col("n_base") + 0.5) / (col("__tb") + 0.5 * bins))), 6)
          .as("psi"))
  }

  /** [[psiTotal]] PER KEY: `(key, psi_total)` — the per-source gate
    * scalars a keyed deployment verdict thresholds. Same
    * integer-micros fold as the global form, per key. */
  def psiTotalBy(
      base: DataFrame,
      current: DataFrame,
      keyCol: String,
      scoreCol: String,
      bins: Int = 10): DataFrame = {
    require(keyCol != "psi_total",
      s"key column '$keyCol' collides with the PSI total output column")
    populationStabilityBy(base, current, keyCol, scoreCol, bins)
      .groupBy(col(keyCol))
      .agg(round(
        sum(round(col("psi") * 1e6).cast("long")).cast("double") / 1e6, 6)
        .as("psi_total"))
  }

  /** [[calibrationReport]] PER KEY — the reliability table with one
    * independent (key, bin) grid per group, the report arm of the
    * keyed scorer family: same bin clip, micros mean, and single-step
    * gap rounding as the global form (per-key table ≡ global table on
    * that key's slice), with NULL-key rows dropping by the shared
    * keyed contract. One partial-aggregating exchange on the
    * (key, bin) composite; corpus rows cross nothing else. */
  def calibrationReportBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    require(!Set("bin", "n", "mean_score", "label_rate", "gap")
      .contains(keyCol),
      s"key column '$keyCol' collides with a report output column")
    val s = col(scoreCol).cast("double")
    df.filter(s.isNotNull && col(labelCol).isNotNull &&
        col(keyCol).isNotNull)
      .select(col(keyCol),
        greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))
          .as("bin"),
        round(s * 1e6).cast("long").as("__micros"),
        col(labelCol).cast("boolean").cast("int").as("__pos"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__micros")).as("__sm"), sum(col("__pos")).as("__np"))
      // the ONE copy of the integer-exact ratio rounding (see
      // [[reportRatioCols]]) — keyed and global reports cannot fork
      .select(col(keyCol) +: col("bin") +: col("n") +: reportRatioCols: _*)
  }

  /** [[expectedCalibrationError]] PER KEY: `(key, n_bins, n_rows,
    * ece)` — the same integer gap-mass fold, grouped on the key. Takes
    * a [[calibrationReportBy]] output; the ONE engine-side copy of the
    * micros/gapmass rounding discipline the keyed gate consumes. */
  def expectedCalibrationErrorBy(
      report: DataFrame, keyCol: String): DataFrame = {
    require(!Set("n_bins", "n_rows", "ece").contains(keyCol),
      s"key column '$keyCol' collides with an ECE output column")
    report
      .select(col(keyCol), col("n"),
        (round(abs(col("gap")) * 1e6).cast("long") * col("n"))
          .as("__gapmass"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_bins"), sum(col("n")).as("n_rows"),
        sum(col("__gapmass")).as("__gm"))
      // integer half-up at the micros level — the reportRatioCols
      // discipline (a half-micro ECE tie would be engine-dependent
      // under round(double, 6))
      .select(col(keyCol), col("n_bins"), col("n_rows"),
        (expr("(2 * __gm + n_rows) div (2 * n_rows)").cast("double") / 1e6)
          .as("ece"))
  }

  /** [[rocAuc]] PER KEY: `(key, n_pos, n_neg, auc)` — one Mann-Whitney
    * fold per group, the ranking arm of the keyed gate. Identical
    * quantize-collapse-rank shape with every stage carrying the key:
    * the distinct-score collapse groups on (key, quantized score), the
    * running-count window PARTITIONS on the key (still hard-bounded at
    * 10^scale + 1 rows per key partition), and the rank fold groups on
    * the key. NULL-key rows drop ([[recalibrateBy]]'s contract); a
    * single-class key yields a null `auc`, never a division error. */
  def rocAucBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String,
      scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9,
      s"scale must be in [0, 9] (10^scale bounds the ordered window); got $scale")
    require(!Set("n_pos", "n_neg", "auc").contains(keyCol),
      s"key column '$keyCol' collides with an AUC output column")
    val s = round(col(scoreCol).cast("double"), scale)
    val grouped = df
      .filter(s.isNotNull && col(labelCol).isNotNull &&
        col(keyCol).isNotNull)
      .select(col(keyCol), s.as("__score"),
        col(labelCol).cast("boolean").cast("int").as("__pos"))
      .groupBy(col(keyCol), col("__score"))
      .agg(count(lit(1)).as("__n"), sum(col("__pos")).as("__np"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grouped
      .withColumn("__avg_rank",
        sum(col("__n")).over(w).cast("double") -
          (col("__n").cast("double") - 1) / 2)
    ranked.groupBy(col(keyCol))
      .agg(
        sum(col("__np")).as("__npos"),
        sum(col("__n") - col("__np")).as("__nneg"),
        sum(col("__np").cast("double") * col("__avg_rank")).as("__rpos"))
      .select(col(keyCol), col("__npos").as("n_pos"),
        col("__nneg").as("n_neg"),
        when(col("__npos") > 0 && col("__nneg") > 0,
          round((col("__rpos") -
              col("__npos").cast("double") * (col("__npos") + 1) / 2) /
            (col("__npos").cast("double") * col("__nneg")), 6)).as("auc"))
  }

  /** [[scorerGate]] PER KEY — one go/no-go verdict row per group, the
    * deployment companion [[recalibrateBy]] was missing: the per-key
    * fit exists, so the per-key drift/quality verdict must too, or the
    * pipeline re-fits one source's calibration and ships it on the
    * strength of the POOLED gate. One row per distinct non-null key in
    * `df` (the release candidate defines the verdict universe): keyed
    * AUC ([[rocAucBy]]), keyed ECE (the [[calibrationReport]] gap fold
    * per key), keyed PSI vs `prev` ([[psiTotalBy]]), each against the
    * shared bounds; every unmeasurable component gates FALSE, never
    * null, per verdict column. A key present only in `prev` (a retired
    * source) emits no row.
    *
    * Scale shape: four corpus passes — three keyed partial-aggregating
    * ones (score key / (key, bin) / (key, bin)) plus the key-universe
    * distinct, each collapsing to O(keys × bins) before any join; the
    * verdict joins are all broadcast on O(keys) rows. */
  def scorerGateBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String,
      prev: DataFrame,
      minAuc: Double = 0.5,
      maxEce: Double = 0.1,
      maxPsi: Double = 0.25,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    require(!Set("auc", "ece", "psi_total", "auc_ok", "ece_ok", "psi_ok",
      "deploy").contains(keyCol),
      s"key column '$keyCol' collides with a gate output column")
    // Lazily pinned, PROJECTED to the three columns the verdict reads:
    // the scored corpus feeds FOUR independent passes (key census, AUC,
    // ECE, PSI-current), and without the pin each re-runs the caller's
    // scoring lineage — typically the expensive text end of the
    // pipeline (r17; the populationStabilityBy lesson one level up).
    // Lazy keeps construction job-free; concurrent broadcast builds
    // racing the pin at worst recompute exactly what the unpinned form
    // always recomputed.
    val scored = Materialize.checkpoint(
      df.select(col(keyCol), col(scoreCol), col(labelCol)), eager = false)
    val keys = scored.filter(col(keyCol).isNotNull)
      .select(col(keyCol)).distinct()
    val aucBy = broadcast(rocAucBy(scored, keyCol, scoreCol, labelCol)
      .select(col(keyCol), col("auc")))
    // Keyed ECE through the shared report/fold pair — the rounding
    // discipline lives in ONE engine-side place (abs-of-rounded ==
    // rounded-of-abs under half-away-from-zero, so this equals the
    // single-step gap fold exactly).
    val eceBy = broadcast(
      expectedCalibrationErrorBy(
        calibrationReportBy(scored, keyCol, scoreCol, labelCol, bins), keyCol)
        .select(col(keyCol), col("ece")))
    val psiBy = broadcast(
      psiTotalBy(prev, scored, keyCol, scoreCol, bins))
    val aucOk = coalesce(col("auc") >= minAuc, lit(false))
    val eceOk = coalesce(col("ece") <= maxEce, lit(false))
    val psiOk = coalesce(col("psi_total") <= maxPsi, lit(false))
    keys.join(aucBy, Seq(keyCol), "left")
      .join(eceBy, Seq(keyCol), "left")
      .join(psiBy, Seq(keyCol), "left")
      .select(col(keyCol), col("auc"), col("ece"), col("psi_total"),
        aucOk.as("auc_ok"), eceOk.as("ece_ok"), psiOk.as("psi_ok"),
        (aucOk && eceOk && psiOk).as("deploy"))
  }

  /** Isotonic recalibration mapping — what a drifted
    * [[calibrationReport]] gets FIXED with (the report and
    * [[expectedCalibrationError]] say when the scorer's probabilities
    * drifted; this produces the correction). Scores bin exactly as in
    * calibrationReport, and the calibrated probability per bin is the
    * ISOTONIC REGRESSION of the empirical label rate on the bin order,
    * weighted by bin mass — pool-adjacent-violators semantics computed
    * via the equivalent min-max identity over the cumulative sum
    * diagram (Ayer et al. 1955; Robertson, Wright & Dykstra 1988,
    * §1.2):
    *
    *   fitted(i) = max_{j ≤ i} min_{k ≥ i}
    *     (pos(j..k)) / (count(j..k))
    *
    * — the slope of the greatest convex minorant, identical to PAV's
    * pooled block means but expressible as plain joins, so it runs
    * DECLARATIVELY (no driver-side pooling loop) and replays exactly in
    * SQL: every ratio is one IEEE division of two integer sums, and
    * min/max over identical doubles are engine-independent.
    *
    * Output: `(bin, n, label_rate, calibrated)` — monotone
    * nondecreasing `calibrated` in [0, 1], only for bins with mass.
    * Apply with [[applyCalibration]]. Null scores AND null labels drop
    * (the three-report contract).
    *
    * Scale shape: the corpus collapses to ≤ `bins` integer rows in ONE
    * partial-aggregating exchange (calibrationReport's shape); the
    * min-max triple join touches ≤ bins³ rows of post-aggregate data —
    * trivial at any corpus size, and no `.collect()`: the mapping
    * stays a DataFrame for [[applyCalibration]] to broadcast. */
  def recalibrate(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame =
    isotonicFit(df, Nil, scoreCol, labelCol, bins)

  /** [[recalibrate]] PER KEY — one independent isotonic fit per group
    * (per crawl source, per language, per domain bucket): a scorer is
    * rarely uniformly miscalibrated, and a global remap can leave one
    * source over-confident while over-correcting another. Same
    * min-max identity, with every window, join and rollup carrying the
    * key, so the fit distributes ON the key — each group's work is the
    * same ≤ bins³ post-aggregate rows the global fit does, and groups
    * never synchronize. Output adds `keyCol` in front; apply with
    * [[applyCalibrationBy]]. NULL-key rows drop like null scores and
    * labels (the same explicit contract — there is no group to fit
    * them into; route a null-key slice through the global
    * [[recalibrate]] if it needs a mapping). */
  def recalibrateBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame =
    isotonicFit(df, Seq(keyCol), scoreCol, labelCol, bins)

  /** The shared keyed isotonic core: with `keys` empty this IS the
    * global [[recalibrate]] plan (empty partition spec, key-free
    * joins); with keys every stage carries them. */
  private def isotonicFit(
      df: DataFrame,
      keys: Seq[String],
      scoreCol: String,
      labelCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    // output columns and the `__<side>_<key>` aliases below would
    // silently shadow a key with one of these names
    keys.foreach(k => require(
      !Set("bin", "n", "label_rate", "calibrated").contains(k),
      s"key column '$k' collides with a mapping output column"))
    val s = col(scoreCol).cast("double")
    val keyCols = keys.map(col)
    // null keys drop explicitly (see recalibrateBy's contract): left
    // in, they would pay the aggregation and then vanish at the
    // non-null-safe fit joins — cost without a mapping row.
    val keyFilter = keys
      .map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val binned = df
      .filter(s.isNotNull && col(labelCol).isNotNull && keyFilter)
      .select(keyCols ++ Seq(
        greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))
          .as("bin"),
        col(labelCol).cast("boolean").cast("int").as("__pos")): _*)
      .groupBy(keyCols :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"), sum(col("__pos")).as("__np"))
    // Cumulative sums over the ≤ bins rows PER KEY: the ordered window
    // partitions on the key (global fit: empty spec — one partition of
    // ≤ bins post-aggregate rows), never on corpus rows.
    val w = Window.partitionBy(keyCols: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__cnp", sum(col("__np")).over(w))
    // Segment means over every contiguous bin range [j..k] within a
    // key: prefix BEFORE j is (__cn − n, __cnp − __np) at j.
    def k2(name: String) = keys.map(k => col(k).as(s"__${name}_$k"))
    def kEq(a: String, b: String) = keys
      .map(k => col(s"__${a}_$k") === col(s"__${b}_$k"))
      .foldLeft(lit(true))(_ && _)
    val jSide = cum.select(k2("j") ++ Seq(col("bin").as("__jb"),
      (col("__cn") - col("n")).as("__cn0"),
      (col("__cnp") - col("__np")).as("__cnp0")): _*)
    val kSide = cum.select(k2("k") ++ Seq(col("bin").as("__kb"),
      col("__cn").as("__cnk"), col("__cnp").as("__cnpk")): _*)
    val segs = jSide
      .join(kSide, kEq("j", "k") && col("__jb") <= col("__kb"))
      .select(keys.map(k => col(s"__j_$k")) ++ Seq(col("__jb"), col("__kb"),
        ((col("__cnpk") - col("__cnp0")).cast("double") /
          (col("__cnk") - col("__cn0")).cast("double")).as("__r")): _*)
    val iKeyed = binned.select(
      keys.map(k => col(k).as(s"__i_$k")) :+ col("bin"): _*)
    val fitted = iKeyed
      .join(segs, kEq("i", "j") &&
        col("__jb") <= col("bin") && col("__kb") >= col("bin"))
      .groupBy(keys.map(k => col(s"__i_$k")) ++
        Seq(col("bin"), col("__jb")): _*)
      .agg(min(col("__r")).as("__mn"))
      .groupBy(keys.map(k => col(s"__i_$k")) :+ col("bin"): _*)
      .agg(max(col("__mn")).as("__cal"))
      .select(keys.map(k => col(s"__i_$k").as(k)) ++
        Seq(col("bin"), col("__cal")): _*)
    binned.join(fitted, keys :+ "bin")
      .select(keyCols ++ Seq(col("bin"), col("n"),
        round(col("__np").cast("double") / col("n"), 6).as("label_rate"),
        round(col("__cal"), 6).as("calibrated")): _*)
  }

  /** [[applyCalibration]] for a [[recalibrateBy]] mapping: the remap
    * joins on (key, bin) — still broadcast (keys × bins rows), still
    * map-only on the corpus side; a (key, bin) cell the mapping never
    * saw keeps the raw score. */
  def applyCalibrationBy(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      mapping: DataFrame,
      bins: Int = 10,
      outCol: String = "calibrated_score"): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    val s = col(scoreCol).cast("double")
    val m = broadcast(mapping
      .select(col(keyCol).as("__mkey"), col("bin").as("__mbin"),
        col("calibrated").as("__mcal")))
    df.withColumn("__bin",
        when(s.isNotNull, greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))))
      .join(m,
        col(keyCol) === col("__mkey") && col("__bin") === col("__mbin"),
        "left")
      .withColumn(outCol, coalesce(col("__mcal"), s))
      .drop("__bin", "__mkey", "__mbin", "__mcal")
  }

  /** Apply a [[recalibrate]] mapping to a score column: each row's
    * score bins exactly as the mapping was built and takes the bin's
    * isotonic `calibrated` probability; rows landing in a bin the
    * mapping never saw (no training mass there) keep their raw score —
    * the mapping cannot invent evidence it does not have.
    *
    * Scale shape: the mapping is ≤ `bins` rows and joins BROADCAST —
    * the corpus side is map-only (bin arithmetic + one hash probe), no
    * score-side shuffle at any size (spec-pinned). */
  def applyCalibration(
      df: DataFrame,
      scoreCol: String,
      mapping: DataFrame,
      bins: Int = 10,
      outCol: String = "calibrated_score"): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    val s = col(scoreCol).cast("double")
    val m = broadcast(mapping
      .select(col("bin").as("__mbin"), col("calibrated").as("__mcal")))
    df.withColumn("__bin",
        when(s.isNotNull, greatest(
          least(floor(s * bins).cast("int"), lit(bins - 1)), lit(0))))
      .join(m, col("__bin") === col("__mbin"), "left")
      .withColumn(outCol, coalesce(col("__mcal"), s))
      .drop("__bin", "__mbin", "__mcal")
  }

  /** The deployment GATE: the one-row go/no-go verdict a pipeline
    * thresholds before shipping a scorer — ranking quality
    * ([[rocAuc]]), probability honesty ([[expectedCalibrationError]])
    * and distribution drift vs the previous release ([[psiTotal]]),
    * each against its caller-chosen bound, folded into a `deploy`
    * boolean. A null component gates FALSE, never null — a
    * single-class AUC, an empty-report ECE: an unmeasurable scorer is
    * not a shippable scorer, and the rule holds for each verdict
    * column, not just the conjunction. All three sides are one-row
    * aggregates; the joins broadcast. */
  def scorerGate(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      prev: DataFrame,
      minAuc: Double = 0.5,
      maxEce: Double = 0.1,
      maxPsi: Double = 0.25,
      bins: Int = 10): DataFrame = {
    // Same three-pass pin as [[scorerGateBy]] (lazy, projected).
    val scored = Materialize.checkpoint(
      df.select(col(scoreCol), col(labelCol)), eager = false)
    val aucRow = rocAuc(scored, scoreCol, labelCol).select(col("auc"))
    val eceRow = expectedCalibrationError(
      calibrationReport(scored, scoreCol, labelCol, bins)).select(col("ece"))
    val psiRow = psiTotal(prev, scored, scoreCol, bins)
    // EVERY gate coalesces null to false, not just AUC: an empty
    // reliability table nulls the ECE the same way a single-class
    // input nulls the AUC, and the "unmeasurable gates FALSE" rule
    // must hold per column — a null ece_ok beside a false deploy is
    // an inconsistent verdict row.
    val aucOk = coalesce(col("auc") >= minAuc, lit(false))
    val eceOk = coalesce(col("ece") <= maxEce, lit(false))
    val psiOk = coalesce(col("psi_total") <= maxPsi, lit(false))
    aucRow.crossJoin(broadcast(eceRow)).crossJoin(broadcast(psiRow))
      .select(col("auc"), col("ece"), col("psi_total"),
        aucOk.as("auc_ok"), eceOk.as("ece_ok"), psiOk.as("psi_ok"),
        (aucOk && eceOk && psiOk).as("deploy"))
  }

  /** Expected calibration error off [[calibrationReport]]'s table:
    * `sum(n_b * |gap_b|) / N` over the filled bins (Guo et al. 2017,
    * eq. 3). Folds the ROUNDED per-bin gaps back to micros and sums
    * as integers, so the scalar is bit-exact under any merge order —
    * the single-number freshness gate for a deployed quality model
    * (recalibrate when it drifts, the quantizer-drift contract). */
  def expectedCalibrationError(report: DataFrame): DataFrame =
    report
      .select(col("n"),
        (round(abs(col("gap")) * 1e6).cast("long") * col("n"))
          .as("__gapmass"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n")).as("n_rows"),
        sum(col("__gapmass")).as("__gm"))
      // integer half-up at the micros level (reportRatioCols discipline)
      .select(col("n_bins"), col("n_rows"),
        (expr("(2 * __gm + n_rows) div (2 * n_rows)").cast("double") / 1e6)
          .as("ece"))
}
