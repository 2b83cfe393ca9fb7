package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ModelCache, QualityModel, TextAnalysis}

/** Learned quality classifier: deterministic holdout split, output
  * contract, real generalization (beats the majority baseline on
  * held-out docs), and model-cache reuse across executions. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = spark.read
    .parquet(TestSpark.sf001 + "/documents.parquet")

  private def weakLabel = {
    val toks = TextAnalysis.tokens(col("text"))
    size(filter(toks, tk => tk.isInCollection(TextAnalysis.StopwordsEn)))
      .cast("double") / size(toks) >= 0.06
  }

  private def scored = QualityModel.fitScore(
    docs, "doc_id", "text", weakLabel)

  test("every doc is scored once; probabilities are probabilities") {
    val out = scored.cache()
    try {
      assert(out.count() == docs.count())
      assert(out.select("doc_id").distinct().count() == docs.count())
      assert(out.filter(col("prob") < 0 || col("prob") > 1).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("holdout split is the md5 bucket, not RNG: stable across runs") {
    val a = scored.filter(col("holdout")).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = scored.filter(col("holdout")).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count(),
      s"holdout must be a proper subset (got ${a.size})")
  }

  test("holdout agreement beats the majority baseline") {
    val out = scored.cache()
    try {
      val hold = out.filter(col("holdout"))
      val n = hold.count().toDouble
      val agree = hold
        .filter(col("predicted") === col("weak_label")).count() / n
      val majority = math.max(
        hold.filter(col("weak_label")).count() / n,
        hold.filter(!col("weak_label")).count() / n)
      assert(agree >= 0.75, f"holdout agreement $agree%.3f < 0.75")
      assert(agree > majority,
        f"agreement $agree%.3f must beat majority baseline $majority%.3f")
    } finally out.unpersist(blocking = false)
  }

  test("codegen'd scoreColumn matches spark.ml transform probabilities") {
    // Same murmur3(42) hashing + nonNegativeMod bucketing + linear
    // margin, re-expressed in pure functions._ — only double-addition
    // order differs from BLAS.dot, so probabilities agree to ~1e-12.
    val model = QualityModel.fit(docs, "doc_id", "text", weakLabel)
    val viaTransform = scored.select(col("doc_id"), col("prob"))
    val viaExpr = docs.select(col("doc_id"),
      round(QualityModel.scoreColumn(col("text"),
        model.coefficients.toArray, model.intercept), 6).as("prob2"))
    val joined = viaTransform.join(viaExpr, "doc_id")
      .filter(abs(col("prob") - col("prob2")) > 1e-6)
    assert(joined.count() == 0,
      s"diverging rows: ${joined.limit(3).collect().mkString(", ")}")
    // and the plan has no scala UDF (stays codegen'd)
    val plan = docs.select(QualityModel.scoreColumn(col("text"),
      model.coefficients.toArray, model.intercept))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"scoreColumn must not plan a UDF:\n$plan")
  }

  test("the fit is cached per (input, params) like LSH/IVF") {
    ModelCache.clear()
    scored.count()
    scored.count()
    assert(ModelCache.size == 1,
      s"same corpus+params must fit once, cached ${ModelCache.size}")
    // different regularization => different model
    QualityModel.fitScore(docs, "doc_id", "text", weakLabel,
      regParam = 0.5).count()
    assert(ModelCache.size == 2)
  }

  test("calibrationReport: bins, top-bin fold, null scores dropped") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Some(0.05), true), (Some(-0.05), false), // bin 0 (negative clips)
      (Some(1.0), true), (Some(0.95), false),   // bin 9 (1.0 folds in)
      (None, true),                             // null score: dropped
      (Some(0.55), true))                       // bin 5
      .toDF("score", "label")
    val rep = QualityModel.calibrationReport(rows, "score", "label")
    // one partial-aggregating exchange on the bin key
    assert(PlanCheck.shuffles(rep).size == 1,
      "calibration must be a single-exchange aggregation")
    val out = rep.collect().map(r => r.getInt(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out == Map(
      0 -> ((2L, 0.0, 0.5, 0.5)), // mean (0.05 + -0.05)/2
      5 -> ((1L, 0.55, 1.0, 0.45)),
      9 -> ((2L, 0.975, 0.5, -0.475))),
      s"calibration bins: $out")
  }

  test("rocAuc: Mann-Whitney with tie-block average ranks") {
    val s = spark
    import s.implicits._
    // ascending ranks: 0.3 -> 1; 0.5,0.5 -> avg 2.5; 0.8,0.8 -> avg
    // 4.5; 0.9 -> 6. R_pos = 1 + 4.5 + 6 = 11.5, n_pos = n_neg = 3:
    // AUC = (11.5 - 6) / 9 = 0.611111 -- pair-checked: 0.9 beats all
    // three negatives, 0.8 ties one (1/2) and beats two, 0.3 none.
    val rows = Seq(
      (0.9, true), (0.8, false), (0.8, true),
      (0.5, false), (0.5, false), (0.3, true)).toDF("score", "label")
    val frame = QualityModel.rocAuc(rows, "score", "label")
    // scale pin: the ordered (single-partition) window consumes the
    // DISTINCT-SCORE aggregate, never raw rows — its input carries the
    // grouped counts, so the global sort is score-cardinality-bounded
    val windows = PlanCheck.nodes(frame).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty &&
      windows.forall(_.child.output.exists(_.name == "__n")),
      "rocAuc's window must run over the distinct-score aggregate")
    val out = frame.collect()(0)
    assert(out.getLong(0) == 3L && out.getLong(1) == 3L)
    assert(out.getDouble(2) == 0.611111, s"auc: ${out.getDouble(2)}")
    // degenerate sanity: a perfectly separating score
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "label")
    assert(QualityModel.rocAuc(sep, "score", "label")
      .collect()(0).getDouble(2) == 1.0)
    // null labels drop entirely (they must not occupy rank positions:
    // left in, AUC can silently leave [0,1])
    val withNulls = Seq(
      (0.9, Some(true)), (0.5, Some(false)),
      (0.1, None), (0.2, None), (0.3, None))
      .toDF("score", "label")
    val nn = QualityModel.rocAuc(withNulls, "score", "label").collect()(0)
    assert(nn.getLong(0) == 1L && nn.getLong(1) == 1L &&
      nn.getDouble(2) == 1.0, nn.toString)
    // single-class input: AUC undefined -> null, not an ANSI
    // divide-by-zero
    val oneClass = Seq((0.9, true), (0.1, true)).toDF("score", "label")
    assert(QualityModel.rocAuc(oneClass, "score", "label")
      .collect()(0).isNullAt(2))
  }

  test("thresholdReport: confusion counts, null rates where undefined") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0.9, true), (0.8, false), (0.4, true), (0.1, false), (0.6, true))
      .toDF("score", "label")
    val r = QualityModel.thresholdReport(rows, "score", "label", 0.5)
      .collect()(0)
    // tp=2 (0.9T, 0.6T), fp=1 (0.8F), fn=1 (0.4T), tn=1 (0.1F)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 1L)), r.toString)
    assert(r.getDouble(4) == 0.666667 && r.getDouble(5) == 0.666667 &&
      r.getDouble(6) == 0.666667, r.toString)
    // no predicted positives: precision NULL, recall 0, f1 0 (fn > 0)
    val none = QualityModel.thresholdReport(
        Seq((0.1, true), (0.2, false)).toDF("score", "label"),
        "score", "label", 0.5)
      .collect()(0)
    assert(none.isNullAt(4) && none.getDouble(5) == 0.0 &&
      none.getDouble(6) == 0.0, none.toString)
  }

  test("populationStability: identical releases read zero; drift registers") {
    val s = spark
    import s.implicits._
    val rel = Seq(0.05, 0.15, 0.15, 0.55, 0.95).toDF("score")
    val zero = QualityModel.populationStability(rel, rel, "score")
      .collect()
    assert(zero.length == 10, "one row per bin, empty bins included")
    assert(zero.forall(_.getDouble(5) == 0.0),
      s"identical distributions must read PSI 0: ${zero.mkString(";")}")
    // mass moved from bin 0/1 to bin 9: positive terms, defined
    // everywhere (the +0.5 smoothing covers the emptied bins)
    val moved = Seq(0.95, 0.96, 0.97, 0.55, 0.98).toDF("score")
    val drift = QualityModel.populationStability(rel, moved, "score")
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(drift.values.forall(v => v >= 0.0), s"PSI terms non-negative")
    assert(drift(9) > 0.1 && drift(0) > 0.0, s"drift: $drift")
  }

  test("expectedCalibrationError: n-weighted gap-mass over the bins") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0.05, true), (0.05, false), (1.0, true), (0.95, false),
      (0.55, true)).toDF("score", "label")
    val ece = QualityModel.expectedCalibrationError(
        QualityModel.calibrationReport(rows, "score", "label"))
      .collect()(0)
    assert(ece.getLong(0) == 3L && ece.getLong(1) == 5L)
    // (2*0.45 + 1*0.45 + 2*0.475) / 5 = 2.3 / 5
    assert(ece.getDouble(2) == 0.46, s"ece: ${ece.getDouble(2)}")
  }
}
