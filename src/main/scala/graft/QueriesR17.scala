package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-17 queries: the two verdict-ranked compositions that turn
  * standing REPORTS into ACTIONS.
  *
  *  - q_host_budget: the crawl-side budget loop closure carried since
  *    round 15 — [[operators.Crawl.hostQuality]]'s Gopher-pass-mass
  *    prior apportioned into next wave's fetch slots by
  *    [[operators.Crawl.hostFetchBudget]] (Hamilton seats over the
  *    per-host quality census; the q_drift_gated_budget pattern on the
  *    crawl front).
  *  - q_threshold_by: per-source operating-point SELECTION
  *    ([[operators.QualityModel.thresholdSelectBy]]) — the keyed
  *    report family diagnosed, this prescribes: each source's max-F1
  *    threshold swept over its bounded distinct-score grid.
  *  - q_threshold_apply: the selected thresholds DEPLOYED
  *    ([[operators.QualityModel.applyThresholdBy]]) — the per-source
  *    filter the selection exists for, rolled up per source.
  */
object QueriesR17 {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** The calibration-family scoring with the source key — the ONE
    * derivation shared with the round-16 keyed observability queries
    * ([[QueriesR16.scoredSrc]]), so round-16 reports and round-17
    * prescriptions cannot silently score different corpora. */
  private def scoredSrc(s: SparkSession, d: String): DataFrame =
    QueriesR16.scoredSrc(s, d)

  /** q_host_budget's fetch-slot budget for the next crawl wave. */
  private val HostSlots = 100000L

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- the crawl budget loop closed: per-host Gopher-gate census
    //     (hosts synthesized as site<doc_id%7>, the q_host_quality
    //     universe) -> pass-mass weights -> Hamilton fetch slots.
    //     Weights are integer char mass over PASSING docs only, so the
    //     pass-rate prior and the host's demand compose without a
    //     single double; allocations sum to EXACTLY the slot budget. ---
    "q_host_budget" -> { (s, d) =>
      // The packaged Gopher gate trio, conjoined — with a
      // MEASURABILITY guard: a doc too short to form a 5-gram has
      // all-zero repetition fracs and would PASS the gates while
      // carrying no signal, so its verdict is NULL instead — which
      // hostQuality counts as FAIL everywhere (an unmeasurable page
      // earns no budget, exercising the null-verdict contract).
      val gates = operators.TextAnalysis.gopherStages(col("text"))
        .map(_._2).reduce(_ && _)
      val measurable = size(split(col("text"), " ")) >= 5
      val quality = operators.Crawl.hostQuality(
        docs(s, d).select(
          concat(lit("site"), (col("doc_id") % 7).cast("string")).as("host"),
          when(measurable, gates).as("pass"),
          col("n_chars")),
        "host", col("pass"), col("n_chars"))
      operators.Crawl.hostFetchBudget(quality, budget = HostSlots)
    },
    // --- per-source operating point: max-F1 threshold over each
    //     source's own quantized distinct-score grid, ties to the
    //     most selective (highest) threshold — 20 independent
    //     prescriptions where q_confusion_by evaluated one pooled
    //     guess. ---
    "q_threshold_by" -> ((s, d) =>
      operators.QualityModel.thresholdSelectBy(
        scoredSrc(s, d), "source", "score", "label")),
    // --- the prescriptions deployed: the corpus filtered by each
    //     source's OWN selected threshold, rolled up per source —
    //     kept volume and kept positives, the numbers that prove the
    //     selection drives the filter. ---
    "q_threshold_apply" -> { (s, d) =>
      val scored = scoredSrc(s, d)
      val thr = operators.QualityModel.thresholdSelectBy(
        scored, "source", "score", "label")
      operators.QualityModel.applyThresholdBy(scored, "source", "score", thr)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("label").cast("int")).as("n_pos_kept"))
    })

  /** The per-source max-F1 sweep replayed in SQL over
    * [[QueriesR16.ScoredCtes]]'s scored corpus: the SHARED quantized
    * distinct-score grid ([[QueriesR16.gridCte]], with the sweep's
    * NaN drop), descending cumulative confusion, rounded-F1 argmax
    * with the highest-threshold tiebreak. Ends in `sel(source, sc,
    * tp, fp, fn, tn, obj, rn)` — the selected row is `rn = 1`. */
  private val SweepCtes: String =
    QueriesR16.gridCte(" AND NOT isnan(score)") + """,
      |cd AS (SELECT source, sc,
      |    CAST(sum(np) OVER (PARTITION BY source ORDER BY sc DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
      |    CAST(sum(n) OVER (PARTITION BY source ORDER BY sc DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp,
      |    CAST(sum(np) OVER (PARTITION BY source) AS BIGINT) AS npos,
      |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS cn
      |  FROM ga),
      |mm AS (SELECT source, sc, tp, pp - tp AS fp, npos - tp AS fn,
      |    cn - pp - (npos - tp) AS tn,
      |    round(2.0 * tp / (2 * tp + (pp - tp) + (npos - tp)), 6) AS obj
      |  FROM cd),
      |sel AS (SELECT *, row_number() OVER (PARTITION BY source
      |    ORDER BY obj DESC, sc DESC) AS rn FROM mm)""".stripMargin

  val oracles: Map[String, String] = Map(
    // The whole composition replayed: the shared per-doc Gopher
    // fraction CTE, the per-doc verdict stated ONCE (null where the
    // doc can't form a 5-gram — unmeasurable fails), the per-host
    // pass-mass census with zero-mass hosts dropped (the engine's
    // positive-weight contract), then the SHARED Hamilton replay over
    // the host table.
    "q_host_budget" ->
      (s"WITH g AS (${QueriesR9.gopherRepOracle}),\n" +
        """pv AS (SELECT d.n_chars,
          |    'site' || CAST(d.doc_id % 7 AS VARCHAR) AS host,
          |    CASE WHEN len(string_split(d.text, ' ')) >= 5
          |      THEN (top2_frac < 0.2 AND top3_frac < 0.18
          |        AND dup5_frac < 0.15) END AS pass
          |  FROM documents d JOIN g ON d.doc_id = g.doc_id),
          |k AS (SELECT host AS key, weight FROM (
          |    SELECT host, CAST(coalesce(sum(CASE WHEN pass
          |        THEN n_chars END), 0) AS BIGINT) AS weight
          |    FROM pv GROUP BY host) kk
          |  WHERE weight > 0),
          |""".stripMargin +
        QueriesR14.hamiltonSql("k", HostSlots, keyOut = "host")),
    // The selected row's confusion arithmetic replayed at the chosen
    // grid point — rates guarded exactly as the engine guards them
    // (F1's denominator is always positive at a candidate; Youden
    // needs both classes).
    "q_threshold_by" ->
      (QueriesR16.ScoredCtes + ",\n" + SweepCtes + """
        |SELECT source, sc AS threshold, tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0
        |    THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6)
        |    END AS precision,
        |  CASE WHEN tp + fn > 0
        |    THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6)
        |    END AS recall,
        |  CASE WHEN 2 * tp + fp + fn > 0
        |    THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1,
        |  CASE WHEN tp + fn > 0 AND fp + tn > 0
        |    THEN round(CAST(tp AS DOUBLE) / (tp + fn)
        |      - CAST(fp AS DOUBLE) / (fp + tn), 6) END AS youden
        |FROM sel WHERE rn = 1""".stripMargin),
    // The deployment replay: the same sweep picks each source's
    // threshold, then the corpus filters on ITS source's point with
    // the SWEEP'S OWN predicate — round(score, 6) >= threshold, the
    // quantize-then-compare contract, with null/NaN scores dropping
    // (null labels count in n_kept but not n_pos_kept, the engine's
    // sum-skips-null).
    "q_threshold_apply" ->
      (QueriesR16.ScoredCtes + ",\n" + SweepCtes + """
        |SELECT s.source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(CAST(label AS INT)) AS BIGINT) AS n_pos_kept
        |FROM s JOIN (SELECT source, sc FROM sel WHERE rn = 1) t
        |  ON s.source = t.source
        |WHERE s.score IS NOT NULL AND NOT isnan(s.score)
        |  AND round(s.score, 6) >= t.sc
        |GROUP BY 1""".stripMargin))
}
