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
  */
object QueriesR17 {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

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
      val top2 = operators.TextAnalysis.gopherRepetition(col("text"), 2).head
      val top3 = operators.TextAnalysis.gopherRepetition(col("text"), 3).head
      val dup5 = operators.TextAnalysis.gopherRepetition(col("text"), 5)(1)
      val quality = operators.Crawl.hostQuality(
        docs(s, d).select(
          concat(lit("site"), (col("doc_id") % 7).cast("string")).as("host"),
          (top2 < 0.20 && top3 < 0.18 && dup5 < 0.15).as("pass"),
          col("n_chars")),
        "host", col("pass"), col("n_chars"))
      operators.Crawl.hostFetchBudget(quality, budget = HostSlots)
    })

  val oracles: Map[String, String] = Map(
    // The whole composition replayed: the shared per-doc Gopher
    // fraction CTE, the per-host pass-mass census (null verdicts count
    // as fail, zero-mass hosts drop — the engine's positive-weight
    // contract), then the q_apportion Hamilton replay over the host
    // table.
    "q_host_budget" ->
      (s"WITH g AS (${QueriesR9.gopherRepOracle}),\n" +
        s"""k AS (SELECT 'site' || CAST(d.doc_id % 7 AS VARCHAR) AS host,
          |    CAST(coalesce(sum(CASE WHEN top2_frac < 0.2
          |        AND top3_frac < 0.18 AND dup5_frac < 0.15
          |        THEN d.n_chars END), 0) AS BIGINT) AS weight
          |  FROM documents d JOIN g ON d.doc_id = g.doc_id
          |  GROUP BY 1
          |  HAVING coalesce(sum(CASE WHEN top2_frac < 0.2
          |        AND top3_frac < 0.18 AND dup5_frac < 0.15
          |        THEN d.n_chars END), 0) > 0),
          |tt2 AS (SELECT CAST(sum(weight) AS BIGINT) AS w FROM k),
          |q AS (SELECT host, weight,
          |    ($HostSlots * weight) // w AS base,
          |    ($HostSlots * weight) % w AS rem
          |  FROM k, tt2),
          |b2 AS (SELECT CAST(sum(base) AS BIGINT) AS bsum FROM q),
          |p2 AS (SELECT host, weight, base,
          |    row_number() OVER (ORDER BY rem DESC, host) AS pos
          |  FROM q)
          |SELECT p2.host, p2.weight,
          |  CAST(p2.base + CASE WHEN p2.pos <= $HostSlots - b2.bsum
          |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
          |FROM p2, b2""".stripMargin))
}
