package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall/precision accounting for the approximate operators (ANN, IVF,
  * SRP, int8 shortlist) against their exact counterparts — the
  * driver-checkable form of the guarantees the ScalaTest specs pin.
  *
  * The approximate results themselves are engine-specific (seeded
  * hashes, k-means cells), so they can never carry a value-level DuckDB
  * oracle. What CAN be oracle-gated is the quality contract: join the
  * approximate result against the exact one and emit deterministic
  * summary counts plus a thresholded boolean. The exact-side counts are
  * reproducible in ANSI SQL, and the boolean is stable for a fixed seed
  * — so `CORRECTNESS` gets a real rows+schema+hash row instead of
  * `no_oracle`.
  *
  * All counts are integers and the threshold compare is integer
  * arithmetic (`hit × 10000 ≥ exact × bps`) — no FP division to drift
  * across engines.
  */
object Quality {

  /** One row `(n_q, n_exact, n_hit)`: distinct queries, exact top-k
    * rows, and how many of them the approximate result recovered.
    * Both inputs carry `(qidCol, idCol)`; extra columns are ignored. */
  def topKRecallCounts(
      exact: DataFrame,
      approx: DataFrame,
      qidCol: String,
      idCol: String): DataFrame = {
    // ONE pass over the exact side: a deduped hit-marker left join + a
    // single aggregate. The semi-join + crossed-aggregates formulation
    // this replaced referenced `exact` twice, so the expensive exact
    // pipeline (a full brute-force top-k) executed twice per run.
    // The dedup keeps the left join row-preserving (top-k/pair outputs
    // are already distinct per key; this makes it a contract).
    val ap = approx.select(col(qidCol), col(idCol))
      .dropDuplicates(qidCol, idCol)
      .withColumn("__hit", lit(1))
    exact.select(col(qidCol), col(idCol))
      .join(ap, Seq(qidCol, idCol), "left")
      .agg(count_distinct(col(qidCol)).as("n_q"), count(lit(1)).as("n_exact"),
        count(col("__hit")).as("n_hit"))
  }

  /** One row `(n_exact, n_hit)` for undirected pair sets `(id_a, id_b)`
    * (both inputs must use the same a < b orientation, as every graft
    * pair operator does). */
  def pairRecallCounts(exact: DataFrame, approx: DataFrame): DataFrame = {
    // Same one-pass shape as [[topKRecallCounts]] — the exact pair
    // pipeline is the expensive side and is referenced exactly once.
    val ap = approx.select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("__hit", lit(1))
    exact.select(col("id_a"), col("id_b"))
      .join(ap, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
  }

  /** `n_hit / n_exact ≥ bps/10000`, in overflow-safe integer
    * arithmetic; an empty exact set counts as satisfied. */
  def recallOk(bps: Int): org.apache.spark.sql.Column =
    col("n_exact") === 0 || col("n_hit") * lit(10000L) >= col("n_exact") * lit(bps.toLong)
}
