package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 corpus queries: the learned quality-classifier stage
  * ([[operators.QualityModel]]) — a model-based filter fit on a weak
  * label, gated the recall-companion way: the Spark side computes the
  * generalization verdict (holdout agreement ≥ threshold) as a boolean,
  * the oracle pins the exact deterministic parts (corpus count, md5
  * holdout count) plus the expected-true verdict.
  */
object QueriesR8 {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    s.read.parquet(s"$d/$name.parquet")

  /** Weak label the classifier must learn: stopword-ratio ≥ 0.06 (the
    * corpus median — balanced ~50/50 at every SF, and genuinely
    * learnable from hashed token counts: the stopword hash buckets ARE
    * the signal, so holdout agreement well above the 0.5 majority
    * baseline demonstrates real generalization, not label echo). */
  private def weakLabel: org.apache.spark.sql.Column = {
    val toks = operators.TextAnalysis.tokens(col("text"))
    val stops = size(filter(toks,
      tk => tk.isInCollection(operators.TextAnalysis.StopwordsEn)))
    stops.cast("double") / size(toks) >= 0.06
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- learned quality classifier, gated on holdout generalization:
    //     LR over hashed bag-of-tokens must agree with the weak label
    //     on ≥ 75% of held-out docs (majority baseline ~50%). Scores
    //     themselves are engine-specific (LBFGS float accumulation);
    //     the gate is the portable contract. ---
    "q_quality_model" -> { (s, d) =>
      val scored = operators.QualityModel.fitScore(
        t(s, d, "documents"), "doc_id", "text", weakLabel)
      val holdN = count(when(col("holdout"), 1))
      scored.agg(
        count(lit(1)).as("n_docs"),
        holdN.as("n_holdout"),
        ((count(when(col("holdout") &&
          col("predicted") === col("weak_label"), 1)).cast("double") /
          holdN) >= 0.75).as("agree_ok"))
    },
    // --- incremental (cross-snapshot) dedup: today's batch anti-joined
    //     on content digest against the already-ingested reference —
    //     the recrawl staple that never re-shuffles the historical
    //     corpus. Reference = every 3rd doc PLUS docs 0-9 (re-ingested
    //     content), so the drop is observable: batch docs 1,2,4,5,7,8
    //     share exact text with the reference and must vanish. ---
    "q_dedup_incremental" -> { (s, d) =>
      val docs = t(s, d, "documents")
      operators.Dedup.dedupAgainstReference(
        batch = docs.filter(col("doc_id") % 3 =!= 0),
        reference = docs.filter(col("doc_id") % 3 === 0 || col("doc_id") < 10),
        textCol = "text",
        refTextCol = "text")
        .select("doc_id", "source", "n_chars")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_quality_model" ->
      """SELECT count(*) AS n_docs,
        |  count(*) FILTER (WHERE
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10000 AS INTEGER) % 4 = 0) AS n_holdout,
        |  TRUE AS agree_ok
        |FROM documents""".stripMargin,
    "q_dedup_incremental" ->
      """SELECT b.doc_id, b.source, b.n_chars
        |FROM documents b
        |WHERE b.doc_id % 3 <> 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents r
        |    WHERE (r.doc_id % 3 = 0 OR r.doc_id < 10)
        |      AND r.text = b.text)""".stripMargin
  )
}
