package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data cleaning pipeline, as one declarative
  * composition:
  *
  *   quality gate → exact dedup (content hash) → near-dup cluster
  *   collapse (banded MinHash candidates → exact Jaccard verify →
  *   connected components → min-id representative)
  *
  * Every stage is one of the operators in this package; the whole chain
  * is lazy, so Catalyst fuses the quality filter into the scan and the
  * stages share shuffles where possible. Declared as `q_pipeline` with a
  * full SQL oracle — the complete pipeline, not just its stages, is
  * correctness-checked. */
object Pipeline {

  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 20,
      maxTokens: Int = 500,
      minTtr: Double = 0.15,
      minAvgTokenLen: Double = 2.0,
      maxAvgTokenLen: Double = 8.0,
      nearDupThreshold: Double = 0.8): DataFrame = {
    val gated = df.filter(TextAnalysis.qualityFilter(col(textCol),
      minTokens, maxTokens, minTtr, minAvgTokenLen, maxAvgTokenLen))
    Dedup.dedupCorpus(gated, idCol, textCol, threshold = nearDupThreshold)
  }

  /** Per-stage attrition of [[cleanCorpus]]'s quality GATE — which of
    * the three gate components drops what, from one corpus scan
    * ([[TextAnalysis.qualityStages]] through
    * [[Curation.filterFunnel]]). The dedup stages that follow the gate
    * are set-based (joins), not row predicates — their attrition is the
    * row-count delta of [[cleanCorpus]]'s output, already measured by
    * running the pipeline itself. */
  def gateAttrition(
      df: DataFrame,
      textCol: String,
      minTokens: Int = 20,
      maxTokens: Int = 500,
      minTtr: Double = 0.15,
      minAvgTokenLen: Double = 2.0,
      maxAvgTokenLen: Double = 8.0): DataFrame =
    Curation.filterFunnel(df, TextAnalysis.qualityStages(col(textCol),
      minTokens, maxTokens, minTtr, minAvgTokenLen, maxAvgTokenLen))
}
