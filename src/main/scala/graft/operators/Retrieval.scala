package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: Okapi BM25 scoring for a FIXED
  * query-term set — the "pull every document about X" primitive behind
  * targeted curation (seed-document selection for DSIR, eval-adjacent
  * audits, topical subsetting before an expensive model pass).
  *
  * Scale shape: because the query terms are driver-side literals, the
  * per-document term frequencies are a MAP-ONLY projection over one
  * corpus scan (`size(filter(tokens, = term))` per term, codegen'd) —
  * the corpus is never exploded into (doc, token) rows and never
  * shuffled. Corpus statistics (N, avgdl, per-term document
  * frequencies) reduce to ONE global aggregation row (map-side
  * combined, constant state) broadcast back over the scored scan, and
  * the final top-k is a `TakeOrderedAndProject` — partial top-k per
  * partition, never a global sort. Total cost at 100 TB: two corpus
  * scans (stats + score) with nothing but a single row on the wire.
  * An inverted-index formulation only wins once the index is already
  * materialized; for ad-hoc scoring the scan IS the optimum.
  */
object Retrieval {

  /** BM25 top-`topK` documents for `terms`.
    *
    * Scoring is the textbook Okapi form with Lucene's non-negative idf:
    * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`,
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    * The sum is evaluated in the fixed order of `terms` in BOTH this
    * plan and the SQL oracle, so the double arithmetic is
    * bit-reproducible; scores are rounded to 6 and ordered
    * (score desc, id) for a deterministic cut. Documents matching no
    * term (score 0) are excluded. */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
    require(terms.forall(_.matches("\\w+")),
      "query terms must be single word tokens")
    val toks = TextAnalysis.tokens(col(textCol))
    def tfCol(t: String): String = s"__tf_$t"
    val perDoc = df.select(
      col(idCol) +:
        size(toks).cast("long").as("__dl") +:
        terms.map(t =>
          size(filter(toks, x => x === lit(t))).cast("long").as(tfCol(t))): _*)
    // One row: corpus size, total length, per-term doc frequencies.
    val statCols =
      count(lit(1)).as("__n") +: sum("__dl").as("__sumdl") +:
        terms.map(t =>
          sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"__df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("__sumdl").cast("double") / col("__n")
    def idf(t: String): Column = {
      val dfT = col(s"__df_$t").cast("double")
      log(lit(1.0) + (col("__n") - dfT + lit(0.5)) / (dfT + lit(0.5)))
    }
    def termScore(t: String): Column = {
      val tf = col(tfCol(t)).cast("double")
      idf(t) * (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / avgdl))
    }
    val score = terms.map(termScore).reduce(_ + _)
    perDoc
      .crossJoin(broadcast(stats))
      .filter(terms.map(t => col(tfCol(t)) > 0).reduce(_ || _))
      .select(col(idCol), col("__dl").as("dl"),
        round(score, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
