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

  /** BM25 over body text PLUS incoming anchor text as a second,
    * weighted field — the web-search-101 composition
    * ([[graft.operators.LinkGraph.anchorTerms]] produces the signal;
    * this consumes it): how the rest of the web DESCRIBES a page
    * often names it better than its own words, so a page whose
    * in-link anchors say "spark" ranks for `spark` even when its body
    * barely does. The simplified-BM25F shape: each field gets its own
    * Okapi score with its own length normalization and document
    * frequencies, and the document's score is
    * `score_body + anchorWeight · score_anchor`.
    *
    * Anchor tokenization matches [[LinkGraph.anchorTerms]] exactly
    * (lowercase, `\s+` split, empties dropped) so the two views of
    * the anchor signal never diverge. The anchor FIELD of a document
    * is the concatenation of all its incoming anchors: per-edge term
    * counts sum per destination, and the field length is the total
    * incoming term count. Documents with no in-links score on body
    * alone (anchor tf 0); a corpus with no anchors at all scores
    * identically to [[bm25]] (the anchor term is gated to 0, not
    * NaN).
    *
    * Scale shape: the body side is [[bm25]]'s map-only scan. The
    * anchor side folds each edge row-locally to fixed-width counts
    * (the query terms are literals — the edge list is never exploded
    * into (edge, term) rows), then ONE partial-aggregating exchange
    * on the destination key sums them; the join back to the body scan
    * is id-keyed on the (far smaller) pages-with-inlinks side. Stats
    * stay one broadcast row, top-k stays TakeOrderedAndProject. */
  def bm25WithAnchors(
      df: DataFrame,
      idCol: String,
      textCol: String,
      edges: DataFrame,
      dstCol: String,
      anchorCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      anchorWeight: Double = 1.0,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
    require(terms.forall(_.matches("\\w+")),
      "query terms must be single word tokens")
    val toks = TextAnalysis.tokens(col(textCol))
    def tfCol(t: String): String = s"__tf_$t"
    def atfCol(t: String): String = s"__atf_$t"
    val perDoc = df.select(
      col(idCol) +:
        size(toks).cast("long").as("__dl") +:
        terms.map(t =>
          size(filter(toks, x => x === lit(t))).cast("long").as(tfCol(t))): _*)
    // Anchor tokenization — the anchorTerms contract.
    val aToks = filter(split(lower(col(anchorCol)), "\\s+"), x => x =!= "")
    val perDst = edges
      .select(
        col(dstCol).as(idCol) +:
          size(aToks).cast("long").as("__alen") +:
          terms.map(t => size(filter(aToks, x => x === lit(t)))
            .cast("long").as(atfCol(t))): _*)
      .groupBy(col(idCol))
      .agg(sum(col("__alen")).as("__adl"),
        terms.map(t => sum(col(atfCol(t))).as(atfCol(t))): _*)
    val fielded = perDoc.join(perDst, Seq(idCol), "left")
      .select(
        col(idCol) +: col("__dl") +:
          coalesce(col("__adl"), lit(0L)).as("__adl") +:
          (terms.map(t => col(tfCol(t))) ++
            terms.map(t =>
              coalesce(col(atfCol(t)), lit(0L)).as(atfCol(t)))): _*)
    val statCols =
      count(lit(1)).as("__n") +: sum("__dl").as("__sumdl") +:
        sum("__adl").as("__sumadl") +:
        (terms.map(t =>
          sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"__df_$t")) ++
          terms.map(t =>
            sum(when(col(atfCol(t)) > 0, 1L).otherwise(0L)).as(s"__adf_$t")))
    val stats = fielded.agg(statCols.head, statCols.tail: _*)
    def okapi(tf: Column, dfT: Column, dl: Column, sumdl: Column): Column = {
      val avgdl = sumdl.cast("double") / col("__n")
      val idf = log(lit(1.0) +
        (col("__n") - dfT.cast("double") + lit(0.5)) /
          (dfT.cast("double") + lit(0.5)))
      idf * (tf.cast("double") * (k1 + 1)) /
        (tf.cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * dl.cast("double") / avgdl))
    }
    val bodyScore = terms.map(t =>
      okapi(col(tfCol(t)), col(s"__df_$t"), col("__dl"), col("__sumdl")))
      .reduce(_ + _)
    // Gate on corpus-level anchor presence so an anchor-free corpus
    // degrades to plain bm25 instead of dividing by avgdl = 0.
    val anchorScore = when(col("__sumadl") > 0,
      terms.map(t =>
        okapi(col(atfCol(t)), col(s"__adf_$t"), col("__adl"),
          col("__sumadl"))).reduce(_ + _))
      .otherwise(lit(0.0))
    fielded
      .crossJoin(broadcast(stats))
      .filter((terms.map(t => col(tfCol(t)) > 0) ++
        terms.map(t => col(atfCol(t)) > 0)).reduce(_ || _))
      .select(col(idCol), col("__dl").as("dl"), col("__adl").as("adl"),
        round(bodyScore + lit(anchorWeight) * anchorScore, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** BM25 for MANY queries at once — `queries` is a `(qid, term)` row
    * table, answers are the `topK` docs per qid. The general form of
    * [[bm25]]'s literal-terms special case, shaped like an inverted
    * index built on the fly but restricted to the QUERY vocabulary:
    *
    * ONE corpus scan explodes tokens and immediately drops everything
    * outside the broadcast term set — only query-term occurrences ever
    * reach the (doc, term) tf aggregation (map-side combined), so the
    * shuffle is sized by matches, not by the corpus. Document length
    * rides the same scan (no second pass, no dl join); corpus size and
    * avgdl reduce to one broadcast row; per-term df comes off the tiny
    * tf table. Scoring joins tf ⋈ queries on term, sums per (qid,
    * doc), and the final cut is GroupedTopK's bounded per-qid heaps —
    * never a per-query sort.
    *
    * Scores are rounded to 6 AFTER the per-(qid, doc) sum (term
    * contributions are a commutative double sum — the final rounding
    * absorbs merge-order ulps, same contract as every summed-double
    * gate); ties cut by doc id. Requires GraftSparkExtensions (the
    * GroupedTopK planner strategy). */
  def bm25Batch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      termCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val terms = queries.select(col(termCol).as("__term")).distinct()
    val toks = TextAnalysis.tokens(col(textCol))
    // One scan: (doc, dl, term) for QUERY terms only; tf by (doc, term).
    val tf = df
      .select(col(idCol), size(toks).cast("long").as("__dl"),
        explode(toks).as("__term"))
      .join(broadcast(terms), "__term")
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"), first(col("__dl")).as("__dl"))
    // Corpus stats: one row. A second lightweight pass over (dl) only —
    // column-pruned to the text column's token count.
    val stats = df
      .select(size(toks).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))
    val dfT = tf.groupBy("__term").agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val idf = log(lit(1.0) +
      (col("__n") - col("__df").cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val termScore = idf * (col("__tf").cast("double") * (k1 + 1)) /
      (col("__tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(dfT), "__term")
      .crossJoin(broadcast(stats))
      // distinct mirrors bm25's require(terms.distinct == terms): a
      // duplicate (qid, term) row must not double-count that term.
      .join(queries.select(col(qidCol), col(termCol).as("__term")).distinct(),
        "__term")
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(termScore), 6).as("score"))
    graft.plans.GroupedTopK
      .topKPerGroup(scored, Seq(qidCol),
        Seq(col("score").desc, col(idCol).asc), topK)
  }
}
