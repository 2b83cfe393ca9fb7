package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-curation operators for training-data pipelines: the
  * observability and selection steps that sit between cleaning
  * ([[Pipeline]], [[Dedup]]) and packing ([[Packing]], [[Splits]]) —
  * which filter dropped what, which quality tier feeds which epoch,
  * what order the trainer reads, and which docs fit the token budget.
  *
  * Everything here is either a per-row projection or reuses the
  * two-pass distributed prefix sum ([[Packing.runningTotalBy]]) — no
  * operator plans a single-task global window, no driver state beyond
  * O(partitions) offsets, so every shape survives a 1000-executor
  * 100 TB run unchanged.
  */
object Curation {

  /** Attrition report for an ORDERED filter chain — the per-stage
    * "how many docs did stage k see / pass" funnel every curation
    * pipeline reports (the number that explains why 100 TB in became
    * 31 TB out).
    *
    * ONE scan of the corpus: each row is classified by its FIRST
    * failing stage (a NULL predicate counts as a failure, exactly as a
    * `WHERE` would drop it; rows passing all k stages get index k), the
    * classification reduces to ≤ k+1 counts via partial aggregation,
    * and the report joins those counts against a k-row literal stage
    * table — tiny × tiny, both sides broadcast. Running the chain as k
    * separate `count()`s would scan the corpus k times and still race
    * the stages' interaction; this is exact, ordered, and linear.
    *
    * Returns `(stage_idx, stage, rows_in, rows_out)` where
    * `rows_in(0) = |df|` and `rows_in(i) = rows_out(i-1)`. */
  def filterFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be unique")
    val n = stages.length
    val failIdx = stages.zipWithIndex.foldRight(lit(n): Column) {
      case (((_, pred), i), els) =>
        when(!coalesce(pred, lit(false)), lit(i)).otherwise(els)
    }
    val perFail = df.select(failIdx.as("__fail"))
      .groupBy("__fail").agg(count(lit(1)).as("__c"))
    val spark = df.sparkSession
    import spark.implicits._
    val stageDf = stages.map(_._1).zipWithIndex
      .map { case (name, i) => (i, name) }.toDF("stage_idx", "stage")
    // rows_in(i) = rows that failed NO stage before i = Σ c[fail ≥ i];
    // rows_out(i) = Σ c[fail > i]. Deriving both from the ≤ k+1 fail
    // counts alone keeps the corpus scan at exactly ONE (a separate
    // total-count branch would re-scan — Spark shares no common
    // subtrees across DataFrame branches; spec-pinned). The `true`-
    // condition left join keeps every stage row when the corpus is
    // empty (sums over no rows → coalesce 0).
    stageDf
      .join(broadcast(perFail), lit(true), "left")
      .groupBy("stage_idx", "stage")
      .agg(
        coalesce(sum(when(col("__fail") >= col("stage_idx"), col("__c"))),
          lit(0L)).as("rows_in"),
        coalesce(sum(when(col("__fail") > col("stage_idx"), col("__c"))),
          lit(0L)).as("rows_out"))
  }

  /** Quality-binned curriculum sampling: rank the corpus by
    * `scoreCol` (ascending, `idCol` tiebreak), cut the ranking into
    * `keepPerMille.length` equal-size bins, and keep each bin at its
    * per-mille rate — "train mostly on the best tier, keep a taper of
    * the rest", the curriculum-mix step, with CONTENT-HASH determinism
    * (the kept set is a pure function of the rows — stable across
    * runs, partitionings and engines, like [[Splits.assignSplit]]).
    *
    * The global rank comes from [[Packing.globalRank]] (two-pass
    * prefix sum — never a single-task `row_number() OVER (ORDER BY)`),
    * the bin is integer arithmetic on (rank, corpus size), and the
    * keep decision is [[Splits.hashBucket]] against the bin's rate —
    * one extra O(1)-row broadcast for the corpus count, no second
    * shuffle. Adds the `bin` column to kept rows. */
  def curriculumSample(
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      keepPerMille: Seq[Int],
      numPartitions: Int = 32): DataFrame = {
    require(keepPerMille.nonEmpty, "need at least one bin")
    require(keepPerMille.forall(r => r >= 0 && r <= 1000),
      "rates are per-mille: 0..1000")
    val bins = keepPerMille.length
    val ranked = Packing.globalRank(df, Seq(scoreCol, col(idCol)), numPartitions)
    val total = ranked.agg(count(lit(1)).as("__n"))
    val rateMap = map(keepPerMille.zipWithIndex
      .flatMap { case (r, i) => Seq(lit(i), lit(r)) }: _*)
    // "cur:" prefix decorrelates these buckets from assignSplit's: with
    // the BARE id bucket, a 50%-rate bin would keep exactly the ids
    // assignSplit sends to train (bucket < 5000 ⊂ bucket < 9000) and
    // val/test would come out EMPTY after composing the two operators.
    ranked
      .crossJoin(broadcast(total))
      .withColumn("bin",
        floor(((col("__rank") - 1) * bins).cast("double") / col("__n"))
          .cast("int"))
      .filter(Splits.hashBucket(
        concat(lit("cur:"), col(idCol).cast("string"))) <
        element_at(rateMap, col("bin")) * 10)
      .drop("__rank", "__n")
  }

  /** Deterministic global shuffle order for training: `pos` is the
    * document's 0-based position under a seeded content-hash
    * permutation (`md5(seed ‖ id)` order, id tiebreak) — the "shuffle
    * the corpus before sharding" step, reproducible bit-for-bit from
    * the seed alone, independent of partitioning, cluster size or
    * engine (a `repartition`-and-hope shuffle is none of those).
    *
    * Position assignment is the [[Packing.globalRank]] two-pass prefix
    * sum over the hash order — the naive `row_number() OVER (ORDER BY
    * md5(...))` funnels 100 TB through one window task. Feed `pos` to
    * [[Packing.tokenShards]] (as the order key) to get shuffled
    * fixed-budget shards. */
  def shuffleOrder(
      df: DataFrame,
      idCol: String,
      seed: String,
      numPartitions: Int = 32): DataFrame = {
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    Packing.globalRank(df, Seq(key, col(idCol)), numPartitions)
      .withColumn("pos", col("__rank") - 1)
      .drop("__rank")
  }

  /** Deterministic weighted upsampling: each row replicated
    * `floor(w)` times plus one more for the hash-selected `frac(w)`
    * fraction of ids — "repeat the high-quality source 2.5×" from the
    * data-mixing recipe, with the SAME content-hash determinism as
    * [[Splits.assignSplit]] (the realized copy count is a pure function
    * of the row; corpus-wide, realized/nominal weight converges at the
    * hash's uniformity). Weights < 1 downsample (floor 0 + fractional
    * keep), weight 0 drops.
    *
    * Map-only: copy counts and the `sequence` fan-out are per-row
    * projections — zero shuffle at any corpus size. Emits `copy`
    * (1-based copy index); feed the result to [[shuffleOrder]] keyed on
    * (id, copy) to spread replicas through the training order.
    *
    * A NULL or NEGATIVE weight THROWS (per-row `raise_error`): a weight
    * map missing a source (a `when` chain with no `otherwise`) or an
    * underflowing weight computation must fail loudly, not silently
    * delete rows from the training mix. */
  def upsampleByWeight(
      df: DataFrame,
      idCol: String,
      weight: Column): DataFrame = {
    val frac = weight - floor(weight)
    // "up:" prefix decorrelates these buckets from assignSplit's.
    val bucket = Splits.hashBucket(
      concat(lit("up:"), col(idCol).cast("string")))
    val copies = when(weight.isNull || weight < 0, raise_error(concat(
      lit("upsampleByWeight: NULL or negative weight for id "),
      col(idCol).cast("string"),
      lit(" — weight expressions must cover every row with a weight >= 0")))
      .cast("int"))
      .otherwise((floor(weight) +
        when(bucket < frac * 10000, 1).otherwise(0)).cast("int"))
    df.withColumn("__n_copies", copies)
      // sequence(1, 0) would count DOWN; empty-array the non-kept rows.
      .withColumn("copy", explode(
        when(col("__n_copies") > 0, sequence(lit(1), col("__n_copies")))
          .otherwise(array().cast("array<int>"))))
      .drop("__n_copies")
  }

  /** Fixed-size deterministic sample: EXACTLY `n` documents (fewer only
    * if the corpus is smaller), chosen by seeded content-hash order —
    * the reproducible "give me 10k docs for the eval set" draw.
    * Rate-based hash sampling ([[Splits.hashBucket]] thresholds) can't
    * hit an exact count; ranking by `md5(seed ‖ id)` and taking the
    * first `n` can, and stays a pure function of (rows, seed).
    *
    * Plans as `TakeOrderedAndProject`: each partition keeps an n-bounded
    * heap and ships at most `n` rows — the full corpus is never globally
    * sorted (same shape q_limit pins). Driver-side merge is O(n·
    * partitions) rows, fine for sample-sized `n`; for corpus-scale
    * selection use [[budgetSelect]] or [[curriculumSample]] instead. */
  def fixedSample(
      df: DataFrame,
      idCol: String,
      n: Int,
      seed: String): DataFrame = {
    require(n > 0, "sample size must be positive")
    df.orderBy(
      md5(concat(lit(seed), col(idCol).cast("string"))), col(idCol))
      .limit(n)
  }

  /** Token-budget selection: keep the highest-`scoreCol` documents
    * whose RUNNING token total fits `budget` — "the best B tokens", the
    * data-constrained-scaling selection step (greedy by quality, exact
    * budget accounting, no sampling noise).
    *
    * The running total in (score DESC, id) order is
    * [[Packing.runningTotalBy]]'s two-pass prefix sum — the same
    * descending sort-order expressions drive the range partitioning
    * and the per-partition window, so no global single-task window
    * exists in the plan. A document straddling the boundary is
    * EXCLUDED (`cum ≤ budget`): the kept set never exceeds the budget.
    * Emits kept rows plus `cum_tokens`, the inclusive running total. */
  /** DSIR-style importance weighting (Xie et al. 2023, simplified to
    * unigram features): score every corpus document by the average
    * per-token log-likelihood ratio between a TARGET (in-domain)
    * unigram LM and the SOURCE (whole-corpus) unigram LM — documents
    * that look like the target domain score high, generic ones score
    * near 0, off-domain ones negative. Selecting the top slice by
    * `avg_llr` (e.g. via [[budgetSelect]] on it) is importance-based
    * data selection without a pretrained model.
    *
    * Both LMs are add-one smoothed over the SOURCE vocabulary (the
    * scored tokens are by construction source tokens, so neither model
    * can emit −∞; an empty target degrades to a uniform target LM).
    *
    * Scale shape: two vocab-sized frequency tables (one corpus-token
    * shuffle + one target-token shuffle, both map-side combined), the
    * scoring join is token ⋈ vocab, totals ride a broadcast cross
    * join, and the per-doc reduce is a partial-agg sum. Per-term
    * doubles are single divisions of exact counts (bit-identical
    * cross-engine); only the final sums are rounded. */
  def importanceWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = corpus.select(
      col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val srcFreq = toks.groupBy("tok").agg(count(lit(1)).as("cs"))
    val tgtFreq = target
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ct"))
    val totals = srcFreq
      .agg(sum("cs").as("ns"), count(lit(1)).as("v"))
      .crossJoin(tgtFreq.agg(coalesce(sum("ct"), lit(0L)).as("nt")))
    val scored = toks
      .join(srcFreq, "tok")
      .join(tgtFreq, Seq("tok"), "left")
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .crossJoin(broadcast(totals))
    val lpt = log((col("ct").cast("double") + 1.0d) /
      (col("nt").cast("double") + col("v").cast("double")))
    val lps = log((col("cs").cast("double") + 1.0d) /
      (col("ns").cast("double") + col("v").cast("double")))
    scored
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        round(sum(lpt - lps), 6).as("llr"),
        round(sum(lpt - lps) / count(lit(1)), 6).as("avg_llr"))
  }

  /** Per-source vocabulary DRIFT report: for every source, the
    * Jensen-Shannon divergence between its unigram token distribution
    * and the whole corpus's — the mixture-design observability number
    * ("which source's language is unlike the rest") that pairs with
    * [[importanceWeights]]'s per-document score. 0 = identical
    * distribution, ln 2 = disjoint support (natural-log JS).
    *
    * The q-side sum over words ABSENT from a source never materializes
    * the source × vocabulary cross: for p = 0 the word's JS term is
    * exactly `0.5·q·ln 2`, so the report is computed entirely on
    * (source, word-present-in-source) rows as
    * `Σ_in 0.5·[p·ln(2p/(p+q)) + q·ln(2q/(p+q))] + 0.5·ln2·(1 − Σ_in q)`.
    *
    * Scale shape: ONE corpus token shuffle to (source, word) counts
    * (map-side combined); everything after is vocab-sized — per-source
    * totals broadcast back, word totals join vocab ⋈ vocab, corpus
    * total rides a 1-row broadcast cross join. Per-term doubles are
    * divisions of exact counts; only the final sums are rounded. */
  def sourceDriftReport(
      df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val sw = df
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("csw"))
    val srcTot = sw.groupBy("source")
      .agg(sum("csw").as("ns"), count(lit(1)).as("vs"))
    val wTot = sw.groupBy("tok").agg(sum("csw").as("cw"))
    val nTot = sw.agg(sum("csw").as("n"))
    val joined = sw
      .join(wTot, "tok")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(nTot))
    val p = col("csw").cast("double") / col("ns").cast("double")
    val q = col("cw").cast("double") / col("n").cast("double")
    val term = lit(0.5) * (
      p * log(lit(2.0) * p / (p + q)) + q * log(lit(2.0) * q / (p + q)))
    joined
      .groupBy("source")
      .agg(
        max(col("ns")).as("n_tokens"),
        max(col("vs")).as("n_words"),
        round(sum(term) +
          lit(0.5) * log(lit(2.0)) * (lit(1.0) - sum(q)), 6)
          .as("js_vs_corpus"))
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis A-Res): take the `k` rows minimizing `-ln(u)/w`, where
    * `u ∈ (0, 1]` is derived from `md5(seed ‖ id)` — inclusion
    * probability scales with the weight (a quality score, a token
    * count, an importance weight from [[importanceWeights]]), yet the
    * draw is a pure function of (id, weight, seed): stable across
    * runs, partitionings, clusters and engines, like every sampling
    * primitive in this library ([[fixedSample]] is the uniform
    * special case — equal weights reduce to its md5 order).
    *
    * u reads the md5's first 13 hex chars (52 bits — exact in a
    * double), +1 so u is never 0. Rows with non-positive weight are
    * excluded (a zero-weight row would never win anyway; excluding
    * NULLs/zeros up front keys the k-heap only with finite keys).
    *
    * Scale shape: key is a row-local projection; selection is
    * `TakeOrderedAndProject` (bounded per-partition heaps + driver
    * merge of k rows), never a global sort. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: String = "ws"): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val u = (conv(
      substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("double") + 1.0d) / lit(4503599627370496.0d) // 16^13
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol) > 0)
      .orderBy(key.asc, col(idCol))
      .limit(k)
  }

  /** [[weightedSample]] with the weight given in LOG space — the
    * overflow-safe form for weights like DSIR's `exp(llr)`, where the
    * log-likelihood ratio of a long document easily exceeds `ln(Double
    * .MaxValue)`. Same draw by monotone transform: minimizing
    * `-ln(u)/e^l` is minimizing `ln(-ln(u)) − l` (the Gumbel top-k
    * trick), so no exp is ever taken. */
  def weightedSampleByLogWeight(
      df: DataFrame, idCol: String, logWeightCol: String, k: Int,
      seed: String = "ws"): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val u = (conv(
      substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("double") + 1.0d) / lit(4503599627370496.0d)
    val key = log(-log(u)) - col(logWeightCol).cast("double")
    df.filter(col(logWeightCol).isNotNull)
      .orderBy(key.asc, col(idCol))
      .limit(k)
  }

  def budgetSelect(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      scoreCol: Column,
      budget: Long,
      numPartitions: Int = 32): DataFrame = {
    require(budget > 0, "token budget must be positive")
    Packing.runningTotalBy(
      df, Seq(scoreCol.desc, col(idCol)), col(tokenCol), numPartitions)
      .filter(col("__cum") <= budget)
      .withColumnRenamed("__cum", "cum_tokens")
  }

  /** Hamilton (largest-remainder) apportionment of an integer budget
    * across keyed weights — the training-mix allocator: "split 10B
    * tokens across sources ∝ quality-weighted size" needs INTEGER
    * per-source budgets that sum to EXACTLY the total (floor-only
    * under-spends, rounding over/under-spends — both wrong as a
    * downstream contract; [[budgetSelect]] then fills each source's
    * allocation). Quota `budget·w/W` splits into `div` base seats and
    * an integer remainder `(budget·w) mod W`; the `budget − Σbase`
    * leftover seats go to the largest remainders (ties by key, so the
    * result is a pure function of the input). Integer arithmetic
    * throughout — the remainder IS the fractional part scaled by W,
    * so no double ever decides a seat; requires `budget·max(w)` to
    * fit a long (ANSI overflow errors loudly otherwise).
    *
    * Scale shape: one one-row total broadcast + one ordered window
    * over the KEY table — apportionment is across sources/domains,
    * low-cardinality by construction (the row-level work of consuming
    * the allocation lives in budgetSelect/GroupedTopK, not here). */
  def apportionBudget(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val w = col(weightCol).cast("long")
    // Lazily pinned: the keyed weight table feeds the total aggregate
    // AND the quota projection, and the quotas in turn feed the
    // base-seat sum AND the final seating — without the pin the
    // upstream lineage (often a corpus-scale census, e.g.
    // hostQuality's Gopher-gate aggregation in q_host_budget) executes
    // once per consumer (the populationStabilityBy multi-consumption
    // lesson; measured r17: q_host_budget 1.92 → ~1.3 s isolated).
    // Lazy, so constructing the allocation frame still launches no
    // jobs (the frontierPlanBudgeted construction contract).
    val keyed = Materialize.checkpoint(
      df.filter(w.isNotNull && w > 0)
        .select(col(keyCol).as("key"), w.as("weight")),
      eager = false)
    val total = broadcast(keyed.agg(sum(col("weight")).as("__w")))
    val quotas = keyed.crossJoin(total)
      .select(col("key"), col("weight"),
        expr(s"(${budget}L * weight) div __w").as("__base"),
        expr(s"(${budget}L * weight) % __w").as("__rem"))
    val leftOrder = Window.orderBy(col("__rem").desc, col("key").asc)
    val baseSum = broadcast(quotas.agg(sum(col("__base")).as("__bsum")))
    quotas.crossJoin(baseSum)
      .withColumn("__pos", row_number().over(leftOrder).cast("long"))
      .select(col("key"), col("weight"),
        (col("__base") +
          when(col("__pos") <= lit(budget) - col("__bsum"), 1L)
            .otherwise(0L)).as("alloc"))
  }

  /** Temperature-based source mixing (the multilingual-sampling rule of
    * Conneau & Lample et al.: sample source s with probability
    * ∝ n_s^α, α<1 flattening the head so low-resource sources are not
    * drowned): select ~`total` documents with per-source inclusion
    * rate `min(1, total·n_s^α / (Σ_t n_t^α) / n_s)`, decided by a
    * deterministic per-document hash threshold `u(id) < rate_s`.
    *
    * The hash-threshold draw (vs an exact per-source count) is the
    * scale decision: selection is MAP-ONLY — no per-source window, no
    * top-k, nothing shuffles; the only aggregation is the tiny
    * (sources × 1) count table collected to the driver (bounded by the
    * source cardinality) and folded back as a literal rate map. The
    * realized size concentrates within O(√total) of the target
    * (binomial), which is what mixture design needs — the EXACT-count
    * alternative is [[weightedSample]]/[[GroupedTopK]] per source.
    *
    * Engine-portable determinism: `u` is the [[weightedSample]]
    * md5-derived uniform; Σ n^α is accumulated in SOURCE-SORTED order
    * on the driver, which the oracle mirrors with an ordered list sum
    * — double addition is not associative, so the fold order is part
    * of the contract. */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      alpha: Double,
      total: Long,
      seed: String = "mx"): DataFrame = {
    // Rows with a NULL source are excluded (they have no mixture rate;
    // a null key would also break the sorted driver fold below).
    val nonNull = df.filter(col(srcCol).isNotNull)
    applyMixRates(nonNull, idCol, srcCol,
      temperatureRates(nonNull, srcCol, alpha, total), seed)
  }

  /** The per-source inclusion-rate table of [[temperatureMix]],
    * computed from a CENSUS frame (one bounded collect). Exposed so
    * rates learned on a batch census can screen a different frame —
    * in particular an unbounded stream, which cannot census itself
    * ([[graft.streaming.Streaming.temperatureMixStream]]). */
  def temperatureRates(
      census: DataFrame,
      srcCol: String,
      alpha: Double,
      total: Long): Seq[(String, Double)] = {
    require(alpha > 0 && alpha <= 1, "temperature alpha must be in (0, 1]")
    require(total > 0, "total must be positive")
    // Bounded collect: one row per source.
    val counts = census.filter(col(srcCol).isNotNull)
      .groupBy(srcCol).count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val sumPow = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.pow(n.toDouble, alpha)
    }
    // Rate rounded to 6 decimals: libm `pow` is not correctly-rounded,
    // so the raw double may differ from another engine's in the last
    // ulp — the rounded rate is the portable threshold (and 52-bit u
    // never sits within 1e-10 of a 1e-6 grid point in practice).
    counts.toSeq.map { case (s, n) =>
      val raw = math.min(
        1.0, total.toDouble * math.pow(n.toDouble, alpha) / sumPow / n.toDouble)
      s -> BigDecimal(raw)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** The map-only half of [[temperatureMix]]: keep rows whose
    * md5-uniform clears their source's rate. Sources absent from
    * `rates` (and NULL sources) fold to a NULL rate, so `u < NULL`
    * is NULL and the filter drops them. (NOT NaN: Spark orders NaN
    * above every double, so `u < NaN` would be TRUE and unknown
    * sources would pass unscreened.) */
  def applyMixRates(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      rates: Seq[(String, Double)],
      seed: String = "mx"): DataFrame = {
    val rateExpr = rates.foldLeft(lit(null).cast("double")) { case (els, (s, r)) =>
      when(col(srcCol) === s, lit(r)).otherwise(els)
    }
    val u = (conv(
      substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("double") + 1.0d) / lit(4503599627370496.0d)
    df.filter(u < rateExpr)
  }
}
