package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag training documents that overlap
  * an evaluation set in k-word shingles (the classic "benchmark leaked
  * into the crawl" check run before every LLM training job; see the
  * n-gram-overlap decontamination described in public LM reports).
  *
  * Scale design (100 TB corpus, small eval set): the eval side is
  * reduced to its DISTINCT pooled shingle set — eval benchmarks are
  * MBs, so this set is broadcast; the training side then needs exactly
  * one map-side hash semi-join over its exploded shingles plus one
  * `groupBy(doc)` partial-aggregated count. No shuffle ever carries the
  * corpus text, and the corpus is scanned once. If the eval set ever
  * outgrows the broadcast threshold, drop the `broadcast` hint and
  * Spark falls back to a shuffle join on the shingle — same semantics.
  *
  * Reference scope: dbfs-spark-cache has no decontamination operator;
  * this belongs to the beyond-parity LLM-pipeline surface
  * (SURVEY.md §7.5) alongside dedup/splits.
  */
object Decontaminate {

  /** Per-training-doc overlap with the pooled eval shingle set.
    *
    * Returns `(doc_id, n_shingles, n_shared, contaminated)` — one row
    * per training document: its distinct-shingle count, how many of
    * those shingles occur anywhere in the eval pool, and the
    * `n_shared >= minShared` flag. Exact integer arithmetic throughout,
    * so the result is engine-independent.
    */
  def ngramOverlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minShared: Int = 5): DataFrame = {
    val sh = Shingles.wordShingles(col(textCol), k)
    val evalGrams = eval
      .select(explode(sh).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    // ONE corpus scan: shingle count and exploded shingles come off the
    // same staged projection (a separate counts branch would re-read
    // the corpus — Spark shares no common subtrees across DataFrame
    // branches). explode_outer keeps empty/NULL-shingle docs as a
    // single null-gram row, which matches nothing in the broadcast left
    // join and lands at n_shared = 0; size is coalesced so a NULL-text
    // doc reports n_shingles = 0, never -1/NULL.
    train
      .select(col(idCol).as("doc_id"), sh.as("__sh"))
      .select(col("doc_id"),
        coalesce(size(col("__sh")), lit(0)).cast("long").as("__n"),
        explode_outer(col("__sh")).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        first(col("__n")).as("n_shingles"),
        count(col("__hit")).as("n_shared"))
      .select(
        col("doc_id"),
        col("n_shingles"),
        col("n_shared"),
        (col("n_shared") >= minShared).as("contaminated"))
  }

  /** N-gram-size sensitivity sweep for decontamination tuning: the
    * per-doc overlap of [[ngramOverlap]] computed for EVERY `k` in
    * `ks`, in ONE corpus scan. Short shingles over-flag (common
    * phrases), long shingles under-flag (miss paraphrase); this report
    * is how the k for a production decontamination pass is chosen from
    * measurement.
    *
    * Scale shape: the corpus projection builds `(k, gram)` structs for
    * all shingle sizes row-locally and explodes ONCE; the eval pool
    * (distinct `(k, gram)`, still benchmark-sized × |ks|) broadcasts;
    * one partial-aggregated `groupBy(doc, k)`. Corpus text is read and
    * tokenized exactly once for the whole sweep — running
    * [[ngramOverlap]] per k would scan it |ks| times. */
  def ngramOverlapSweep(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      ks: Seq[Int] = Seq(3, 4, 5)): DataFrame = {
    require(ks.nonEmpty, "need at least one shingle size")
    def tagged(kv: Int) = transform(
      Shingles.wordShingles(col(textCol), kv),
      g => struct(lit(kv).as("k"), g.as("g")))
    val allGrams = flatten(array(ks.map(tagged): _*))
    val evalGrams = eval
      .select(explode(allGrams).as("kg"))
      .select(col("kg.k").as("k"), col("kg.g").as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    train
      .select(col(idCol).as("doc_id"), explode(allGrams).as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.g").as("g"))
      .join(broadcast(evalGrams), Seq("k", "g"), "left")
      .groupBy("doc_id", "k")
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_shared"))
  }

  /** [[ngramOverlap]] against MANY eval sets at once: which benchmark
    * leaked into which training doc. Returns one row per
    * `(doc_id, eval_set)` pair at or above `minShared` distinct shared
    * shingles — the per-benchmark contamination report a release
    * screens against (pooling sets first, as [[ngramOverlap]] does,
    * names the doc but not the benchmark).
    *
    * Same scale shape: the eval side reduces to its distinct
    * `(set, shingle)` pairs (benchmarks are MBs — broadcast), the
    * corpus is scanned ONCE, and the only shuffle is the partial-agg
    * count over `(doc, set)` HITS — rows exist only where a doc
    * actually shares a shingle with a set, not |docs|×|sets|. */
  /** The published GPT-3 / Pile decontamination preset: a training
    * document is contaminated by an eval set as soon as they share ANY
    * single 13-gram (k = 13, minShared = 1 — the collision rule the
    * GPT-3 appendix and later benchmark-leak reports actually state,
    * vs the tunable thresholds of [[ngramOverlapPerSet]]). 13 words is
    * long enough that a shared shingle is near-certain copying, so the
    * published rule needs no minimum-count cushion. Same scale shape as
    * the general form: eval (set, 13-gram) pairs broadcast, corpus
    * scanned once, only (doc, set) hits shuffle. */
  def decontaminate13Gram(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      setCol: String): DataFrame =
    ngramOverlapPerSet(train, eval, idCol, textCol, setCol,
      k = 13, minShared = 1)

  def ngramOverlapPerSet(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      setCol: String,
      k: Int = 3,
      minShared: Int = 5): DataFrame = {
    val sh = Shingles.wordShingles(col(textCol), k)
    val evalGrams = eval
      .select(col(setCol).as("eval_set"), explode(sh).as("g"))
      .distinct()
    train
      .select(col(idCol).as("doc_id"), explode(sh).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id", "eval_set")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[ngramOverlapPerSet]] with a BLOOM pre-filter on the exploded
    * training shingles — the steady-state shape when the pooled eval
    * gram set has outgrown comfortable broadcast-hash-join probing
    * (many benchmarks × paraphrase expansions): a compact bloom over
    * `xxhash64(gram)` drops definitely-unshared shingles MAP-SIDE in
    * codegen before the join ever sees them, so the join input shrinks
    * from every-train-shingle to probable-hits (crawl text shares
    * almost nothing with benchmarks — the overwhelming majority of
    * shingles die in the bloom probe).
    *
    * LOSSLESS, same contract as the bloom dedup pass
    * ([[Dedup.dedupAgainstReferenceBloom]]): a bloom negative is
    * definitely not in the eval pool and contributes nothing to
    * `n_shared`; a false positive survives to the exact join and dies
    * there. Result bit-identical to the plain form (spec-pinned). */
  def ngramOverlapPerSetBloom(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      setCol: String,
      k: Int = 3,
      minShared: Int = 5,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.LongType
    val sh = Shingles.wordShingles(col(textCol), k)
    val evalGrams = eval
      .select(col(setCol).as("eval_set"), explode(sh).as("g"))
      .distinct()
    val bf = evalGrams
      .select(xxhash64(col("g")).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val might = Bridge.column(graft.functions.BloomMightContainLong(
      Cast(Bridge.expression(xxhash64(col("g"))), LongType), bc))
    train
      .select(col(idCol).as("doc_id"), explode(sh).as("g"))
      .filter(might)
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id", "eval_set")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
