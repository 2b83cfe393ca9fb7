package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sharding for training-data pipelines: assign documents
  * (ordered by a sort key) to contiguous shards of ~`budget` tokens —
  * the step that turns a cleaned corpus into fixed-size training shards.
  *
  * The semantics are a GLOBAL running token count, but the naive
  * formulation (`sum over (ORDER BY id ROWS UNBOUNDED PRECEDING)` with
  * no partition key) plans a single-task window — the whole corpus
  * through one reducer, the canonical 100 TB anti-pattern. This
  * operator computes the same prefix sum in two distributed passes:
  *
  *   1. range-partition by the sort key (so partition p holds a
  *      contiguous key range) and take ONE total per partition — a
  *      driver-side array of numPartitions longs, nothing more;
  *   2. broadcast the per-partition prefix offsets back and run the
  *      running sum as a per-partition window (parallel), adding the
  *      offset.
  *
  * A document whose tokens straddle a budget boundary belongs to the
  * shard its PRECEDING cumulative count falls in (documents are never
  * split): `shard = floor((cum − tokens) / budget)`.
  */
object Packing {

  /** Global running sum of `valueCol` in `idCol` order, as column
    * `__cum`, computed with the two-pass pattern above — never a
    * single-task global window. */
  def runningTotal(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      numPartitions: Int = 32): DataFrame =
    runningTotalBy(df, Seq(col(idCol)), col(valueCol), numPartitions)

  /** Global 1-based rank in `orderCols` order, as column `__rank` —
    * [[runningTotalBy]] of a constant 1. The distributed replacement
    * for `row_number() OVER (ORDER BY ...)` with no partition key (a
    * single-task window): per-partition row numbers run in parallel and
    * the broadcast offsets make them global. `orderCols` should be a
    * total order (append a unique tiebreaker) or ranks within a tie
    * group depend on the partitioning. */
  def globalRank(
      df: DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column],
      numPartitions: Int = 32): DataFrame =
    runningTotalBy(df, orderCols, lit(1L), numPartitions)
      .withColumnRenamed("__cum", "__rank")

  /** [[runningTotal]] generalized to ANY ordering — a `Seq` of order
    * columns, descending (`col.desc`) included: the same sort-order
    * expressions drive both the range partitioning and the
    * per-partition window, so the two passes agree on the global order.
    * Emits the running sum of `value` (nulls count 0) as `__cum`. */
  def runningTotalBy(
      df: DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column],
      value: org.apache.spark.sql.Column,
      numPartitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    // Pin the INPUT before the range exchange: RangePartitioner
    // derives its bounds from a SAMPLING JOB over the child, so an
    // unpinned `repartitionByRange` executes the input lineage twice —
    // once to sample, once to shuffle. For prefix sums the input is
    // often the expensive end of a pipeline (tokenize-with-merges in
    // the release, the corpus word count in vocab coverage), making
    // that a full hidden extra pass (r17 optimization, guide §1.2/§2.4;
    // measured: q_release 4.56 → ~4.1 s, q_vocab_coverage word-count
    // pass no longer runs twice). The pinned rows are exactly what the
    // exchange ships anyway, so the extra write is the same volume the
    // `ranged` checkpoint below already pays.
    // Lazy: the FIRST action over `pinned` is the range exchange's
    // sampling job, which visits every input partition exactly once
    // (RangePartitioner's sketch) — it materializes the blocks as a
    // side effect, so no dedicated pin job launches and no same-job
    // double-compute race exists.
    // Cost-aware (r18): a trivial lineage (pure projection/filter over
    // one leaf, or an already-pinned frame) re-executes for the cost
    // of a cheap scan — there the pin write/read is pure tax (the r17
    // q_bucket_pack/q_curriculum regression), so it is skipped and the
    // sampling pass just runs the scan twice.
    val pinned =
      if (Materialize.trivialLineage(df)) df
      else Materialize.checkpoint(df, eager = false)
    // Freeze the range partitioning: the per-partition totals job and
    // the final running-sum job must see the SAME partition boundaries
    // (RangePartitioner samples its bounds, so two executions of the
    // lineage could differ).
    val ranged = Materialize.checkpoint(pinned
      .repartitionByRange(numPartitions, orderCols: _*)
      .withColumn("__pid", spark_partition_id()))
    // Pass 1: one row per partition — O(numPartitions) driver state.
    // Nulls count as 0 here (an all-null partition must yield total 0,
    // not a driver-side NPE on getLong) — consistent with the window
    // pass below, whose sum() skips nulls like any SQL aggregate.
    val totals = ranged
      .groupBy("__pid")
      .agg(sum(coalesce(value.cast("long"), lit(0L))).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids
      .scanLeft((-1, 0L)) { case ((_, acc), p) => (p, acc + totals(p)) }
      .sliding(2)
      .collect { case Seq((_, acc), (p, _)) => p -> acc }
      .toMap
    // Literal pid→offset map + element_at, not a chained when(): a
    // when-chain is O(numPartitions) deep in generated code (codegen
    // blowup at 10k partitions), while a literal CreateMap constant-
    // folds into one map lookup. Every __pid seen in pass 2 exists in
    // the map (both passes read the same frozen partitioning), so the
    // lookup never misses.
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1)
          .flatMap { case (p, off) => Seq(lit(p), lit(off)) }: _*),
        col("__pid"))
    // Pass 2: per-partition running sum (parallel) + broadcast offset.
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__cum", sum(value.cast("long")).over(w) + offsetExpr)
      .drop("__pid")
  }

  def tokenShards(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numPartitions: Int = 32): DataFrame =
    tokenShardOffsets(df, idCol, tokenCol, budget, numPartitions)
      .drop("tok_offset")

  /** [[tokenShards]] plus each document's starting token offset WITHIN
    * its shard (`tok_offset = (cum − tokens) − shard·budget`, always in
    * `[0, budget)`) — the metadata a sequence-packing trainer needs to
    * place attention boundaries when shards are concatenated into
    * fixed-length training sequences. Pure per-row arithmetic on the
    * same prefix sum; a straddling doc still STARTS inside its shard,
    * its tokens simply run past the boundary (documents are never
    * split, per the [[tokenShards]] contract).
    *
    * Shard arithmetic is exact LONG `div`, not a double floor: beyond
    * 2^53 cumulative tokens (the 100 TB headroom boundary) a double
    * quotient can round up at an exact budget multiple, landing the doc
    * one shard high with a NEGATIVE offset. Integer division cannot
    * drift, at any magnitude. */
  def tokenShardOffsets(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numPartitions: Int = 32,
      startTokens: Long = 0L): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(startTokens >= 0, "startTokens must be non-negative")
    // `startTokens` CONTINUES a prior packing run's global token
    // counter — the incremental-release case: a recrawl batch packs
    // into shards numbered AFTER the released corpus's (pass the prior
    // manifest's next shard boundary, e.g. (max shard + 1) × budget,
    // so the new run opens a fresh shard). A constant added to the
    // prefix sum, so the plan is unchanged.
    runningTotal(df, idCol, tokenCol, numPartitions)
      .withColumn("__pre",
        col("__cum") - col(tokenCol).cast("long") + lit(startTokens))
      .withColumn("shard", expr(s"__pre div ${budget}L"))
      .withColumn("tok_offset", col("__pre") - col("shard") * budget)
      .drop("__cum", "__pre")
  }

  /** Deterministic weighted interleave of corpora — the training-mix
    * step ("70% web, 30% code"). Every source's rows get positions
    * `rank / weight` (rank = 1-based position in `idCol` order, via the
    * distributed prefix sum — a global row_number would be one task);
    * consuming the union in `pos` order yields each source at its
    * weight's rate. Sources must share the id/output schema produced
    * here: (source, rid, pos).
    *
    * ONE pass over the tagged union: range-partition by (source, id) so
    * each partition holds a contiguous slice of one or two sources, take
    * per-(source, partition) counts in a single O(sources × partitions)
    * driver collect, and add the broadcast offsets to a per-partition
    * row_number. The per-source `runningTotal` formulation this replaced
    * materialized and collected once PER SOURCE — three jobs and three
    * checkpoints for a three-way mix, now one of each. */
  def weightedMix(
      sources: Seq[(String, DataFrame, Double)],
      idCol: String,
      numPartitions: Int = 32): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    require(sources.map(_._1).distinct.size == sources.size,
      "source tags must be unique")
    val tagged = sources
      .map { case (tag, df, _) =>
        df.select(lit(tag).as("__src"), col(idCol).cast("long").as("rid"))
      }
      .reduce(_ unionByName _)
    val ranged = Materialize.checkpoint(tagged
      .repartitionByRange(numPartitions, col("__src"), col("rid"))
      .withColumn("__pid", spark_partition_id()))
    // Pass 1: O(sources × partitions) driver rows.
    val counts = ranged
      .groupBy("__src", "__pid")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val offsets: Map[(String, Int), Long] = counts.map { case ((s, p), _) =>
      (s, p) -> counts.collect { case ((s2, p2), c) if s2 == s && p2 < p => c }.sum
    }
    // Separator byte: a bare concat would alias ("a", 11) with ("a1", 1).
    val sep = "\u0001"
    val offsetKey = concat_ws(sep, col("__src"), col("__pid"))
    val offsetMap =
      if (offsets.isEmpty) lit(0L) // unused; keeps map() non-empty
      else map(offsets.toSeq.sortBy(_._1)
        .flatMap { case ((s, p), o) => Seq(lit(s"$s$sep$p"), lit(o)) }: _*)
    val weightMap = map(sources
      .flatMap { case (tag, _, w) => Seq(lit(tag), lit(w)) }: _*)
    // Pass 2: per-(source, partition) row_number — parallel across all
    // partitions, never a global single-task window.
    val w = Window.partitionBy("__src", "__pid").orderBy("rid")
    ranged
      .withColumn("__rank",
        row_number().over(w).cast("long") +
          (if (offsets.isEmpty) lit(0L)
           else coalesce(element_at(offsetMap, offsetKey), lit(0L))))
      .select(col("__src").as("source"), col("rid"),
        (col("__rank").cast("double") / element_at(weightMap, col("__src")))
          .as("pos"))
  }

  /** Length-bucketed sequence packing: assign each document to a
    * power-of-two length bucket (`length(bin(n))`; note zero-token
    * docs share bucket 1 with n=1 — see [[Vocab.lengthHistogram]]),
    * then fill fixed `contextLen`-token
    * bins greedily in id order WITHIN each bucket — the batch-shaping
    * step that keeps same-length docs together so a training batch
    * wastes minimal padding. Output per doc: `bucket`, `n` (tokens),
    * `bin` (which context window), `bin_offset` (token start within
    * it). A doc whose tokens straddle a bin boundary starts in the bin
    * its preceding within-bucket count falls in (docs are never
    * split), matching [[tokenShards]]' convention.
    *
    * Scale shape: the within-bucket prefix sum is NOT a
    * `Window.partitionBy(bucket)` — the hottest bucket would pull its
    * whole population through one reducer. Instead ONE global
    * [[runningTotalBy]] over `(bucket, id)` order gives a global
    * cumulative count, and each bucket's start offset (a ≤ 64-row
    * table: one row per binary digit count) is subtracted back via a
    * broadcast join. The only single-task window runs over that
    * bounded bucket table, never over rows. */
  def bucketedPack(
      df: DataFrame,
      idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      contextLen: Int,
      numPartitions: Int = 32): DataFrame =
    groupedPack(
      df.select(col(idCol), tokensCol.cast("long").as("__n0")),
      idCol,
      groupCol = length(bin(col("__n0"))).cast("int"),
      groupName = "bucket",
      tokensCol = col("__n0"),
      contextLen = contextLen,
      numPartitions = numPartitions)

  /** [[bucketedPack]] generalized to ANY bounded-cardinality grouping:
    * fill fixed `contextLen`-token bins greedily in id order WITHIN
    * each value of `groupCol` (a deterministic row-local expression —
    * a length bucket, a k-means cluster, a source). With a semantic
    * cluster id this is in-context packing: each context window is
    * filled from ONE cluster, so related documents land in the same
    * training sequence. Output per doc: the group (named `groupName`),
    * `n` (tokens), `bin` (which context window within the group),
    * `bin_offset` (token start within it); docs are never split — a
    * straddler starts in the bin its preceding within-group count
    * falls in, matching [[tokenShards]].
    *
    * Scale shape: the within-group prefix sum is NOT a
    * `Window.partitionBy(group)` — the hottest group would pull its
    * whole population through one reducer. Instead ONE global
    * [[runningTotalBy]] over `(group, id)` order gives a global
    * cumulative count, and each group's start offset (one row per
    * DISTINCT group value, which must therefore stay broadcastable —
    * ≤ 64 length buckets, k clusters) is subtracted back via a
    * broadcast join. The only single-task window runs over that
    * bounded group table, never over rows. */
  def groupedPack(
      df: DataFrame,
      idCol: String,
      groupCol: org.apache.spark.sql.Column,
      groupName: String,
      tokensCol: org.apache.spark.sql.Column,
      contextLen: Int,
      numPartitions: Int = 32): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val base = df.select(
      col(idCol),
      tokensCol.cast("long").as("n"),
      groupCol.as(groupName))
    val cum = runningTotalBy(
      base, Seq(col(groupName), col(idCol)), col("n"), numPartitions)
    // Group start offsets: bounded by the group cardinality, so the
    // unpartitioned window here is bounded, not a row-scale sort.
    // Derived from `cum` — the frame runningTotalBy already
    // checkpointed — not from `base`, which would re-scan the source
    // and re-evaluate the token-count expression over every row.
    val wGroups = Window.orderBy(groupName)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cum
      .groupBy(groupName)
      .agg(sum("n").as("__btotal"))
      .withColumn("__boffset",
        coalesce(sum("__btotal").over(wGroups), lit(0L)))
      .select(groupName, "__boffset")
    cum
      .join(broadcast(offsets), groupName)
      .withColumn("__cb", col("__cum") - col("n") - col("__boffset"))
      .withColumn("bin", expr(s"__cb DIV $contextLen"))
      .withColumn("bin_offset", col("__cb") % contextLen)
      .select(col(idCol), col(groupName), col("n"), col("bin"),
        col("bin_offset"))
  }
}
