package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic dataset splitting for training pipelines.
  *
  * `sample(seed)` is deterministic only for a fixed partitioning — a
  * repartition or a different cluster reshuffles the RNG streams. A
  * content-hash split is stable across runs, partitionings, clusters
  * and engines: the bucket is derived from md5 of the id itself, so a
  * row's split assignment is a pure function of the row. */
object Splits {

  /** Hash bucket in [0, 10000) from the id column (md5-based; the
    * first 8 hex chars parsed as an integer — portable SQL in any
    * engine, unlike engine-seeded hashes). */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 10000).cast("int")

  /** Split label by cumulative weight thresholds, first-match-wins:
    * `assignSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05,
    * "test" -> 0.05))`. */
  def assignSplit(id: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must sum to 1")
    val bucket = hashBucket(id)
    val cum = weights.scanLeft(0.0)((acc, w) => acc + w._2 * 10000).tail
      .map(x => math.round(x).toInt)
    weights.map(_._1).zip(cum).init.foldRight(lit(weights.last._1): Column) {
      case ((name, hi), els) => when(bucket < hi, lit(name)).otherwise(els)
    }
  }

  /** Exact proportional stratified sample — `ceil(n_s · num/den)` rows
    * of every stratum, the first by `(rankCol, tieCol)` order — WITHOUT
    * a per-stratum window (`Window.partitionBy(stratum)` concentrates a
    * stratum on ONE task; with a handful of language strata at 100 TB
    * that is a handful of reducers doing all the work).
    *
    * Same two-pass distributed prefix-sum shape as
    * [[Packing.runningTotal]], generalized to per-stratum ranks:
    *
    *   1. range-partition by `(stratum, rank, tie)` — each partition
    *      holds a contiguous slice, so a stratum spans consecutive
    *      partitions and the distinct `(partition, stratum)` pairs are
    *      at most `partitions + strata`; ONE count per pair plus the
    *      per-stratum totals go to the driver;
    *   2. broadcast the offsets back as a constant-folded literal map;
    *      the global in-stratum rank is then offset + a PER-PARTITION
    *      window rank (parallel across all partitions).
    *
    * The selected row set is identical to the
    * `row_number over (partition by stratum)` formulation (spec-pinned),
    * so the DuckDB window oracle still applies. Like `runningTotal`,
    * the range partitioning is frozen with one `localCheckpoint` so
    * both passes see the same boundaries. Quota arithmetic is pure
    * integer (`ceil(n·num/den) = (n·num + den − 1) div den`) — no float
    * boundary to diverge cross-engine. */
  def stratifiedSampleExact(
      df: DataFrame,
      stratumCol: String,
      rankCol: Column,
      tieCol: String,
      fracNum: Int,
      fracDen: Int,
      numPartitions: Int = 32): DataFrame = {
    require(fracNum > 0 && fracDen > 0, "fraction must be positive")
    val ranged = Materialize.checkpoint(df
      .withColumn("__rank", rankCol)
      .repartitionByRange(numPartitions, col(stratumCol), col("__rank"), col(tieCol))
      .withColumn("__pid", spark_partition_id()))
    // Pass 1: O(partitions + strata) driver rows.
    val counts = ranged
      .groupBy("__pid", stratumCol)
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.get(1).toString) -> r.getLong(2))
      .toMap
    val quotas: Map[String, Long] = counts
      .groupMapReduce(_._1._2)(_._2)(_ + _)
      .map { case (s, n) => s -> (n * fracNum + fracDen - 1) / fracDen }
    val offsets: Map[(Int, String), Long] = counts
      .map { case ((pid, s), _) =>
        (pid, s) -> counts.collect {
          case ((p, s2), c) if s2 == s && p < pid => c
        }.sum
      }
    def literalMap(entries: Map[String, Long]): Column =
      if (entries.isEmpty) map()
      else map(entries.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    // Separator byte: a bare concat would alias (pid=1, "1x") with
    // (pid=11, "x").
    val sep = "\u0001"
    val offsetKey = concat_ws(sep, col("__pid"), col(stratumCol))
    val offsetMap = literalMap(offsets.map { case ((p, s), o) => s"$p$sep$s" -> o })
    val quotaMap = literalMap(quotas)
    // Pass 2: per-(partition, stratum) rank — parallelism = partitions.
    val w = Window.partitionBy(col("__pid"), col(stratumCol))
      .orderBy(col("__rank"), col(tieCol))
    ranged
      .withColumn("__grank",
        row_number().over(w) + coalesce(element_at(offsetMap, offsetKey), lit(0L)))
      .filter(col("__grank") <=
        coalesce(element_at(quotaMap, col(stratumCol).cast("string")), lit(0L)))
      .drop("__rank", "__pid", "__grank")
  }
}
