package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
