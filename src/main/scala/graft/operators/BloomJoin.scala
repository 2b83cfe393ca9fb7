package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

import graft.functions.BloomMightContainLong

/** Explicit bloom-filter join pruning.
  *
  * For a selective semi/equi join where the big side must shuffle, a
  * bloom filter built from the small side's keys and applied as a scan-
  * side filter removes most non-matching rows BEFORE the exchange — at
  * 100 TB the shuffle volume, not the join itself, is the bottleneck.
  * Spark's AQE injects runtime bloom filters only when its heuristics
  * fire (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this
  * operator is the user-controllable form of the same plan shape.
  *
  * The result is EXACT: the bloom pass only drops rows that provably
  * don't match (no false negatives); survivors still go through the
  * real semi join, which removes the false positives.
  */
object BloomJoin {

  /** `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)` with a
    * bloom prefilter on the big side. Keys must be integral (long).
    * `expectedItems`/`fpp` size the filter — one distributed aggregation
    * over the small side builds it; it is then broadcast to every scan
    * task, O(bits) per executor. */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    // Native codegen'd probe (see [[BloomMightContainLong]]): the
    // per-row scan filter must not box keys or break whole-stage
    // codegen — a UDF here would do both.
    val might = Bridge.column(BloomMightContainLong(
      Cast(Bridge.expression(col(bigKey)), LongType), bc))
    big
      .filter(col(bigKey).isNotNull && might)
      .join(small, big(bigKey) === small(smallKey), "leftsemi")
  }
}
