package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows `(key, t)` matched to right
  * intervals `(key, start, end)` with `start ≤ t ≤ end`.
  *
  * The naive formulation is a broadcast-nested-loop (quadratic per key).
  * Bucketing time into fixed-width buckets turns it into an EQUI-join:
  * each interval explodes to the buckets it covers, each left row joins
  * its single bucket, and the exact predicate filters within the bucket
  * — join cost is Σ bucket-pair sizes, never |L|·|R| per key. A left row
  * meets an interval in at most one bucket (the one containing `t`), so
  * no dedup pass is needed.
  *
  * Time columns are LONG (e.g. `unix_micros(ts)`): bucket ids use
  * integer division — a double quotient could misbucket at boundaries.
  * Pick `bucketWidth` ≈ the typical interval length so intervals span
  * O(1) buckets.
  */
object RangeJoin {

  def bucketedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket", expr(s"$leftTime div $bucketWidth"))
    val rb = right
      .withColumn("__bucket",
        explode(sequence(
          expr(s"$rightStart div $bucketWidth"),
          expr(s"$rightEnd div $bucketWidth"))))
    lb.join(rb,
        lb("__bucket") === rb("__bucket") &&
          lb(leftKey) === rb(rightKey) &&
          lb(leftTime) >= rb(rightStart) && lb(leftTime) <= rb(rightEnd))
      .drop("__bucket")
  }
}
