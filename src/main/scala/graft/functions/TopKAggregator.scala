package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed top-k aggregator: keeps the k highest-scored (id, score) pairs
  * per group, ordered by (score desc, id asc).
  *
  * This is the scale-correct top-k shape: as an Aggregator it
  * participates in PARTIAL aggregation — each map task reduces its rows
  * to ≤ k candidates before the shuffle, so a query group shuffles
  * O(k × partitions) rows instead of every scored row. The window
  * (`row_number over partitionBy(query)`) formulation ships ALL score
  * rows of a group to one task — with few queries that's a handful of
  * hot partitions doing all the work.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, "k must be positive")

  private def trim(items: Seq[(Long, Double)]): Seq[(Long, Double)] =
    items.sortBy { case (id, sim) => (-sim, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(
      buf: Seq[(Long, Double)], row: (Long, Double)): Seq[(Long, Double)] =
    // fast reject: full buffer and the row can't beat the current tail
    if (buf.size >= k && {
        val (tid, tsim) = buf.last
        row._2 < tsim || (row._2 == tsim && row._1 > tid)
      }) buf
    else trim(buf :+ row)

  override def merge(
      a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    bufferEncoder
}

object TopKAggregator {
  /** Column-level UDAF: `topK(5)(col("id"), col("sim"))` aggregates to
    * `array<struct<_1: id, _2: sim>>` sorted by (sim desc, id asc). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKAggregator(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
}
