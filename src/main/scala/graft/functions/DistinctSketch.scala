package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** `distinct_sketch(bigint) -> bigint`: EXACT distinct count via a
  * mergeable set sketch, implemented as a `TypedImperativeAggregate` —
  * the API for aggregation state that is not expressible as fixed-width
  * mutable-buffer columns (the same shape Spark's own HLL / percentile
  * sketches use).
  *
  * Why it exists when `count(DISTINCT x)` does too: `count(DISTINCT)`
  * plans a two-shuffle expand-deduplicate-aggregate; this sketch is ONE
  * partial/final aggregation — each task builds a local set, sets are
  * union-merged on the reduce side, and only serialized sketches cross
  * the wire. Exact-but-mergeable is the right trade until the per-group
  * cardinality itself is too big to hold, at which point swap the buffer
  * for an HLL register array — the operator shape (update / serialize /
  * merge / eval) is already the sketch contract, which is the point of
  * the demonstration.
  */
case class DistinctLongSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  override def prettyName: String = "distinct_sketch"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_sketch expects bigint, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(
      buffer: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.HashSet[Long],
      other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: java.util.HashSet[Long]): Any = buffer.size.toLong

  override def serialize(buffer: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size())
    bb.putInt(buffer.size())
    buffer.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val set = new java.util.HashSet[Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { set.add(bb.getLong()); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctLongSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctLongSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DistinctLongSketch =
    copy(child = newChildren.head)
}

object DistinctSketch {
  /** Column-API entry: `df.groupBy(g).agg(distinctSketch(col("x")))`. */
  def distinctSketch(c: Column): Column =
    Bridge.column(AggregateExpression(
      DistinctLongSketch(Bridge.expression(c)), Complete, isDistinct = false))
}
