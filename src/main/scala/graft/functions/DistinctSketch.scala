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

/** `hll_sketch(bigint) -> bigint`: APPROXIMATE distinct count via
  * HyperLogLog registers — the extreme-cardinality counterpart of
  * [[DistinctLongSketch]] under the same operator contract
  * (update / serialize / merge / eval). State is a FIXED 2^p bytes per
  * group regardless of cardinality (p = 12 → 4 KiB, ~1.6% relative
  * error), registers merge by elementwise max (commutative and
  * idempotent, so the estimate is independent of partitioning), and
  * only the fixed-size register arrays cross the wire. Hashing is
  * splitmix64 — deterministic, engine-pinned (hence no cross-engine
  * oracle; correctness is pinned by tolerance + partition-invariance
  * tests). */
case class HllLongSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllLongSketch._

  override def prettyName: String = "hll_sketch"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch expects bigint, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = splitmix64(v.asInstanceOf[Long])
      val idx = (h >>> (64 - P)).toInt
      // Rank of the first set bit in the remaining 64-P bits (1-based);
      // all-zero remainder gets the maximum rank 64-P+1.
      val w = h << P
      val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > buffer(idx)) buffer(idx) = rank.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -buffer(i).toDouble)
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / invSum
    // Linear counting in the small range; no large-range correction
    // needed with a 64-bit hash.
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllLongSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllLongSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllLongSketch =
    copy(child = newChildren.head)
}

object HllLongSketch {
  val P = 12
  val M: Int = 1 << P
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** 64-bit finalizer-quality mixer (public-domain splitmix64 step). */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

object DistinctSketch {
  /** Column-API entry: `df.groupBy(g).agg(distinctSketch(col("x")))`. */
  def distinctSketch(c: Column): Column =
    Bridge.column(AggregateExpression(
      DistinctLongSketch(Bridge.expression(c)), Complete, isDistinct = false))

  /** Column-API entry for the HLL variant (fixed 4 KiB state/group). */
  def hllSketch(c: Column): Column =
    Bridge.column(AggregateExpression(
      HllLongSketch(Bridge.expression(c)), Complete, isDistinct = false))
}
