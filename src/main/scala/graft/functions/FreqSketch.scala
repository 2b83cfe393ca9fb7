package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{
  ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `freq_sketch(string, k) -> array<struct<item, count_lb>>`: heavy
  * hitters via the Misra–Gries summary — the frequency-sketch sibling
  * of [[DistinctLongSketch]] (exact distinct) and [[HllLongSketch]]
  * (approximate distinct) under the same mergeable-sketch contract
  * (update / serialize / merge / eval).
  *
  * State is AT MOST `k` (item, counter) pairs per group no matter the
  * stream size: an unseen item either claims a free counter or decays
  * every counter by 1 (Misra–Gries '82); merge adds counts pairwise and
  * re-decays by the (k+1)-th largest total (Agarwal et al., mergeable
  * summaries). The classic guarantee survives both: ANY item with true
  * frequency > N/(k+1) is in the final summary, and each reported
  * count is a lower bound within N/(k+1) of the truth.
  *
  * Exact top-k (`GroupedTopK`, `TakeOrderedAndProject`) beats this when
  * the item domain fits a shuffle; the sketch is for the
  * extreme-cardinality regime (per-group token/URL streams at 100 TB)
  * where even the (item, count) table is too hot — a few hundred bytes
  * cross the wire per group instead. Counter values (and which
  * NON-heavy items ride along) depend on partition merge order, so
  * results are rows-only cross-engine; the capture guarantee is the
  * portable contract, driver-gated by q_heavy_complete.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def prettyName: String = "freq_sketch"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType),
      StructField("count_lb", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure("freq_sketch needs k >= 1")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_sketch expects string, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buffer: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buffer.getOrDefault(item, 0L)
      if (cur > 0L) buffer.put(item, cur + 1L)
      else if (buffer.size() < k) buffer.put(item, 1L)
      else {
        // Decay step: every counter −1, evict zeros. O(k), amortized
        // O(1) per stream element (each decay retires k pending
        // increments).
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    other.forEach((item, c) =>
      buffer.put(item, buffer.getOrDefault(item, 0L) + c))
    if (buffer.size() > k) {
      // Subtract the (k+1)-th largest total from everything, drop ≤ 0 —
      // the mergeable-summaries decay that preserves the N/(k+1) bound.
      val counts = new Array[Long](buffer.size())
      var i = 0
      val valuesIt = buffer.values().iterator()
      while (valuesIt.hasNext) { counts(i) = valuesIt.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - (k + 1))
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= threshold) it.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size())
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    // Deterministic output order for a GIVEN final state: count desc,
    // item asc.
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val items = new Array[(Array[Byte], Long)](buffer.size())
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items(i) = (b, e.getValue)
      bytes += 4 + b.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.length)
    items.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new java.util.HashMap[String, Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Column-API entry: `df.agg(freqSketch(col("tok"), 8))`. */
  def freqSketch(c: Column, k: Int): Column =
    Bridge.column(AggregateExpression(
      MisraGriesSketch(Bridge.expression(c), k), Complete, isDistinct = false))
}
