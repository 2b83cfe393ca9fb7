package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio statistics of a text column in one native pass:
  * `(n_bytes, z_bytes)` — UTF-8 length and DEFLATE (zlib level 6)
  * length. The ratio `z/n` is the classic model-free quality signal
  * (low ⇒ template/boilerplate/repetition, near/above 1 ⇒ already-
  * compressed or random bytes masquerading as text) used by
  * RefinedWeb/Dolma-class curation stacks; it catches LONG-RANGE
  * repetition that n-gram signals dilute (a page whose second half
  * repeats its first half has unremarkable 5-gram stats but compresses
  * 2:1).
  *
  * Determinism: a fixed level (6), fixed strategy, fresh dictionary per
  * value — the byte count is a pure function of the text for a given
  * zlib build. The JDK bundles its own zlib, so the count is stable
  * across partitions, executors and JVMs of the same release, but is
  * NOT a cross-engine spec constant — which is why the corpus query is
  * declared rows-only and the invariants (ratio band, doubling
  * sub-additivity, re-evaluation equality) carry the oracle gate
  * (q_compress_sanity), the q_sample_bounds pattern.
  *
  * Scale: map-only; the Deflater is thread-local and `reset()` between
  * values (native allocation per thread, not per row). */
case class DeflateStats(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("z_bytes", LongType, nullable = false)))

  override def prettyName: String = "deflate_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  /** Public for the codegen reference call. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val d = DeflateStats.deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var z = 0L
    val buf = DeflateStats.buffer.get()
    while (!d.finished()) z += d.deflate(buf)
    new GenericInternalRow(Array[Any](bytes.length.toLong, z))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateS", this, classOf[DeflateStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateStats =
    copy(child = newChild)
}

object DeflateStats {

  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ false)
  }
  private val buffer = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def deflateStats(text: Column): Column =
    Bridge.column(DeflateStats(Bridge.expression(text)))
}
