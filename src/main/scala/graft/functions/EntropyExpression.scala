package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-distribution features of a text column in ONE native pass:
  * (n_words, n_unique, raw Shannon entropy in bits) — the fused form of
  * `TextAnalysis.entropyFeatures`' sorted-fold chain.
  *
  * Bit-parity contract (spec-pinned against the composable chain):
  * tokens are `split(" ")` pieces with empties preserved; runs are
  * counted over the tokens in `sort_array` order (UTF8String BINARY
  * comparison — Java String order would diverge on non-ASCII); the run
  * sum `Σ c·log2 c` accumulates left-to-right in that order with
  * `log2 x = StrictMath.log(x) / StrictMath.log(2.0)` — exactly the
  * arithmetic Spark's `Log2` expression performs — and the entropy is
  * `log2(n) − Σ/n` with the same operation order as the expression
  * tree. Rounding is deliberately NOT done here: the caller applies
  * Spark's own `round(x + 0.0, 6)`, so rounding semantics can never
  * drift between the native and composable forms. */
case class EntropyFeatures(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("entropy_raw", DoubleType, nullable = false)))

  override def prettyName: String = "entropy_features"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  private def log2(x: Double): Double =
    StrictMath.log(x) / StrictMath.log(2.0)

  /** Public for the codegen reference call. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // split(" ") with empty tokens preserved
    var nTok = 1
    var i = 0
    while (i < n) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val toks = new Array[UTF8String](nTok)
    var t = 0
    var from = 0
    i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') {
        toks(t) = UTF8String.fromString(s.substring(from, i)); t += 1
        from = i + 1
      }
      i += 1
    }
    toks(t) = UTF8String.fromString(s.substring(from, n))
    // sort_array order = UTF8String binary comparison
    java.util.Arrays.sort(toks, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    // runs in sorted order: Σ c·log2 c left-to-right, distinct count
    var u = 0L
    var sum = 0.0
    var runLen = 0L
    var j = 0
    while (j < nTok) {
      if (j > 0 && toks(j) == toks(j - 1)) runLen += 1L
      else {
        if (runLen > 0L) sum = sum + runLen.toDouble * log2(runLen.toDouble)
        runLen = 1L
        u += 1L
      }
      j += 1
    }
    sum = sum + runLen.toDouble * log2(runLen.toDouble)
    val nD = nTok.toDouble
    new GenericInternalRow(Array[Any](nTok.toLong, u, log2(nD) - sum / nD))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("entropyF", this, classOf[EntropyFeatures].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): EntropyFeatures =
    copy(child = newChild)
}

object EntropyFeatures {

  def entropyFeatures(text: Column): Column =
    Bridge.column(EntropyFeatures(Bridge.expression(text)))
}
