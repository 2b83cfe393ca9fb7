package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The n-gram repetition MASSES of a text column in ONE native pass:
  * `(top_mass, dup_mass, total_mass)` over the word n-gram multiset —
  * the fused form of `TextAnalysis.gopherRepetitionChain`'s
  * sort_array + fold, which pays interpreted higher-order-function
  * evaluation per element (measured 4.0 s for the three-signal query
  * at sf0.1; the native pass exists to take that out of the hot path).
  *
  * Bit-parity contract (spec-pinned against the chain): tokens are
  * `split(" ")` pieces with empties preserved; a gram is `n`
  * consecutive tokens joined by single spaces; gram mass is
  * occurrences × `length(gram)` in CODE POINTS (`UTF8String.numChars`,
  * Spark's `length`); runs are counted in `sort_array` order
  * (UTF8String binary comparison) and the top gram is the FIRST run
  * reaching the maximum count in that order — the lexicographically
  * smallest among ties, exactly the chain's strict-`>` fold. All
  * three outputs are exact integers; the caller derives fractions with
  * Spark's own division + round, so float semantics can never drift
  * between the native and composable forms. */
case class GopherRepetition(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  require(n >= 1, "gram size must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("top_mass", LongType, nullable = false),
    StructField("dup_mass", LongType, nullable = false),
    StructField("total_mass", LongType, nullable = false)))

  override def prettyName: String = "gopher_repetition"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  /** Public for the codegen reference call. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    // split(" ") with empty tokens preserved
    var nTok = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val nGrams = nTok - n + 1
    if (nGrams <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val toks = new Array[String](nTok)
    var t = 0
    var from = 0
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') {
        toks(t) = s.substring(from, i); t += 1; from = i + 1
      }
      i += 1
    }
    toks(t) = s.substring(from, len)
    // n consecutive tokens, single-space joined
    val grams = new Array[UTF8String](nGrams)
    val sb = new java.lang.StringBuilder
    var g = 0
    while (g < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      grams(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    // sort_array order = UTF8String binary comparison; equal-gram runs
    java.util.Arrays.sort(grams, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var topMass = 0L
    var topCount = 0L
    var dupMass = 0L
    var totalMass = 0L
    var runLen = 0L
    def closeRun(idx: Int): Unit = if (runLen > 0) {
      val chars = grams(idx).numChars().toLong
      totalMass += runLen * chars
      if (runLen >= 2L) dupMass += runLen * chars
      if (runLen > topCount) { topCount = runLen; topMass = runLen * chars }
    }
    var j = 0
    while (j < nGrams) {
      if (j > 0 && grams(j) == grams(j - 1)) runLen += 1L
      else { closeRun(j - 1); runLen = 1L }
      j += 1
    }
    closeRun(nGrams - 1)
    new GenericInternalRow(Array[Any](topMass, dupMass, totalMass))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherRep", this, classOf[GopherRepetition].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

object GopherRepetition {

  def gopherMasses(text: Column, n: Int): Column =
    Bridge.column(GopherRepetition(Bridge.expression(text), n))
}
