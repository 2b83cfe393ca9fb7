package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03) in ONE native pass: tokenize → k-shingle rolling hashes →
  * width-`w` window minima → distinct, all in a tight loop over the raw
  * string — the fused form of `TextAnalysis.shingleHashes` +
  * `windowMinDistinct`.
  *
  * Semantics are BIT-IDENTICAL with the composable chain (spec-pinned):
  * single-space tokenization with empty tokens preserved, shingles =
  * every k-token window joined by one space, hash = fold
  * `h*257 + codepoint mod 1e9+7` over the shingle's code points (the
  * arithmetic any SQL engine reproduces — the oracle needs no Spark
  * hash function), nWin = max(nShingles − w + 1, 1) so short documents
  * get one partial window, distinct in first-occurrence order. Fewer
  * than k tokens → empty array.
  *
  * Why native: the composable chain is interpreted expression eval —
  * per character it walks an Expression tree (split, ascii, multiply,
  * mod), and the hash array must be pre-projected to dodge the
  * no-CSE-in-lambdas re-evaluation trap (SCALE.md). Here the whole
  * pipeline is one codegen'd call on `UTF8String` bytes: no token
  * array, no per-char objects, no intermediate hash array
  * materialization beyond one primitive long[].
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1 && w >= 1, "shingle size and window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  private final val Mod = 1000000007L
  private final val Base = 257L

  /** Public for the codegen reference call. */
  def winnow(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    // token start offsets under split(" ") semantics (empty preserved)
    var nTok = 1
    var i = 0
    while (i < n) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    // rolling hash of each k-token shingle: exactly the characters from
    // starts(j) to the end of token j+k-1 (separators are single
    // spaces, so the shingle IS that substring); iterate code points to
    // match ascii(split(g, "")) semantics beyond the BMP
    val nSh = nTok - k + 1
    val hashes = new Array[Long](nSh)
    var j = 0
    while (j < nSh) {
      val from = starts(j)
      val until = if (j + k < nTok) starts(j + k) - 1 else n
      var h = 0L
      var p = from
      while (p < until) {
        val cp = s.codePointAt(p)
        h = (h * Base + cp) % Mod
        p += Character.charCount(cp)
      }
      hashes(j) = h
      j += 1
    }
    // width-w window minima (one partial window when nSh < w), distinct
    // in first-occurrence order
    val nWin = math.max(nSh - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var v = 0
    while (v < nWin) {
      var m = hashes(v)
      var q = v + 1
      val lim = math.min(v + w, nSh)
      while (q < lim) { if (hashes(q) < m) m = hashes(q); q += 1 }
      seen.add(m)
      v += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFp", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
