package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined anchored span digests in ONE native pass — the fused
  * form of `SubstringDedup.anchoredSpanProfile`'s anchor-selection +
  * span-digesting stage: for every code-point position p in
  * `1..numChars-spanLen+1`, position p is an ANCHOR when
  * `md5(substr(text, p, anchorK))` starts with `anchorZeros` '0' hex
  * chars, and each anchor contributes `md5(substr(text, p, spanLen))`
  * (lowercase hex) to the output array.
  *
  * Semantics are BIT-IDENTICAL with the composable
  * `filter(sequence(...), i -> md5(substr...))` formulation and with
  * DuckDB's `md5(substr(t, i, n))` (spec-pinned, incl. non-ASCII):
  * positions and lengths count CODE POINTS (Spark `substr` semantics),
  * digests run over the UTF-8 bytes of the substring, and md5 is md5.
  *
  * Why native: the lambda formulation allocates a boxed position
  * sequence and walks an interpreted Expression tree per position —
  * O(|text|) md5 probes pay tree-eval + substring-copy + hex-encode
  * overhead each. Here one pass decodes the code-point byte offsets
  * once, digests k-grams as in-place byte-range updates on a reused
  * MessageDigest, hex-encodes only the zeros-prefix check bytes it
  * needs, and allocates output only for actual anchors (density
  * 16^-anchorZeros).
  */
case class AnchoredSpanDigests(
    child: Expression, spanLen: Int, anchorK: Int, anchorZeros: Int)
    extends UnaryExpression with Serializable {

  require(spanLen > 0 && anchorK > 0 && anchorK <= spanLen,
    s"need 0 < anchorK <= spanLen, got anchorK=$anchorK spanLen=$spanLen")
  require(anchorZeros >= 1 && anchorZeros <= 8,
    s"anchorZeros must be in [1, 8], got $anchorZeros")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "anchored_span_digests"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  /** Public for the codegen reference call. */
  def spanDigests(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // code-point start offsets (a UTF-8 byte starts a code point unless
    // it is a continuation byte 10xxxxxx); off(numChars) = nBytes
    var numChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) numChars += 1
      b += 1
    }
    if (numChars < spanLen) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](numChars + 1)
    var c = 0
    b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) { off(c) = b; c += 1 }
      b += 1
    }
    off(numChars) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val out = new java.util.ArrayList[Any]()
    val nPos = numChars - spanLen + 1
    var p = 0
    while (p < nPos) {
      md.update(bytes, off(p), off(p + anchorK) - off(p))
      md.digest(dig, 0, 16)
      if (AnchoredSpanDigests.leadingZeroNibbles(dig, anchorZeros)) {
        md.update(bytes, off(p), off(p + spanLen) - off(p))
        md.digest(dig, 0, 16)
        out.add(UTF8String.fromString(AnchoredSpanDigests.hex(dig)))
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    spanDigests(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanDig", this, classOf[AnchoredSpanDigests].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.spanDigests($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AnchoredSpanDigests =
    copy(child = newChild)
}

/** [[AnchoredSpanDigests]] with POSITIONS: each element is
  * `struct(i int, h string)` where `i` is the 1-based code-point
  * position of the anchor and `h` the span digest — for operators that
  * need span COORDINATES (interval-union character coverage, span
  * extraction), not just identity. Anchor/digest semantics identical.
  */
case class AnchoredSpanPosDigests(
    child: Expression, spanLen: Int, anchorK: Int, anchorZeros: Int)
    extends UnaryExpression with Serializable {

  require(spanLen > 0 && anchorK > 0 && anchorK <= spanLen,
    s"need 0 < anchorK <= spanLen, got anchorK=$anchorK spanLen=$spanLen")
  require(anchorZeros >= 1 && anchorZeros <= 8,
    s"anchorZeros must be in [1, 8], got $anchorZeros")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "anchored_span_pos_digests"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  /** Public for the codegen reference call. */
  def spanPosDigests(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var numChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) numChars += 1
      b += 1
    }
    if (numChars < spanLen) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](numChars + 1)
    var c = 0
    b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) { off(c) = b; c += 1 }
      b += 1
    }
    off(numChars) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val out = new java.util.ArrayList[Any]()
    val nPos = numChars - spanLen + 1
    var p = 0
    while (p < nPos) {
      md.update(bytes, off(p), off(p + anchorK) - off(p))
      md.digest(dig, 0, 16)
      if (AnchoredSpanDigests.leadingZeroNibbles(dig, anchorZeros)) {
        md.update(bytes, off(p), off(p + spanLen) - off(p))
        md.digest(dig, 0, 16)
        out.add(org.apache.spark.sql.catalyst.InternalRow(
          p + 1, UTF8String.fromString(AnchoredSpanDigests.hex(dig))))
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    spanPosDigests(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanPosDig", this, classOf[AnchoredSpanPosDigests].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.spanPosDigests($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AnchoredSpanPosDigests =
    copy(child = newChild)
}

object AnchoredSpanPosDigests {
  def anchoredSpanPosDigests(
      text: Column, spanLen: Int, anchorK: Int, anchorZeros: Int): Column =
    Bridge.column(
      AnchoredSpanPosDigests(Bridge.expression(text), spanLen, anchorK, anchorZeros))
}

object AnchoredSpanDigests {

  private final val HexChars = "0123456789abcdef".toCharArray

  private[functions] def leadingZeroNibbles(dig: Array[Byte], zeros: Int): Boolean = {
    var z = 0
    while (z < zeros) {
      val nib =
        if ((z & 1) == 0) (dig(z >> 1) >> 4) & 0xF else dig(z >> 1) & 0xF
      if (nib != 0) return false
      z += 1
    }
    true
  }

  private[functions] def hex(dig: Array[Byte]): String = {
    val cs = new Array[Char](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = HexChars((dig(i) >> 4) & 0xF)
      cs(2 * i + 1) = HexChars(dig(i) & 0xF)
      i += 1
    }
    new String(cs)
  }

  def anchoredSpanDigests(
      text: Column, spanLen: Int, anchorK: Int, anchorZeros: Int): Column =
    Bridge.column(
      AnchoredSpanDigests(Bridge.expression(text), spanLen, anchorK, anchorZeros))
}
