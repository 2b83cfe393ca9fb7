package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(string) -> string`: Unicode NFC (canonical
  * composition) of a string — the normalization pass a crawl pipeline
  * runs before anything hashes text (CCNet/Gopher-style cleanup): a
  * decomposed "é" and a composed "é" are the SAME text to a
  * reader but different bytes to every digest, shingle, and dedup
  * operator in this library, so un-normalized crawl text silently
  * under-deduplicates.
  *
  * Spark has no built-in normalization function; this is a codegen'd
  * scalar expression over `java.text.Normalizer` with an ASCII fast
  * path: web corpora are overwhelmingly ASCII-heavy, and an
  * all-ASCII value (one branchless byte scan) is returned AS-IS —
  * no String materialization, no Normalizer call, no allocation.
  * NFC specifically (not NFKC): canonical composition is
  * round-trip-safe and engine-portable (DuckDB's `nfc_normalize`
  * replays it exactly, which is what makes the corpus query
  * oracle-checkable); compatibility folding (ligatures, width) is a
  * lossy policy decision left to the caller.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize one value. ASCII fast path first: UTF-8 bytes are
    * all < 0x80 iff the string is pure ASCII, which is always in NFC —
    * return the input UNTOUCHED (no copy). Non-ASCII values take the
    * `isNormalized` probe (scan, no allocation) before paying for the
    * actual composition. */
  def normalize(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes()
    var nonAscii = false
    while (i < n && !nonAscii) {
      if ((s.getByte(i) & 0x80) != 0) nonAscii = true
      i += 1
    }
    if (!nonAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
