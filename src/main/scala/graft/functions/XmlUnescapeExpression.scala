package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `xml_unescape(string) -> string`: one-pass XML reference decoding —
  * the five predefined entities (`&amp;` `&lt;` `&gt;` `&quot;`
  * `&apos;`) PLUS numeric character references, decimal (`&#38;`) and
  * hex (`&#x26;` / `&#X26;`), which the sitemaps wild regularly emit
  * and the previous replace-chain form documented out.
  *
  * Semantics (each deliberate, all spec-pinned):
  *  - ONE left-to-right pass; decoded output is never rescanned —
  *    XML's no-recursive-expansion rule, exactly generalizing the old
  *    chain's "`&amp;` substitutes last": `&amp;lt;` -> `&lt;`
  *    literal, and consistently `&amp;#38;` -> `&#38;` literal. On
  *    inputs containing only the five named entities the output is
  *    byte-identical to the previous replace chain (no decoded char
  *    can complete a later entity, since only `&amp;` yields `&` and
  *    nothing rescans), so every existing oracle replay still holds.
  *  - Anything that fails to parse as a reference passes through
  *    VERBATIM — unknown names, unterminated refs, empty digits,
  *    code points that are 0, beyond U+10FFFF, or UTF-16 surrogates.
  *    Sitemap bodies are wild text; a decoder that throws (or eats
  *    bytes) on them turns one malformed loc into a lost wave. The
  *    reject set is deliberately NARROWER than XML 1.0's Char
  *    production: numeric references to C0/C1 controls (`&#1;`,
  *    `&#x8;`) DO decode — wild-sitemap leniency, not full XML
  *    validity (a validating parser would reject those documents
  *    outright; a crawler wants the URL anyway).
  *  - Astral code points decode to their surrogate pair (full
  *    U+10000..U+10FFFF range), so emoji-bearing URLs round-trip.
  *
  * ASCII-and-no-`&` fast path returns the input untouched (no copy) —
  * the overwhelmingly common sitemap loc. Codegen'd scalar (one static
  * call), stays inside whole-stage codegen like the rest of the
  * family. */
case class XmlUnescape(child: Expression) extends UnaryExpression {

  override def prettyName: String = "xml_unescape"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xml_unescape expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    XmlUnescape.unescape(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = XmlUnescape.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.unescape($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): XmlUnescape =
    copy(child = newChild)
}

object XmlUnescape {

  /** Decode one value. Fast path: no `&` byte at all — return the
    * input untouched (works for any UTF-8 content: `&` is 0x26 and
    * never a continuation byte). */
  def unescape(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var hasAmp = false
    while (i < n && !hasAmp) {
      if (s.getByte(i) == 0x26) hasAmp = true
      i += 1
    }
    if (!hasAmp) return s
    val str = s.toString
    val len = str.length
    val out = new java.lang.StringBuilder(len)
    var p = 0
    while (p < len) {
      val c = str.charAt(p)
      if (c != '&') { out.append(c); p += 1 }
      else {
        val end = decodeAt(str, p, out)
        if (end > p) p = end
        else { out.append('&'); p += 1 }
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** Try to decode a reference starting at `str(p) == '&'`; on success
    * append the decoded chars and return the index AFTER the `;`. On
    * any parse failure return `p` (caller passes the `&` through). */
  private def decodeAt(str: String, p: Int, out: java.lang.StringBuilder): Int = {
    val len = str.length
    if (p + 1 >= len) return p
    if (str.charAt(p + 1) == '#') {
      // numeric: &#DDD; or &#xHH; / &#XHH;. XML 1.0 allows arbitrary
      // leading zeros, so validity is judged by the decoded VALUE, not
      // a digit count: the accumulator clamps once past U+10FFFF
      // (staying invalid however many digits follow — no overflow),
      // which accepts `&#00000038;` while `&#99999999;` still passes
      // through verbatim.
      var q = p + 2
      val hex = q < len && (str.charAt(q) == 'x' || str.charAt(q) == 'X')
      if (hex) q += 1
      val digits0 = q
      var cp = 0L
      while (q < len && {
        val d = str.charAt(q)
        val v =
          if (d >= '0' && d <= '9') d - '0'
          else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
          else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
          else -1
        if (v >= 0) {
          cp = cp * (if (hex) 16 else 10) + v
          if (cp > 0x110000L) cp = 0x110001L
          true
        } else false
      }) q += 1
      if (q == digits0 || q >= len || str.charAt(q) != ';') return p
      if (cp <= 0 || cp > 0x10FFFF ||
        (cp >= 0xD800 && cp <= 0xDFFF)) return p
      out.appendCodePoint(cp.toInt)
      q + 1
    } else {
      // named: the five predefined entities only (XML defines no more)
      if (str.startsWith("amp;", p + 1)) { out.append('&'); p + 5 }
      else if (str.startsWith("lt;", p + 1)) { out.append('<'); p + 4 }
      else if (str.startsWith("gt;", p + 1)) { out.append('>'); p + 4 }
      else if (str.startsWith("quot;", p + 1)) { out.append('"'); p + 6 }
      else if (str.startsWith("apos;", p + 1)) { out.append('\''); p + 6 }
      else p
    }
  }

  /** Column-API entry point. */
  def xmlUnescape(text: Column): Column =
    Bridge.column(XmlUnescape(Bridge.expression(text)))
}
