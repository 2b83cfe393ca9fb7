package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a text column in ONE pass — the native
  * form of the `split → slice/zip_with×(k−1) → filter → array_distinct`
  * chain in [[graft.operators.Shingles.wordShingles]].
  *
  * Semantics are BIT-IDENTICAL with that chain (spec-pinned):
  * single-space splitting with empty tokens preserved (so the DuckDB
  * oracle's `string_split(text, ' ')` tokenizes identically), shingles
  * joined with one space, first-occurrence order, texts with fewer than
  * k tokens yield an empty array.
  *
  * Why native: the composable chain materializes k+2 intermediate
  * arrays per row (token array, k−1 shifted zips, the filtered and
  * distinct copies), and the shingle set is re-evaluated once per USE —
  * both sides of the posting self-join plus the size projection in
  * every Jaccard-family operator. One tight loop over the raw
  * `UTF8String` bytes builds the deduped shingle array directly.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  /** One pass: tokenize on single spaces (empty tokens preserved, as
    * `split(text, " ")` does), emit each k-window joined by one space,
    * keep first occurrences. Public for the codegen reference call. */
  def shingles(text: UTF8String): ArrayData = {
    // Token boundaries over the raw string; split(" ") semantics keep
    // empty tokens, so boundaries are just the space positions.
    val s = text.toString
    val n = s.length
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val nTok = starts.length
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var t = 0
    while (t <= nTok - k) {
      // shingle = tokens t .. t+k-1 joined by ' ' — exactly the
      // substring from start(t) to the end of token t+k-1, because the
      // separators in between ARE single spaces.
      val from = starts(t)
      val until = if (t + k < nTok) starts(t + k) - 1 else n
      seen.add(s.substring(from, until))
      t += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  def wordShingles(text: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), k))
}
