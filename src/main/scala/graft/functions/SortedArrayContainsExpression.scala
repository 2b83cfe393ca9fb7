package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sorted_array_contains(sorted_arr, key) -> boolean`: membership in
  * an array<string> the CALLER guarantees is sorted in Spark's binary
  * string order (`sort_array` produces exactly that), by binary search
  * — O(log n) per probe where `array_contains` walks all n elements.
  *
  * This is the probe half of the broadcast-hot-set pattern
  * ([[graft.operators.SubstringDedup.lineDedup]]): the hot set rides
  * in as a one-row `sort_array(collect_set(...))` broadcast and every
  * corpus line probes it — a 10× scaling probe measured the linear
  * `array_contains` walk turning a boilerplate-heavy corpus
  * super-linear (23× wall at 10× input; log-probe restores ~linear).
  * Behavior is EXACTLY `array_contains` on the sorted input
  * (spec-pinned); an unsorted array is the caller's bug and returns
  * arbitrary results, the same contract as every binary search.
  * NULL array or key yields NULL; null ELEMENTS are not supported
  * (the dedup hot sets are md5 digests — never null). */
case class SortedArrayContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_array_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(arr: Any, key: Any): Any =
    SortedArrayContains.search(
      arr.asInstanceOf[ArrayData], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = SortedArrayContains.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, k) => s"${ev.value} = $obj.search($a, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayContains =
    copy(left = newLeft, right = newRight)
}

object SortedArrayContains {

  /** Binary search over Spark's binary string order (what `sort_array`
    * emits). Public for the codegen reference call. */
  def search(arr: ArrayData, key: UTF8String): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = arr.getUTF8String(mid).compareTo(key)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Column-API entry point. */
  def sortedContains(sortedArr: Column, key: Column): Column =
    Bridge.column(SortedArrayContains(
      Bridge.expression(sortedArr), Bridge.expression(key)))
}
