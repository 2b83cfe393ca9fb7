package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain_long(key)` probe against a broadcast
  * [[BloomFilter]] — the scan-side prefilter of
  * [[graft.operators.BloomJoin]].
  *
  * This is the hot path the bloom join exists to optimize: the probe
  * runs once per row of the 100 TB side, BEFORE the exchange. A Scala
  * UDF here boxes every key (`Long` → `java.lang.Long`), goes through
  * the catalyst-to-Scala converter, and punches a hole in whole-stage
  * codegen — exactly the anti-pattern the rest of `graft.functions`
  * avoids. This expression instead generates a direct
  * `BloomFilter.mightContainLong(long)` call inside the produced Java,
  * so the pruned scan stage stays one codegen'd loop.
  *
  * The broadcast handle (not the filter bits) is serialized into the
  * task closure / codegen references, so executors fetch the filter
  * once per node via torrent broadcast — O(bits) per executor, never
  * per task.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain_long"

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The broadcast is a reference object: resolved once per generated
    // class instance, then a plain virtual call per row.
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val filter = ctx.addMutableState(
      classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $filter.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
