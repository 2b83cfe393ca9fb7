package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** `tf_bucket(term) -> int`: the exact feature index
  * `org.apache.spark.ml.feature.HashingTF` assigns a term —
  * `nonNegativeMod(Murmur3_x86_32.hashUnsafeBytes2(utf8, seed=42),
  * numFeatures)`.
  *
  * NOT the same value as SQL `hash()`: HashingTF hashes through the
  * `hashUnsafeBytes2` block variant (4-byte blocks + byte tail folded
  * differently), so `pmod(hash(t), n)` lands in different buckets.
  * This expression exists so a model fit through HashingTF can be
  * SCORED by a pure codegen'd projection ([[graft.operators
  * .QualityModel.scoreColumn]]) that is bit-compatible with what
  * `model.transform` would compute — spark.ml's transform routes every
  * row through a scala UDF, a codegen barrier the 100 TB scoring pass
  * doesn't need.
  */
case class TfBucket(child: Expression, numFeatures: Int)
    extends UnaryExpression {

  require(numFeatures > 0, "numFeatures must be positive")
  private val Seed = 42

  override def prettyName: String = "tf_bucket"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tf_bucket expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val h = Murmur3_x86_32.hashUnsafeBytes2(
      s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    ((h % numFeatures) + numFeatures) % numFeatures
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val h = ctx.freshName("h")
      val m3 = classOf[Murmur3_x86_32].getName
      s"""
         |int $h = $m3.hashUnsafeBytes2(
         |  $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), $Seed);
         |${ev.value} = (($h % $numFeatures) + $numFeatures) % $numFeatures;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfBucket =
    copy(child = newChild)
}

object TfBucket {
  /** Column-API entry point. */
  def tfBucket(term: Column, numFeatures: Int): Column =
    Bridge.column(TfBucket(Bridge.expression(term), numFeatures))
}
