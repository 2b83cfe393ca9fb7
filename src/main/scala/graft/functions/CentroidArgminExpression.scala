package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Nearest-centroid assignment `(d, c)` in one native pass: squared-L2
  * against every centroid of a driver-side table, strict-`<` argmin so
  * ties keep the LOWEST cluster index — the fused form of
  * `Clustering.lloyd`'s `least(struct(dist2_fold, c)…)` chain, which
  * pays interpreted lambda evaluation per element per centroid (k·d
  * interpreted steps per row; at k=1000 coarse cells that constant
  * factor IS the assignment cost).
  *
  * Bit-parity contract (spec-pinned against the chain): each distance
  * accumulates `(v_i − c_i)²` left-to-right from a 0.0 seed — the
  * identical IEEE sequence as the `aggregate(zip_with(...))` fold —
  * and the comparison is strict `<` over centroids in ascending index
  * order, exactly `least`'s lexicographic (d, c) minimum. */
case class CentroidArgmin(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {

  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def prettyName: String = "centroid_argmin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  /** Public for the codegen reference call. */
  def compute(arr: ArrayData): InternalRow = {
    val v = arr.toDoubleArray()
    var bestD = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      // Spec-pinned truncation to the shorter length — identical to
      // the zip_with(slice, ...) distance chain this expression fuses
      // (zip_with pads the shorter side with NULLs; the chain slices
      // both to the common prefix). Ragged input is the caller's bug;
      // truncating keeps approximate and exact paths bit-identical.
      val n = math.min(v.length, cen.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val t = v(i) - cen(i)
        s += t * t
        i += 1
      }
      if (s < bestD) { bestD = s; bestC = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centArg", this, classOf[CentroidArgmin].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmin =
    copy(child = newChild)
}

object CentroidArgmin {

  def argmin(vec: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(CentroidArgmin(Bridge.expression(vec), centroids))
}
