package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `numBands × rowsPerBand` signed-random-projection sign bits of an
  * embedding, packed into ONE long (so `rowsPerBand · numBands ≤ 64`).
  *
  * Bit `band·rowsPerBand + j` is set iff `dot(vec, plane_{band·r+j}) > 0`,
  * with plane element `i` of plane `p` = ±1 from
  * `splitmix64(seed·1000003 + p·131071 + i)` — exactly the literal-plane
  * formulation [[graft.operators.Similarity.srpCosinePairs]] used as 64
  * separate `dot_product` expressions. Element access and accumulation
  * order are identical (left fold over `i`, float widened exactly), so
  * the packed bits are bit-identical with the old band values.
  *
  * Why one expression instead of 64 dots + `posexplode(array(...))`:
  * Spark collapses the signature projection INTO the generator, and
  * generator inputs get no subexpression elimination — the 64 dots (and
  * under the old cast design, 64 float→double array casts) were
  * re-evaluated once per OUTPUT row, a 16× write-off. One packed long
  * makes the generator input a single cheap column; the per-output-row
  * band extraction is two bit ops. One pass also skips the ±1
  * multiplication: the plane sign just selects add or subtract.
  *
  * The signs matrix is materialized lazily per (dim) on first eval and
  * cached on the instance — planes are a deterministic function of
  * (seed, p, i), never shipped as literals, so the codegen'd class
  * stays tiny (a single static-call site via `addReferenceObj`).
  */
case class SrpPackedBands(
    child: Expression,
    seed: Long,
    rowsPerBand: Int,
    numBands: Int)
    extends UnaryExpression with Serializable {

  require(rowsPerBand >= 1 && numBands >= 1 && rowsPerBand * numBands <= 64,
    s"rowsPerBand*numBands must fit one long, got $rowsPerBand x $numBands")

  override def dataType: DataType = LongType

  override def prettyName: String = "srp_packed_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double> or array<float>, got ${other.simpleString}")
  }

  // lazy: the child may be unresolved while the analyzer maps over the tree
  private lazy val isFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  private val nPlanes = rowsPerBand * numBands

  // signs(p * dim + i) — built once per (instance, observed dim). The
  // contract (shared with srpCosinePairs) is equal-width vectors, so one
  // dim serves the whole column. Tasks share the instance through the
  // codegen reference array, so publish (dim, array) as one volatile
  // write; a duplicate build under a race is benign (same values).
  @transient @volatile private var signsCache: (Int, Array[Byte]) = _

  private def signsFor(dim: Int): Array[Byte] = {
    val cached = signsCache
    if (cached != null && cached._1 == dim) return cached._2
    val s = new Array[Byte](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var i = 0
      while (i < dim) {
        val h = HllLongSketch.splitmix64(seed * 1000003L + p.toLong * 131071L + i.toLong)
        s(p * dim + i) = if (h < 0) -1 else 1
        i += 1
      }
      p += 1
    }
    signsCache = (dim, s)
    s
  }

  /** One pass: all `nPlanes` sign dots of `vec`, packed. Public so the
    * generated code can call it through an object reference. */
  def packBands(vec: ArrayData): Long = {
    val dim = vec.numElements()
    val s = signsFor(dim)
    var packed = 0L
    var p = 0
    while (p < nPlanes) {
      val base = p * dim
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        if (s(base + i) < 0) dot -= x else dot += x
        i += 1
      }
      if (dot > 0) packed |= 1L << p
      p += 1
    }
    packed
  }

  override def nullSafeEval(input: Any): Any =
    packBands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpBands", this, classOf[SrpPackedBands].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.packBands($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpPackedBands =
    copy(child = newChild)
}

object SrpPackedBands {

  def srpPackedBands(
      vec: Column, seed: Long, rowsPerBand: Int, numBands: Int): Column =
    Bridge.column(SrpPackedBands(Bridge.expression(vec), seed, rowsPerBand, numBands))
}
