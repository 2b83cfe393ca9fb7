package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `numTables` euclidean-LSH bucket keys of a vector in ONE pass.
  * Each table's key combines `rowsPerTable` independent projections:
  * `key_t = mix(floor(dot(v̂, g_{t,0}) / w), …, floor(dot(v̂,
  * g_{t,r-1}) / w))` over the L2-normalized input `v̂ = vec/‖vec‖`
  * (normalized IN-PASS — see [[EuclidLshBuckets.buckets]]), with each
  * `g` a seeded unit-norm Gaussian plane
  * (the 2-stable projection of Datar/Immorlica/Indyk/Mirrokni,
  * SoCG'04). `rowsPerTable = 1` is exactly the single-projection family
  * spark.ml's `BucketedRandomProjectionLSH` implements; `rowsPerTable >
  * 1` AND-composes projections within a table (collide only if ALL r
  * floors match) — the amplification knob that makes the family
  * SELECTIVE in high dimension, where a single projection of a unit
  * vector has std ≈ 1/√dim and one floor at practical widths separates
  * almost nothing.
  *
  * Why an expression instead of spark.ml: the ml pipeline needs a
  * driver-side `fit()` job before any candidate is produced, converts
  * every row through the ml `Vector` UDT (an allocation + copy per
  * row, outside codegen), and scores candidates with a non-codegen UDF
  * distance. Here the planes are a pure function of `(seed, t, i)` —
  * nothing is fit, nothing is broadcast, and the projection is a
  * primitive loop inside whole-stage codegen. At 100 TB that removes an
  * entire pre-pass over the corpus.
  *
  * Gaussian element `i` of plane `t` is Box-Muller over two
  * `splitmix64` draws keyed on `(seed, t, i)`, computed with
  * `StrictMath` so the planes — and therefore every bucket id — are
  * bit-identical on any JVM/platform. Planes are materialized lazily
  * per observed `dim` and cached on the instance (equal-width vectors
  * are the column contract, matching [[SrpPackedBands]]).
  */
case class EuclidLshBuckets(
    child: Expression,
    seed: Long,
    numTables: Int,
    bucketLength: Double,
    rowsPerTable: Int = 1)
    extends UnaryExpression with Serializable {

  require(numTables >= 1, s"numTables must be positive, got $numTables")
  require(bucketLength > 0, s"bucketLength must be positive, got $bucketLength")
  require(rowsPerTable >= 1, s"rowsPerTable must be positive, got $rowsPerTable")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "euclid_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double> or array<float>, got ${other.simpleString}")
  }

  // lazy: the child may be unresolved while the analyzer maps over the tree
  private lazy val isFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  private val nPlanes = numTables * rowsPerTable

  // planes(p * dim + i) — built once per (instance, observed dim).
  // Tasks share the instance through the codegen reference array, so
  // publish (dim, array) as one volatile write; a duplicate build under
  // a race is benign (same values).
  @transient @volatile private var planesCache: (Int, Array[Double]) = _

  private def planesFor(dim: Int): Array[Double] = {
    val cached = planesCache
    if (cached != null && cached._1 == dim) return cached._2
    val p = new Array[Double](nPlanes * dim)
    var pl = 0
    while (pl < nPlanes) {
      var i = 0
      while (i < dim) {
        // Two independent uniforms in (0, 1] from disjoint splitmix64
        // streams; Box-Muller with StrictMath for cross-platform
        // bit-identical planes.
        val k = seed * 1000003L + pl.toLong * 524287L + i.toLong
        val u1 = (HllLongSketch.splitmix64(k) >>> 11).toDouble / (1L << 53).toDouble
        val u2 = (HllLongSketch.splitmix64(k + 0x9e3779b97f4a7c15L) >>> 11)
          .toDouble / (1L << 53).toDouble
        p(pl * dim + i) = StrictMath.sqrt(-2.0 * StrictMath.log(1.0 - u1)) *
          StrictMath.cos(2.0 * StrictMath.PI * u2)
        i += 1
      }
      // Normalize the plane to unit norm (spark.ml's BRP does the
      // same): the projection of a unit input then has std ≈ 1/√dim,
      // so a given `bucketLength` means the same granularity here as
      // it does there — callers' tuned (w, recall) carry over.
      var nrm = 0.0
      var j = pl * dim
      while (j < (pl + 1) * dim) { nrm += p(j) * p(j); j += 1 }
      nrm = StrictMath.sqrt(nrm)
      if (nrm > 0) {
        j = pl * dim
        while (j < (pl + 1) * dim) { p(j) /= nrm; j += 1 }
      }
      pl += 1
    }
    planesCache = (dim, p)
    p
  }

  /** All `numTables` bucket keys of `vec`, which is L2-NORMALIZED
    * in-pass (cosine LSH lives on the unit sphere; folding the
    * normalization in here keeps callers free of the interpreted
    * `transform(vd, x / nrm)` lambda, which Spark re-evaluates once per
    * OUTPUT row when the expression feeds a generator). A zero-norm
    * vector has no direction: it returns an EMPTY array, which
    * `posexplode` and any overlap check treat as "no buckets" — the
    * drop semantics every caller wants, with no nullability dance.
    * Public so the generated code can call it through an object
    * reference. */
  def buckets(vec: ArrayData): ArrayData = {
    val dim = vec.numElements()
    val p = planesFor(dim)
    var nrm2 = 0.0
    var v = 0
    while (v < dim) {
      val x = if (isFloat) vec.getFloat(v).toDouble else vec.getDouble(v)
      nrm2 += x * x
      v += 1
    }
    if (nrm2 == 0.0) return new GenericArrayData(Array.emptyLongArray)
    val invNrm = 1.0 / StrictMath.sqrt(nrm2)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      // AND-compose the table's rowsPerTable floors into one key.
      // splitmix64 is a 64-bit bijection, so at r = 1 keys collide
      // exactly when floors collide; at r > 1 the fold keys collide
      // (up to 2^-64 hash accidents) exactly when every floor matches.
      // Seeding the fold with the table index makes keys distinct
      // ACROSS tables too (floors-all-zero would otherwise produce one
      // shared key in every table), so a flat `arrays_overlap` over the
      // key array compares table t only against table t.
      var key = HllLongSketch.splitmix64(t + 1L)
      var j = 0
      while (j < rowsPerTable) {
        val base = (t * rowsPerTable + j) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          dot += x * p(base + i)
          i += 1
        }
        val f = StrictMath.floor(dot * invNrm / bucketLength).toLong
        key = HllLongSketch.splitmix64(key * 1000003L + f)
        j += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("euclidLsh", this, classOf[EuclidLshBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.buckets($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): EuclidLshBuckets =
    copy(child = newChild)
}

object EuclidLshBuckets {

  def euclidLshBuckets(
      vec: Column, seed: Long, numTables: Int, bucketLength: Double,
      rowsPerTable: Int = 1): Column =
    Bridge.column(EuclidLshBuckets(
      Bridge.expression(vec), seed, numTables, bucketLength, rowsPerTable))
}
