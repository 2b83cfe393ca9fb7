package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expressions for the similarity-search hot loop.
  *
  * The composable form (`zip_with` + `aggregate`) allocates an
  * intermediate array per row and evaluates a lambda per element; these
  * expressions generate a tight primitive loop inside whole-stage
  * codegen instead — the preferred extension mechanism when built-in
  * functions can't express the shape efficiently (custom `Expression`
  * with `doGenCode` beats a UDF). The sequential accumulation order
  * matches a left fold exactly, so results are bit-identical with the
  * composable form (and the DuckDB oracle).
  *
  * `array<float>` inputs are read NATIVELY (`getFloat` + an exact
  * float→double widening per element). The earlier design inserted
  * `Cast(array<float> → array<double>)` instead, which is correct but
  * a hot-loop trap: outside `ProjectExec` (generator inputs, join-side
  * projections) Spark performs no subexpression elimination, so a plan
  * with k dots against the same embedding column re-ran the cast — a
  * boxed 64-element array allocation — k times per row. Measured on the
  * SRP signature projection (64 dots/row, sf0.1): ~2× end-to-end.
  * Widening is exact, so results are unchanged vs the cast path.
  */
abstract class ArrayPairLoopExpression extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (Seq(left, right).forall(e => elemOk(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float|int|bigint> arguments " +
        s"(cast other element types explicitly), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Interpreted-mode element accessors resolved once per instance;
    * widening to double matches `Cast` exactly for every accepted type. */
  private def accessor(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
    case _ => (a, i) => a.getDouble(i)
  }
  @transient protected final lazy val getA: (ArrayData, Int) => Double =
    accessor(left.dataType)
  @transient protected final lazy val getB: (ArrayData, Int) => Double =
    accessor(right.dataType)

  /** Codegen element accessors: `(double) arr.getFloat(i)` etc. widen
    * exactly like the removed `Cast`. */
  private def genAccessor(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(IntegerType, _) => s"(double) $arr.getInt($i)"
    case ArrayType(LongType, _) => s"(double) $arr.getLong($i)"
    case _ => s"$arr.getDouble($i)"
  }
  protected final def genGetA(arr: String, i: String): String =
    genAccessor(left.dataType, arr, i)
  protected final def genGetB(arr: String, i: String): String =
    genAccessor(right.dataType, arr, i)

  /** Scalar kernel over the two arrays. */
  protected def combine(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any =
    combine(leftVal.asInstanceOf[ArrayData], rightVal.asInstanceOf[ArrayData])
}

/** `dot_product(array<double>, array<double>)` — Σ aᵢ·bᵢ over the common
  * prefix length. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends ArrayPairLoopExpression {

  override def prettyName: String = "dot_product"

  override protected def combine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var sum = 0.0
    while (i < n) { sum += getA(a, i) * getB(b, i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${genGetA(a, i)} * ${genGetB(b, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** `cosine_similarity(array<double>, array<double>)` — dot/(‖a‖·‖b‖) in
  * ONE pass over both arrays (the composable form scans each array
  * twice more for the norms). Zero-norm inputs yield NaN, matching the
  * arithmetic definition. */
case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends ArrayPairLoopExpression {

  override def prettyName: String = "cosine_similarity"

  override protected def combine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    while (i < n) {
      val x = getA(a, i); val y = getB(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genGetA(a, i)}; double $y = ${genGetB(b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL registration for the native expressions. */
/** `long_arrays_overlap(array<long>, array<long>)` — true iff the
  * arrays share an element. Built-in `arrays_overlap` builds a boxed
  * `HashSet` per EVALUATION — fine in a projection, pathological as a
  * join condition, where it runs once per candidate pair (the ANN
  * top-k prefilter: ~10⁵ allocations/s of pure GC churn, measured ~5×
  * the whole query). The LSH key arrays are tiny (numTables entries),
  * so a nested primitive loop with zero allocation wins at any size
  * that fits a join condition. */
case class LongArraysOverlap(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "long_arrays_overlap"

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint>, got ${l.simpleString} / ${r.simpleString}")
    }

  /** Public for the generated code. Null elements (possible only for
    * containsNull inputs) never match — same as arrays_overlap's
    * non-null semantics for the non-null elements; LSH keys are never
    * null. */
  def overlaps(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0
    while (i < na) {
      if (!a.isNullAt(i)) {
        val x = a.getLong(i)
        var j = 0
        while (j < nb) {
          if (!b.isNullAt(j) && b.getLong(j) == x) return true
          j += 1
        }
      }
      i += 1
    }
    false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    overlaps(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("overlap", this, classOf[LongArraysOverlap].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.overlaps($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArraysOverlap =
    copy(left = newLeft, right = newRight)
}

object functions {

  /** Extract a required int/long literal parameter from a SQL call. */
  private def foldableLong(e: Expression, fn: String, param: String): Long = e match {
    case lit if lit.foldable =>
      lit.eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"$fn: $param must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn: $param must be a literal")
  }
  private def foldableInt(e: Expression, fn: String, param: String): Int =
    foldableLong(e, fn, param).toInt

  // No eager Cast wrapping: the Column may be unresolved here (its type
  // unknown), and the expressions read float/int/long arrays natively —
  // an unconditional Cast(array<double>) re-ran per evaluation wherever
  // Spark does no subexpression elimination (generator inputs,
  // join-side projections). Non-numeric arrays fail analysis with the
  // expression's own type-check message.

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(ArrayCosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def longArraysOverlap(a: Column, b: Column): Column =
    Bridge.column(LongArraysOverlap(Bridge.expression(a), Bridge.expression(b)))

  private[graft] val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => ArrayDotProduct(es(0), es(1))),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => ArrayCosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es(0))),
    (FunctionIdentifier("xml_unescape"),
      new ExpressionInfo(classOf[XmlUnescape].getName, "xml_unescape"),
      (es: Seq[Expression]) => XmlUnescape(es(0))),
    // word_shingles(text, k) — k must be a foldable int literal
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), foldableInt(es(1), "word_shingles", "k"))),
    // tf_bucket(term, numFeatures) — HashingTF's exact feature index
    (FunctionIdentifier("tf_bucket"),
      new ExpressionInfo(classOf[TfBucket].getName, "tf_bucket"),
      (es: Seq[Expression]) => TfBucket(
        es(0), foldableInt(es(1), "tf_bucket", "numFeatures"))),
    // minhash_signature(shingles, numHashes) — numHashes foldable int
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(
        es(0), foldableInt(es(1), "minhash_signature", "numHashes"))),
    // srp_packed_bands(vec, seed, rowsPerBand, numBands) — literal params
    (FunctionIdentifier("srp_packed_bands"),
      new ExpressionInfo(classOf[SrpPackedBands].getName, "srp_packed_bands"),
      (es: Seq[Expression]) => SrpPackedBands(
        es(0),
        foldableLong(es(1), "srp_packed_bands", "seed"),
        foldableInt(es(2), "srp_packed_bands", "rowsPerBand"),
        foldableInt(es(3), "srp_packed_bands", "numBands"))),
    (FunctionIdentifier("entropy_features"),
      new ExpressionInfo(classOf[EntropyFeatures].getName, "entropy_features"),
      (es: Seq[Expression]) => EntropyFeatures(es(0))),
    // anchored_span_digests(text, spanLen, anchorK, anchorZeros) —
    // int params foldable
    (FunctionIdentifier("anchored_span_digests"),
      new ExpressionInfo(classOf[AnchoredSpanDigests].getName, "anchored_span_digests"),
      (es: Seq[Expression]) => AnchoredSpanDigests(
        es(0),
        foldableInt(es(1), "anchored_span_digests", "spanLen"),
        foldableInt(es(2), "anchored_span_digests", "anchorK"),
        foldableInt(es(3), "anchored_span_digests", "anchorZeros"))),
    (FunctionIdentifier("anchored_span_pos_digests"),
      new ExpressionInfo(classOf[AnchoredSpanPosDigests].getName, "anchored_span_pos_digests"),
      (es: Seq[Expression]) => AnchoredSpanPosDigests(
        es(0),
        foldableInt(es(1), "anchored_span_pos_digests", "spanLen"),
        foldableInt(es(2), "anchored_span_pos_digests", "anchorK"),
        foldableInt(es(3), "anchored_span_pos_digests", "anchorZeros"))),
    // winnow_fingerprints(text, k, w) — k and w must be foldable ints
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (es: Seq[Expression]) => WinnowFingerprints(
        es(0),
        foldableInt(es(1), "winnow_fingerprints", "k"),
        foldableInt(es(2), "winnow_fingerprints", "w"))),
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry in an AggregateExpression automatically
    (FunctionIdentifier("distinct_sketch"),
      new ExpressionInfo(classOf[DistinctLongSketch].getName, "distinct_sketch"),
      (es: Seq[Expression]) => DistinctLongSketch(es(0))),
    (FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllLongSketch].getName, "hll_sketch"),
      (es: Seq[Expression]) => HllLongSketch(es(0))),
    // freq_sketch(item, k) — Misra–Gries heavy hitters; k foldable
    (FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[MisraGriesSketch].getName, "freq_sketch"),
      (es: Seq[Expression]) => MisraGriesSketch(
        es(0), foldableInt(es(1), "freq_sketch", "k")))
  )

  /** Make the functions callable from SQL text in an existing session
    * (`SELECT cosine_similarity(a.embedding, b.embedding) ...`). For
    * cluster-wide installation use [[GraftSparkExtensions]] via
    * `spark.sql.extensions`. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, info, builder) =>
      Bridge.registerFunction(spark, name, info, builder)
    }
}

/** `SparkSessionExtensions` installer: pass
  * `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions` or
  * `SparkSession.builder.withExtensions(new GraftSparkExtensions)` to
  * get the SQL functions in every session. */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    functions.registry.foreach(ext.injectFunction)
    // Analysis-phase transparent cache substitution (gated by
    // spark.graft.autoSubstitute at runtime).
    ext.injectPostHocResolutionRule(session =>
      graft.plans.AutoSubstitute.SubstituteCachedPlans(session))
    // Custom whole-operator: grouped top-k (partial/final physical pair).
    ext.injectPlannerStrategy(_ => new graft.plans.GroupedTopKStrategy)
  }
}
