package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: codegen and interpreted paths, SQL
  * registration, implicit float→double casting. */
class NativeFunctionsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(3.0f, 4.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f, 1.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b")
  }

  test("dot_product: codegen path computes Σ a_i b_i with float cast") {
    val out = vecs
      .select(col("id"), graft.functions.functions.dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 * 3.0 + 0.0 * 4.0 + 2.0 * 0.5)
    assert(out(3L) == 3.0)
  }

  test("cosine_similarity matches the composable zip_with/aggregate form bit-for-bit") {
    val composable = {
      val ad = col("a").cast("array<double>")
      val bd = col("b").cast("array<double>")
      def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
      d(ad, bd) / (sqrt(d(ad, ad)) * sqrt(d(bd, bd)))
    }
    // row 2 has a zero vector: the composable form raises DIVIDE_BY_ZERO
    // under ANSI mode, the native expression yields NaN — compare the
    // well-defined rows bit-for-bit.
    val rows = vecs.filter(col("id") =!= 2L).select(
      graft.functions.functions.cosineSimilarity(col("a"), col("b")).as("native"),
      composable.as("ref"))
      .collect()
    rows.foreach { r =>
      val (n, ref) = (r.getDouble(0), r.getDouble(1))
      assert(n == ref || (n.isNaN && ref.isNaN), s"native=$n ref=$ref")
    }
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    val s = spark
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val out = vecs
        .select(graft.functions.functions.cosineSimilarity(col("a"), col("b")).as("c"))
        .collect().map(_.getDouble(0))
      // 3/(sqrt(3)*sqrt(3)) lands one ulp above 1.0 — that IS the
      // defined arithmetic, not an error.
      assert(math.abs(out(2) - 1.0) < 1e-12,
        "identical vectors => cosine ~1.0 (interpreted)")
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SQL registration makes functions callable from SQL text") {
    graft.functions.functions.register(spark)
    vecs.createOrReplaceTempView("native_vecs")
    val out = spark
      .sql("SELECT id, dot_product(a, b) d, cosine_similarity(a, a) c FROM native_vecs")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4.0)
    assert(math.abs(out(3L)._2 - 1.0) < 1e-12)
  }

  test("simhash64 expression matches the aggregation formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely here now")
    ).toDF("id", "text")
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    // reference: the explode + groupBy + 64-sums pipeline it replaced
    val tok = docs.select(col("id"), explode(toks).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i"))
    val sigExpr = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val viaAgg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), sigExpr.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docs.select(col("id"),
      graft.functions.SimHash64.simHash64(toks).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
    // and the plan is shuffle-free
    val plan = docs.select(graft.functions.SimHash64.simHash64(toks))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash must not shuffle:\n$plan")
  }

  test("null array yields null, zero norm yields NaN") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(graft.functions.functions.dotProduct(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
    val z = vecs.filter(col("id") === 2L)
      .select(graft.functions.functions.cosineSimilarity(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(z.isNaN)
  }

  test("srp_packed_bands is bit-identical with the 64-separate-dots formulation") {
    val s = spark
    import s.implicits._
    val seed = 42L; val r = 4; val b = 16; val dim = 8
    // random-ish deterministic float vectors
    val rows = (0 until 50).map { id =>
      (id.toLong, Array.tabulate(dim)(i =>
        (graft.functions.HllLongSketch.splitmix64(id * 97L + i) % 1000L).toFloat / 250.0f))
    }
    val df = rows.toDF("id", "v")
    // reference: the literal-plane dot formulation srpCosinePairs used
    // before packing (plane p element i sign from the same splitmix64)
    val planes = (0 until r * b).map { p =>
      Array.tabulate(dim) { i =>
        if (graft.functions.HllLongSketch.splitmix64(
          seed * 1000003L + p.toLong * 131071L + i.toLong) < 0) -1.0 else 1.0
      }
    }
    val expected = rows.map { case (id, v) =>
      var packed = 0L
      planes.zipWithIndex.foreach { case (pl, p) =>
        var dot = 0.0; var i = 0
        while (i < dim) { dot += pl(i) * v(i).toDouble; i += 1 }
        if (dot > 0) packed |= 1L << p
      }
      id -> packed
    }.toMap
    val got = df.select(col("id"),
      graft.functions.SrpPackedBands.srpPackedBands(col("v"), seed, r, b).as("p"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == expected, "packed bits must match the plane-dot reference exactly")
    // double input takes the non-float accessor path — same bits
    val gotD = df.select(col("id"),
      graft.functions.SrpPackedBands
        .srpPackedBands(col("v").cast("array<double>"), seed, r, b).as("p"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(gotD == expected)
  }

  test("word_shingles is bit-identical with the composable chain on testdata and edges") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      "", " ", "  ", "one", "one two", "one two three",
      "one two three four", "a  b c", " leading", "trailing ",
      "x x x x", "a b a b a b"
    ).toDF("text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text")
    for (df <- Seq(edges, real); k <- Seq(1, 2, 3)) {
      val chain = array_distinct(operators.Shingles.wordShinglesAll(col("text"), k))
      val native = graft.functions.WordShingles.wordShingles(col("text"), k)
      val diff = df.select(chain.as("a"), native.as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(diff == 0, s"k=$k: native shingles diverge from the chain")
    }
  }

  test("word_shingles and srp_packed_bands are callable from SQL") {
    val s = spark
    import s.implicits._
    graft.functions.functions.register(s)
    Seq(("a b c d", Array(1.0f, -2.0f))).toDF("text", "vec")
      .createOrReplaceTempView("sql_reg_probe")
    val r = s.sql(
      """SELECT word_shingles(text, 3) AS sh,
        |       srp_packed_bands(vec, 42L, 4, 16) AS p
        |FROM sql_reg_probe""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // same packed value as the Column API
    val viaCol = Seq(Array(1.0f, -2.0f)).toDF("vec")
      .select(graft.functions.SrpPackedBands.srpPackedBands(col("vec"), 42L, 4, 16))
      .collect().head.getLong(0)
    assert(r.getLong(1) == viaCol)
  }

  test("minhash_signature is callable from SQL and matches the Column API") {
    val s = spark
    import s.implicits._
    graft.functions.functions.register(s)
    Seq(("a b c d e", 0L)).toDF("text", "ignore")
      .createOrReplaceTempView("sql_minhash_probe")
    val viaSql = s.sql(
      """SELECT minhash_signature(word_shingles(text, 3), 8) AS sig
        |FROM sql_minhash_probe""".stripMargin)
      .collect().head.getSeq[Long](0)
    val viaCol = Seq("a b c d e").toDF("text")
      .select(graft.functions.MinHashSignature.minHashSignature(
        graft.functions.WordShingles.wordShingles(col("text"), 3), 8).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 8)
  }

  test("deflate_stats: repetition compresses, ratio band holds, deterministic") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      (1L, "spam " * 200),
      (2L, (0 until 200).map(i => (i * 2654435761L % 9973).toString).mkString(" ")),
      (3L, "x"),
      (4L, "")
    ).toDF("id", "text")
    val out = texts.select(
      col("id") +: graft.operators.TextAnalysis.compressionSignals(col("text")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // repetitive text compresses far better than pseudo-random digits
    assert(out(1L)._3 < 0.1, s"spam ratio ${out(1L)._3}")
    assert(out(2L)._3 > 0.4, s"digits ratio ${out(2L)._3}")
    // raw byte counts are exact UTF-8 lengths
    assert(out(1L)._1 == 1000L && out(3L)._1 == 1L && out(4L)._1 == 0L)
    // zero-length text: ratio defined as 0
    assert(out(4L)._3 == 0.0)
    // deterministic across partitionings
    val again = texts.repartition(5).select(
      col("id") +: graft.operators.TextAnalysis.compressionSignals(col("text")): _*)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out.map { case (k, v) => k -> v._2 })
  }

  test("nfc_normalize: composes decomposed marks, ASCII fast path, SQL-callable") {
    val s = spark
    import s.implicits._
    val decomposed = "caf" + "e\u0301"            // e + combining acute
    val composed = "caf\u00e9"                    // precomposed e-acute
    val ligature = "\ufb01le"                     // NFC leaves compatibility ligatures
    val rows = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"),
      (4L, ligature), (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = rows
      .select(col("id"), graft.functions.NfcNormalize.nfc(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == composed, "decomposed sequence must compose")
    assert(out(2L) == composed, "already-NFC input is unchanged")
    assert(out(3L) == "plain ascii")
    assert(out(4L) == ligature, "NFC must not fold compatibility ligatures")
    assert(out(5L) == null, "null propagates")
    // Interpreted object path is bit-identical to the codegen'd one.
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.NfcNormalize
      .normalize(UTF8String.fromString(decomposed)).toString == composed)
    val ascii = UTF8String.fromString("abc")
    assert(graft.functions.NfcNormalize.normalize(ascii) eq ascii,
      "ASCII fast path must return the input instance untouched")
    // Idempotent, and callable from SQL via the extension registry.
    graft.functions.functions.register(spark)
    val sqlOut = spark.sql(
      s"SELECT nfc_normalize(nfc_normalize('$decomposed'))").collect()(0).getString(0)
    assert(sqlOut == composed)
  }

  test("dot_product reads array<float> natively without a cast in the plan") {
    val df = vecs.select(
      graft.functions.functions.dotProduct(col("a"), col("b")).as("d"))
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("cast(a"),
      s"float input must not be wrapped in a cast:\n$analyzed")
    // and the value still widens exactly
    assert(df.collect().map(_.getDouble(0)).sorted.last == 4.0)
  }
}
