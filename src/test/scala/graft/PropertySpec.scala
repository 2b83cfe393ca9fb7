package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure hashing/counting kernel (SURVEY §5:
  * property tests for hash determinism/sensitivity). The scalatest
  * interop artifact isn't in the offline cache, so generators are
  * sampled with fixed seeds — deterministic across runs. */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 100)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", StringType)))

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(8, Gen.zip(Gen.chooseNum(-1000, 1000), Gen.alphaNumStr))

  test("hashRows is deterministic and 32-hex") {
    forAll(rowsGen) { data =>
      val rows = data.map { case (a, b) => Row(a, b) }
      val h1 = DirectData.hashRows(rows, schema)
      val h2 = DirectData.hashRows(rows, schema)
      assert(h1 == h2)
      assert(h1.matches("[a-f0-9]{32}"))
    }
  }

  test("any single-cell perturbation changes the hash") {
    forAll(rowsGen, Gen.chooseNum(0, 7)) { (data, idx) =>
      whenever(data.nonEmpty) {
        val rows = data.map { case (a, b) => Row(a, b) }
        val i = idx % data.size
        val perturbed = rows.updated(i, Row(rows(i).getInt(0) + 1, rows(i).getString(1)))
        assert(DirectData.hashRows(rows, schema) !=
          DirectData.hashRows(perturbed, schema))
      }
    }
  }

  test("row order is part of the identity") {
    forAll(rowsGen) { data =>
      whenever(data.distinct.size > 1) {
        val rows = data.map { case (a, b) => Row(a, b) }
        val reversed = rows.reverse
        if (rows != reversed)
          assert(DirectData.hashRows(rows, schema) !=
            DirectData.hashRows(reversed, schema))
      }
    }
  }

  test("countOcc matches a sliding-window reference implementation") {
    val strGen = Gen.listOfN(30, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val subGen = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    forAll(strGen, subGen) { (s, sub) =>
      // Python str.count semantics: non-overlapping left-to-right
      var i = 0; var n = 0
      while ({ val j = s.indexOf(sub, i); if (j >= 0) { n += 1; i = j + sub.length }; j >= 0 }) ()
      assert(Complexity.countOcc(s, sub) == n)
    }
  }

  test("catalog-table pattern finds hashes only under the configured db") {
    val hexGen = Gen.listOfN(32, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    forAll(hexGen) { h =>
      val txt = s"Relation spark_catalog.cache_db.$h[x] parquet"
      assert(PlanFingerprint.findCatalogTablePattern(txt, "cache_db").contains(h))
      assert(PlanFingerprint.findCatalogTablePattern(txt, "other_db").isEmpty)
    }
  }

  test("blocked exact cosine equals the naive formulation on random frames") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    // Small random corpora including degenerate shapes: a zero vector
    // (NaN cosine — dropped by both forms), duplicate vectors (sim 1.0),
    // nBlocks larger than the corpus.
    val vecGen: Gen[List[List[Float]]] =
      Gen.listOfN(12, Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f)))
    forAll(vecGen, n = 10) { vecs =>
      whenever(vecs.nonEmpty) {
        val rows = (List.fill(8)(0.0f) :: vecs.head :: vecs)
          .zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val df = rows.toDF("vec_id", "embedding")
        def norm(c: org.apache.spark.sql.Column) = {
          val vd = c.cast("array<double>")
          sqrt(aggregate(transform(vd, x => x * x), lit(0.0), (a, x) => a + x))
        }
        val a = df.select(col("vec_id").as("id_a"), col("embedding").as("__va"),
          norm(col("embedding")).as("__na"))
        val b = df.select(col("vec_id").as("id_b"), col("embedding").as("__vb"),
          norm(col("embedding")).as("__nb"))
        // Zero-norm guard: under ANSI mode (Spark 4 default) the SQL
        // Divide throws DIVIDE_BY_ZERO; the non-ANSI/DuckDB value is
        // NaN, which the >= filter KEEPS (NaN orders above everything
        // in both engines) — produce that NaN explicitly.
        val denom = col("__na") * col("__nb")
        val naive = a.join(b, col("id_a") < col("id_b"))
          .withColumn("sim", round(
            when(denom === 0.0, lit(Double.NaN))
              .otherwise(graft.operators.Similarity.dot(
                col("__va"), col("__vb")) / denom), 6))
          .filter(col("sim") >= 0.3)
          .select("id_a", "id_b", "sim")
        for (nBlocks <- Seq(3, 64)) {
          val blocked = graft.operators.Dedup
            .exactCosinePairsBlocked(df, "vec_id", "embedding", 0.3, nBlocks)
          val onlyNaive = naive.exceptAll(blocked).collect().toSeq
          val onlyBlocked = blocked.exceptAll(naive).collect().toSeq
          assert(onlyNaive.isEmpty && onlyBlocked.isEmpty,
            s"mismatch at nBlocks=$nBlocks: naive-only=$onlyNaive " +
              s"blocked-only=$onlyBlocked corpus=${rows.map(_._2)}")
        }
      }
    }
  }

  test("sorted_array_contains equals array_contains on random sorted arrays") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val elemGen = Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    val caseGen = for {
      arr <- Gen.listOf(elemGen)
      probeMember <- Gen.oneOf(true, false)
      probe <- if (probeMember && arr.nonEmpty) Gen.oneOf(arr) else elemGen
    } yield (arr.distinct.sorted, probe)
    forAll(Gen.listOfN(40, caseGen), n = 5) { cases =>
      val df = cases.toDF("arr", "probe")
      val bad = df.select(
        graft.functions.SortedArrayContains
          .sortedContains(col("arr"), col("probe")).as("bs"),
        array_contains(col("arr"), col("probe")).as("lin"),
        col("arr"), col("probe"))
        .filter(col("bs") =!= col("lin"))
        .collect()
      assert(bad.isEmpty, s"binary search diverged: ${bad.toSeq}")
    }
  }

  test("nfc_normalize equals java.text.Normalizer and is idempotent on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      // combining acute/diaeresis, composed e-acute, plain e;
      // NFC also folds U+212B (angstrom sign) to U+00C5 (A-ring)
      1 -> Gen.oneOf('\u0301', '\u0308', '\u00e9', 'e'),
      1 -> Gen.oneOf('\u00c5', '\u212b', ' '))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    forAll(strGen) { s0 =>
      val once = graft.functions.NfcNormalize
        .normalize(UTF8String.fromString(s0)).toString
      assert(once == java.text.Normalizer
        .normalize(s0, java.text.Normalizer.Form.NFC))
      assert(graft.functions.NfcNormalize
        .normalize(UTF8String.fromString(once)).toString == once,
        s"not idempotent on: ${s0.map(_.toInt.toHexString)}")
    }
  }

  test("canonicalizeUrl is idempotent on random messy URLs") {
    // A canonical URL must re-canonicalize to ITSELF: a recrawl stores
    // canonical forms, and if canon(canon(u)) != canon(u) the same page
    // re-digests to a new key next wave and the dedup silently forks.
    val s = TestSpark.spark
    import org.apache.spark.sql.functions.col
    import graft.operators.Crawl
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.COM", "a.b.co.uk", "x1.example.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.listOfN(2, Gen.oneOf("A", "b9", "Cc", "index.html"))
      slash <- Gen.oneOf("", "/", "//")
      query <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&id=3", "?&&z=1")
      frag <- Gen.oneOf("", "#frag", "#a/b?c")
    } yield s"$scheme://$www$host$port/${segs.mkString("/")}$slash$query$frag"
    val urls = scala.collection.mutable.ListBuffer.empty[String]
    forAll(urlGen, n = 120)(urls += _)
    val sess = s
    import sess.implicits._
    val once = urls.toSeq.toDF("u")
      .select(Crawl.canonicalizeUrl(col("u")).as("c"))
    val twice = once.select(col("c").as("orig"),
      Crawl.canonicalizeUrl(col("c")).as("again"))
    val diff = twice.filter(col("orig") =!= col("again")).collect()
    assert(diff.isEmpty,
      s"non-idempotent canonicalizations: ${diff.take(5).mkString("; ")}")
  }

  test("urlTemplateReport template extraction is idempotent and digit-free") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    val gen: Gen[String] = Gen.listOfN(3,
      Gen.oneOf("cal", "2026", "p7x", "99", "item")).map("/" + _.mkString("/"))
    val paths = scala.collection.mutable.ListBuffer.empty[String]
    forAll(gen, n = 80)(paths += _)
    val sess = s
    import sess.implicits._
    val t = paths.toSeq.toDF("p")
      .select(regexp_replace(col("p"), "[0-9]+", "N").as("t"))
    val bad = t.filter(col("t").rlike("[0-9]") ||
        regexp_replace(col("t"), "[0-9]+", "N") =!= col("t")).collect()
    assert(bad.isEmpty, s"templates must be digit-free fixpoints: ${bad.take(5).mkString(";")}")
  }

  test("stripMarkup on tag- and entity-free text is exactly whitespace normalization") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))
    // Random runs of spaces/tabs/newlines between tokens.
    val sepGen = Gen.nonEmptyListOf(Gen.oneOf(' ', ' ', '\t', '\n')).map(_.mkString.take(3))
    val textGen = for {
      toks <- Gen.listOf(tokenGen)
      seps <- Gen.listOfN(toks.length, sepGen)
    } yield toks.zip(seps).map { case (t, sp) => t + sp }.mkString
    forAll(Gen.listOfN(15, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      val bad = df
        .select(col("text"),
          operators.TextAnalysis.stripMarkup(col("text")).as("out"))
        .collect()
        .filter(r => r.getString(1) !=
          r.getString(0).replaceAll("\\s+", " ").trim)
      assert(bad.isEmpty, s"markup strip changed clean text: ${bad.toSeq}")
    }
  }

  test("lineDedup with maxDf >= corpus size is the identity") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(5))
    val lineGen = Gen.nonEmptyListOf(tokenGen).map(_.mkString(" "))
    val docGen = Gen.nonEmptyListOf(lineGen).map(_.mkString("\n"))
    forAll(Gen.listOfN(10, docGen), n = 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // No line can exceed a df of texts.size, so nothing is hot.
      val out = operators.SubstringDedup
        .lineDedup(df, "doc_id", "text", maxDf = texts.size)
        .join(df, "doc_id")
        .filter(col("text_dedup") =!= col("text") ||
          col("n_kept") =!= col("n_lines"))
        .count()
      assert(out == 0, s"identity violated on: $texts")
    }
  }

  test("wordChunks round-trips: rejoined chunks reproduce the text exactly") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    // Includes empty tokens (runs of spaces) — array_join restores the
    // original spacing, so chunking must lose nothing at any width.
    val tokenGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(4)), Gen.const(""))
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    forAll(Gen.listOfN(20, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      for (w <- Seq(1, 2, 3, 7)) {
        val bad = df.select(col("text"),
          array_join(operators.SubstringDedup.wordChunks(col("text"), w), " ")
            .as("rt"))
          .filter(col("rt") =!= col("text")).count()
        assert(bad == 0, s"w=$w chunking lost content on: $texts")
      }
    }
  }

  test("native entropy_features equals the fold chain on random spaced text") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val tokenGen = Gen.oneOf(Gen.oneOf("a", "b", "cc", "ddd"),
      Gen.alphaNumStr.map(_.take(4)), Gen.const(""))
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    forAll(Gen.listOfN(25, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      val nat = operators.TextAnalysis.entropyFeatures(col("text"))
      val ch = operators.TextAnalysis.entropyFeaturesChain(col("text"))
      val bad = df.select(
        struct(nat: _*).as("a"), struct(ch: _*).as("b"), col("text"))
        .filter(not(col("a") === col("b")))
      assert(bad.count() == 0,
        s"diverged on: ${bad.collect().take(3).mkString(";")}")
    }
  }

  test("entropy is permutation-invariant and bounded by log2(n_unique)") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val tokenGen = Gen.oneOf("a", "b", "c", "dd", "ee")
    val textGen = Gen.nonEmptyListOf(tokenGen).map(_.mkString(" "))
    forAll(Gen.listOfN(20, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      def entCols(c: org.apache.spark.sql.Column) =
        operators.TextAnalysis.entropyFeatures(c)
      val out = df.select(
        entCols(col("text"))(2).as("h"),
        entCols(array_join(reverse(split(col("text"), " ")), " "))(2)
          .as("h_rev"),
        entCols(col("text"))(1).as("u"))
      assert(out.filter(col("h") =!= col("h_rev")).count() == 0,
        "entropy must not depend on word order")
      // rounded to 6 dp, so the log2 bound gets the half-ulp 5e-7
      assert(out.filter(col("h") > log2(col("u")) + lit(5e-7)).count() == 0,
        "H <= log2(distinct words)")
      assert(out.filter(col("h") < 0).count() == 0)
    }
  }

  test("native winnow_fingerprints equals the composable chain on random spaced text") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val tokenGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(4)), Gen.const(""))
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    forAll(Gen.listOfN(20, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      for ((k, w) <- Seq((1, 1), (2, 3), (3, 4), (5, 2))) {
        val diff = df
          .select(col("text"),
            operators.TextAnalysis.shingleHashes(col("text"), k).as("__h"))
          .select(
            sort_array(operators.TextAnalysis
              .winnowFingerprintsChain(col("__h"), w)).as("a"),
            sort_array(graft.functions.WinnowFingerprints
              .winnowFingerprints(col("text"), k, w)).as("b"))
          .filter(not(col("a") === col("b"))).count()
        assert(diff == 0, s"k=$k w=$w diverged on: $texts")
      }
    }
  }

  test("native word_shingles equals the composable chain on random spaced text") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    // Texts with runs of spaces, empty tokens, and short inputs — the
    // exact edge population where substring-based shingling could
    // diverge from split/zip_with/concat.
    val tokenGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(4)), Gen.const(""))
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    forAll(Gen.listOfN(20, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      for (k <- Seq(1, 2, 3, 5)) {
        val diff = df.select(
          array_distinct(operators.Shingles.wordShinglesAll(col("text"), k)).as("a"),
          graft.functions.WordShingles.wordShingles(col("text"), k).as("b"))
          .filter(not(col("a") === col("b"))).count()
        assert(diff == 0, s"k=$k diverged on: $texts")
      }
    }
  }

  test("native gopher_repetition equals the sorted-fold chain on random text") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    // Small alphabet forces heavy gram repetition; empties + unicode in
    // the mix exercise the tokenizer edge paths.
    val tokenGen = Gen.oneOf(
      Gen.oneOf("a", "b", "ab", "αβ", "𝕏"), Gen.const(""),
      Gen.alphaNumStr.map(_.take(3)))
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    forAll(Gen.listOfN(20, textGen), n = 10) { texts =>
      val df = texts.toDF("text")
      for (k <- Seq(1, 2, 3, 5)) {
        val diff = df.select(
          struct(operators.TextAnalysis.gopherRepetition(col("text"), k): _*)
            .as("a"),
          struct(operators.TextAnalysis.gopherRepetitionChain(col("text"), k): _*)
            .as("b"))
          .filter(not(col("a") === col("b"))).count()
        assert(diff == 0, s"k=$k diverged on: $texts")
      }
    }
  }

  test("native centroid_argmin equals the least-struct chain on random vectors") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    forAll(Gen.zip(
      Gen.listOfN(12, vecGen),
      Gen.listOfN(4, vecGen)), n = 10) { case (vecs, cents) =>
      // Duplicate a centroid so the tie path is always exercised.
      val centroids: Array[Seq[Double]] =
        (cents :+ cents.head).map(_.toSeq: Seq[Double]).toArray
      val df = vecs.map(v => Tuple1(v.toArray)).toDF("__v")
        .select(col("__v").cast("array<double>").as("__v"))
      val diff = df.select(
        graft.functions.CentroidArgmin.argmin(
          col("__v"), centroids.map(_.toArray)).as("a"),
        operators.Clustering.chainBest(col("__v"), centroids).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(diff == 0)
    }
  }

  test("deflate_stats is deterministic and monotone under concatenation") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    import s.implicits._
    val textGen = Gen.listOf(
      Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const("spam")))
      .map(_.mkString(" "))
    forAll(Gen.listOfN(15, textGen), n = 8) { texts =>
      val df = texts.filter(_.nonEmpty).toDF("text")
      if (df.count() > 0) {
        val sig = operators.TextAnalysis.compressionSignals(col("text"))
        val sig2 = operators.TextAnalysis
          .compressionSignals(concat(col("text"), col("text")))
        val rows = df.select(
          sig(1).as("z1"), sig2(1).as("z2"),
          operators.TextAnalysis.compressionSignals(col("text"))(1)
            .as("z1b"))
          .collect()
        rows.foreach { r =>
          assert(r.getLong(0) == r.getLong(2), "re-evaluation determinism")
          assert(r.getLong(1) < 2 * r.getLong(0) + 16,
            "doubling must be sub-additive (modulo header slack)")
        }
      }
    }
  }
}
