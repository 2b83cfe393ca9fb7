package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SubstringDedup, TextAnalysis}

/** Chunked exact-substring dedup (within-doc and corpus-wide) and the
  * row-local word-entropy quality score. */
class SubstringDedupSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("wordChunks slices aligned w-word chunks with a short tail") {
    val s = spark
    import s.implicits._
    val out = Seq("a b c d e").toDF("text")
      .select(SubstringDedup.wordChunks(col("text"), 2).as("c"))
      .as[Seq[String]].head()
    assert(out == Seq("a b", "c d", "e"))
  }

  test("dedupChunksWithinDoc keeps first occurrences in order") {
    val s = spark
    import s.implicits._
    val out = SubstringDedup.dedupChunksWithinDoc(
      Seq((1L, "a b a b c d a b")).toDF("doc_id", "text"),
      "doc_id", "text", w = 2).collect().head
    assert(out.getLong(1) == 4L, "n_chunks")
    assert(out.getLong(2) == 2L, "n_kept")
    assert(out.getString(3) == "a b c d")
  }

  test("chunkDedupGlobal: first (doc_id, idx) occurrence wins; empty docs survive") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d"), // owns both chunks
      (2L, "a b x y"), // loses "a b" to doc 1
      (3L, "c d a b")  // loses everything -> empty text, still present
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .chunkDedupGlobal(docs, "doc_id", "text", w = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out(1L) == ((2L, "a b c d")))
    assert(out(2L) == ((1L, "x y")))
    assert(out(3L) == ((0L, "")))
  }

  // Independent Scala-side replay of the anchored-span contract:
  // positions are 1-based, an anchor is a position whose 8-gram md5
  // starts with '0', each anchor digests the 50-char span starting
  // there.
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def anchorSpans(text: String, spanLen: Int = 50, k: Int = 8): Seq[String] =
    (1 to text.length - spanLen + 1)
      .filter(i => md5hex(text.substring(i - 1, i - 1 + k)).startsWith("0"))
      .map(i => md5hex(text.substring(i - 1, i - 1 + spanLen)))

  test("anchoredSpanProfile matches an in-process replay and survives chunk-misaligning shifts") {
    val s = spark
    import s.implicits._
    // Doc 2 embeds doc 1's run shifted by a 3-char prefix — every
    // word-chunk boundary misaligns, but content-defined anchors select
    // the same positions WITHIN the copied run in both docs.
    val run = "the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts carefully measured the gravitational constant of the " +
      "asteroid belt using borrowed instruments from the orbital station"
    val docs = Seq(
      (1L, run),
      (2L, "zz " + run + " trailing words here"),
      (3L, "completely unrelated text that shares no fifty char run with anything else in this tiny corpus at all"),
      (4L, "tiny")) // below spanLen -> zero anchors
    val out = SubstringDedup
      .anchoredSpanProfile(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // expected, replayed independently
    val all = docs.flatMap { case (id, t) => anchorSpans(t).map(id -> _) }
    val tot = all.groupBy(_._2).view.mapValues(_.size).toMap
    val nd = all.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    for ((id, t) <- docs) {
      val spans = anchorSpans(t)
      val exp = (
        spans.size.toLong,
        spans.count(h => tot(h) >= 2).toLong,
        spans.count(h => nd(h) >= 2).toLong)
      assert(out(id) == exp, s"doc $id")
    }
    // the scenario is non-degenerate: the shifted copy IS detected
    assert(out(1L)._3 > 0 && out(2L)._3 > 0,
      "shifted duplicate run must produce cross-doc duplicated spans")
    assert(out(3L)._2 == 0L, "unique doc has no duplicated spans")
    assert(out(4L) == ((0L, 0L, 0L)), "short doc yields zeros, not a dropped row")
  }

  test("duplicatedSpanChars unions overlapping spans (long copied run counted once, by length)") {
    val s = spark
    import s.implicits._
    val run = "the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts carefully measured the gravitational constant of the " +
      "asteroid belt using borrowed instruments from the orbital station"
    val docs = Seq(
      (1L, run),
      (2L, "zz " + run + " trailing words here"),
      (3L, "nothing here repeats anywhere else in this corpus of ours today"))
    val out = SubstringDedup
      .duplicatedSpanChars(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // independent replay: anchored positions -> cross-doc dup digests ->
    // per-doc sorted starts -> interval union
    def posSpans(t: String): Seq[(Int, String)] =
      (1 to t.length - 50 + 1)
        .filter(i => md5hex(t.substring(i - 1, i - 1 + 8)).startsWith("0"))
        .map(i => i -> md5hex(t.substring(i - 1, i - 1 + 50)))
    val all = docs.flatMap { case (id, t) => posSpans(t).map { case (i, h) => (id, i, h) } }
    val crossDup = all.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    for ((id, t) <- docs) {
      val starts = posSpans(t).collect { case (i, h) if crossDup(h) => i }.sorted
      var cov = 0L; var end = 0L
      starts.foreach { st =>
        val newEnd = st + 49L
        cov += (if (st > end) 50L else math.max(newEnd - end, 0L))
        end = math.max(end, newEnd)
      }
      assert(out(id) == ((t.length.toLong, starts.size.toLong, cov)), s"doc $id")
      // union never exceeds doc length; spans overlap so union < n*50
      assert(cov <= t.length, s"doc $id coverage exceeds text")
      if (starts.size >= 2 && (starts.max - starts.min) < 50 * (starts.size - 1))
        assert(cov < 50L * starts.size, s"doc $id overlapping spans double-counted")
    }
    assert(out(1L)._3 > 0 && out(2L)._3 > 0, "copied run must be covered")
    assert(out(3L)._3 == 0L, "unique doc has zero duplicated coverage")
  }

  test("spanOverlapAgainstReference: pasted reference run counted, reference text stays put") {
    val s = spark
    import s.implicits._
    val run = "the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts carefully measured the gravitational constant of the " +
      "asteroid belt using borrowed instruments from the orbital station"
    val reference = Seq((100L, run)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "fresh preamble then " + run + " and a new ending"),
      (2L, "entirely novel words that never appeared in any reference document at all, nothing shared here today"),
      (3L, "tiny")).toDF("doc_id", "text")
    val out = SubstringDedup
      .spanOverlapAgainstReference(batch, reference, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // replay: batch spans matched against the reference's span digest set
    val refSet = anchorSpans(run).toSet
    for ((id, t) <- Seq((1L, "fresh preamble then " + run + " and a new ending"),
        (2L, "entirely novel words that never appeared in any reference document at all, nothing shared here today"),
        (3L, "tiny"))) {
      val sp = anchorSpans(t)
      assert(out(id) == ((sp.size.toLong, sp.count(refSet).toLong)), s"doc $id")
    }
    assert(out(1L)._2 > 0, "pasted run must match reference spans")
    assert(out(2L)._2 == 0L && out(3L) == ((0L, 0L)))
    // scale pin: no exchange input carries a text column on either side
    val df = SubstringDedup.spanOverlapAgainstReference(batch, reference, "doc_id", "text")
    val bad = PlanCheck.exchangesCarrying(df, "text")
    assert(bad.isEmpty, "an exchange input still carries the text column")
  }

  test("anchored_span_digests is bit-identical with the composable md5/substr formulation") {
    val s = spark
    import s.implicits._
    // real corpus text + adversarial strings: multi-byte BMP chars,
    // supplementary (4-byte) code points, and an exactly-spanLen doc.
    // Positions/lengths must count CODE POINTS, digests UTF-8 bytes.
    val extra = Seq(
      "café au lait " * 8,
      ("😀abc" * 20) + " tail words to cross fifty code points",
      "x" * 50)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).as[String].take(40).toSeq ++ extra
    val (spanLen, k, zeros) = (50, 8, 1)
    val df = docs.toDF("text").select(
      col("text"),
      graft.functions.AnchoredSpanDigests
        .anchoredSpanDigests(col("text"), spanLen, k, zeros).as("fast"),
      when(length(col("text")) >= spanLen,
        transform(
          filter(
            sequence(lit(1), length(col("text")) - lit(spanLen) + lit(1)),
            i => substring(md5(col("text").substr(i, lit(k))), 1, zeros) ===
              lit("0" * zeros)),
          i => md5(col("text").substr(i, lit(spanLen)))))
        .otherwise(array().cast("array<string>")).as("slow"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    var anchorsSeen = 0L
    rows.foreach { r =>
      val fast = r.getSeq[String](1)
      val slow = r.getSeq[String](2)
      assert(fast == slow, s"mismatch on: ${r.getString(0).take(60)}...")
      anchorsSeen += fast.size
    }
    assert(anchorsSeen > 0, "degenerate test: no anchors selected at all")
  }

  test("within-doc dedup and entropy are zero-shuffle projections") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (df <- Seq(
        SubstringDedup.dedupChunksWithinDoc(docs, "doc_id", "text", 2),
        docs.select(col("doc_id") +:
          TextAnalysis.entropyFeatures(col("text")): _*))) {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"expected map-only plan, got:\n$p")
      // higher-order lambdas sit outside whole-stage codegen by design;
      // the pin is the SHAPE: one projection straight over the scan
      assert(p.contains("Project") && p.contains("FileScan"),
        s"expected a single projection over the scan, got:\n$p")
    }
  }

  test("chunkDedupGlobal shuffles at most 3 times and never goes cartesian") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = SubstringDedup.chunkDedupGlobal(docs, "doc_id", "text", 3)
    df.collect()
    // AQE's toString repeats the plan under "== Initial Plan ==" —
    // count shuffles in the final plan only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles <= 3, s"expected <=3 shuffle exchanges, got $shuffles:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no all-pairs join:\n$p")
  }

  test("topPhrases counts all occurrences and plans a heap-based top-N") {
    val s = spark
    import s.implicits._
    // "a b c" appears twice in doc 1 (overlapping shingles) + once in doc 2
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c x y z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topPhrases(docs, "text", k = 3, topN = 3)
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.head == ("a b c" -> 3L))
    assert(rows.length == 3)
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-N must use bounded heaps, not a sort shuffle:\n$p")
    val shuffles = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected one count shuffle, got $shuffles:\n$p")
  }

  test("stripFrequentChunks removes ALL occurrences of hot chunks, first included") {
    val s = spark
    import s.implicits._
    // "a b" appears in docs 1, 2, 3 (df=3 > maxDf=2) -> stripped from
    // every doc, including its first occurrence; "c d" (df=2) survives.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d a b")
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .stripFrequentChunks(docs, "doc_id", "text", w = 2, maxDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, "c d")))
    assert(out(2L) == ((2L, 1L, "x y")))
    assert(out(3L) == ((2L, 1L, "c d")))
    // contrast with keep-first: chunkDedupGlobal would keep "a b" in doc 1
    val keepFirst = SubstringDedup
      .chunkDedupGlobal(docs, "doc_id", "text", w = 2)
      .filter(col("doc_id") === 1L).collect().head.getString(2)
    assert(keepFirst == "a b c d")
  }

  test("stripFrequentChunks: hot-set join broadcasts; text never shuffles for removal") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = SubstringDedup.stripFrequentChunks(docs, "doc_id", "text", 3, 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"hot-set anti join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no all-pairs join:\n$p")
    // df count + rebuild + outer join = bounded hash exchanges
    val shuffles = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 4, s"expected <=4 shuffle exchanges, got $shuffles:\n$p")
  }

  test("lineDedup drops every copy of a hot line and preserves line order") {
    val s = spark
    import s.implicits._
    // "nav bar" is in 3 docs (df=3 > maxDf=2) -> dropped everywhere;
    // "footer" (df=2) survives. Doc 4 is ALL hot lines -> empty text.
    val docs = Seq(
      (1L, "nav bar\nbody one\nfooter"),
      (2L, "nav bar\nbody two\nfooter"),
      (3L, "body three\nnav bar"),
      (4L, "nav bar")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.lineDedup(docs, "doc_id", "text", maxDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((3L, 2L, "body one\nfooter")))
    assert(out(2L) == ((3L, 2L, "body two\nfooter")))
    assert(out(3L) == ((2L, 1L, "body three")))
    assert(out(4L) == ((1L, 0L, "")))
    // Partition-invariant: same result from any physical layout.
    val again = SubstringDedup
      .lineDedup(docs.repartition(5), "doc_id", "text", maxDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(again == out)
  }

  test("lineDedup: hot set is a one-row broadcast; text never shuffles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        array_join(SubstringDedup.tokenChunks(split(col("text"), " "), 8),
          "\n").as("text"))
    val df = SubstringDedup.lineDedup(docs, "doc_id", "text", maxDf = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // Removal is a row-local array filter against the broadcast one-row
    // hot set: the ONLY hash exchange is the digest df count.
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"one-row hot aggregate must broadcast:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected <=1 hash exchange (digest df), got $shuffles:\n$p")
    val textInExchange = PlanCheck.exchangesCarrying(df, "text")
    assert(textInExchange.isEmpty, "an exchange input still carries text")
  }

  test("tokenWindows: overlap, short tails, and full coverage") {
    val s = spark
    import s.implicits._
    // 7 tokens, window 4, stride 2 -> starts 1, 3, 5 (ceil(3/2)=2 extra).
    val out = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
      .select(explode(operators.TextAnalysis.tokenWindows(
        col("text"), window = 4, stride = 2)).as("c"))
      .select("c.idx", "c.start_tok", "c.n_tokens", "c.chunk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (0, 1, 4, "a b c d"),
      (1, 3, 4, "c d e f"),
      (2, 5, 3, "e f g")))
    // Shorter than one window -> exactly one (short) chunk.
    val short = Seq((1L, "x y")).toDF("doc_id", "text")
      .select(explode(operators.TextAnalysis.tokenWindows(
        col("text"), 32, 24)).as("c"))
      .select("c.chunk").collect().map(_.getString(0))
    assert(short.toSeq == Seq("x y"))
    // Coverage on real data: concatenating stride-sized prefixes of
    // each chunk (plus the last chunk whole) rebuilds the document.
    val docs = s.read.parquet(TestSpark.sf0001 + "/documents.parquet").limit(50)
    val rebuilt = docs
      .select(col("doc_id"), col("text"),
        operators.TextAnalysis.tokenWindows(col("text"), 32, 24).as("cs"))
      .select(col("doc_id"), col("text"),
        array_join(transform(col("cs"), c =>
          when(c.getField("idx") === size(col("cs")) - 1, c.getField("chunk"))
            .otherwise(array_join(
              slice(split(c.getField("chunk"), " "), 1, 24), " "))), " ")
          .as("rt"))
      .filter(col("rt") =!= col("text")).count()
    assert(rebuilt == 0, "stride-prefix concatenation must rebuild each doc")
  }

  test("entropyFeatures matches hand-computed Shannon entropy") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "a a b"), (2L, "a a a"), (3L, "w x y z"))
      .toDF("doc_id", "text")
      .select(col("doc_id") +: TextAnalysis.entropyFeatures(col("text")): _*)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // -(2/3·log2(2/3) + 1/3·log2(1/3)) = 0.9182958... -> 0.918296
    assert(rows(1L) == ((3L, 2L, 0.918296)))
    assert(rows(3L) == ((4L, 4L, 2.0)))
    // single-repeated-word doc: exactly +0.0, not -0.0 (oracle hashing
    // compares the serialized value)
    val (n, u, e) = rows(2L)
    assert((n, u) == ((3L, 1L)))
    assert(java.lang.Double.doubleToRawLongBits(e) == 0L, s"got $e")
  }
}
