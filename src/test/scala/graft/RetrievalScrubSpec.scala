package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** BM25 retrieval, PII scrubbing, and the Gopher repetition signals. */
class RetrievalScrubSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark shuffle spark join spark"),
      (2L, "window join window"),
      (3L, "vector search index"),
      (4L, "the quick brown fox"),
      (5L, "spark")
    ).toDF("doc_id", "text")
  }

  // ---- BM25 -------------------------------------------------------

  test("bm25 ranks the term-dense short doc first and excludes non-matches") {
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"), topK = 10)
      .collect()
    // Docs 1 and 5 contain 'spark'; doc 4 and others must be absent.
    assert(out.map(_.getLong(0)).toSet == Set(1L, 5L))
    // tf=3 in doc 1 outweighs doc 5's length-normalization advantage
    // (1.402 vs 1.391 by hand at k1=1.2, b=0.75).
    assert(out.head.getLong(0) == 1L)
    assert(out.forall(_.getDouble(2) > 0))
  }

  test("bm25 multi-term score is the sum of per-term scores") {
    val both = Retrieval.bm25(
      docs, "doc_id", "text", Seq("spark", "window"), topK = 10)
    // Every doc matching either term appears.
    assert(both.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 5L))
  }

  test("bm25 plan: stats side is a broadcast, top-k never global-sorts") {
    // topK below the fixture's row count: a limit ≥ the LocalRelation's
    // known maxRows is optimized away (EliminateLimits) and with it the
    // TakeOrderedAndProject this asserts on; parquet scans have unknown
    // maxRows, so the real corpus path always keeps it.
    val q = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"), topK = 1)
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("bm25Batch single-term query matches the literal-terms form exactly") {
    val s = spark
    import s.implicits._
    val real = s.read.parquet(TestSpark.sf001 + "/documents.parquet")
      .select("doc_id", "text")
    val qs = Seq((7L, "spark")).toDF("qid", "term")
    val batch = Retrieval.bm25Batch(real, "doc_id", "text", qs, "qid", "term")
      .select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val single = Retrieval.bm25(real, "doc_id", "text", Seq("spark"), topK = 10)
      .select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(batch == single)
  }

  test("bm25Batch deduplicates repeated (qid, term) rows before scoring") {
    // A duplicated query row must not double-count the term's
    // contribution — mirrors bm25's require(terms.distinct == terms).
    val s = spark
    import s.implicits._
    val real = s.read.parquet(TestSpark.sf001 + "/documents.parquet")
      .select("doc_id", "text")
    val once = Seq((7L, "spark")).toDF("qid", "term")
    val twice = Seq((7L, "spark"), (7L, "spark")).toDF("qid", "term")
    val a = Retrieval.bm25Batch(real, "doc_id", "text", once, "qid", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Retrieval.bm25Batch(real, "doc_id", "text", twice, "qid", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("stripMarkup: tags spaced out, entities decoded once, whitespace collapsed") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "<p>Hello &amp; <b>world</b></p>"),
      // Double-encoded entity must decode ONE level: &amp;lt; -> &lt;
      (2L, "a &amp;lt; b"),
      // Tag replaced by a space so adjacent words never fuse.
      (3L, "one<br>two"),
      (4L, "  <div>\n &quot;x&quot;\t&#39;y&#39; </div>  "))
      .toDF("id", "h")
    val out = rows
      .select(col("id"), operators.TextAnalysis.stripMarkup(col("h")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Hello & world")
    assert(out(2L) == "a &lt; b")
    assert(out(3L) == "one two")
    assert(out(4L) == "\"x\" 'y'")
  }

  test("bm25 rejects empty, duplicate, and non-word terms") {
    intercept[IllegalArgumentException](
      Retrieval.bm25(docs, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](
      Retrieval.bm25(docs, "doc_id", "text", Seq("a", "a")))
    intercept[IllegalArgumentException](
      Retrieval.bm25(docs, "doc_id", "text", Seq("two words")))
  }

  // ---- PII scrub --------------------------------------------------

  private def piiDocs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "reach me at jane.doe+x@mail.example.org thanks"),
      (2L, "server 192.168.1.254 and 10.0.0.1 rebooted"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "nothing sensitive here"),
      (5L, "a@b.co 1.2.3.4 999-88-7777 all three")
    ).toDF("doc_id", "text")
  }

  test("scrubReport counts and redacts each PII class") {
    val out = Scrub.scrubReport(piiDocs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 1L), (0L, 0L, 0L),
        (1L, 1L, 1L)))
    val redacted = out.map(_.getAs[String]("redacted"))
    assert(redacted(0) == "reach me at <EMAIL> thanks")
    assert(redacted(1) == "server <IP> and <IP> rebooted")
    assert(redacted(2) == "ssn <ID> on file")
    assert(redacted(3) == "nothing sensitive here")
    assert(redacted(4) == "<EMAIL> <IP> <ID> all three")
  }

  test("scrub placeholders cannot trigger later patterns") {
    // An email whose redaction leaves digits adjacent would let the SSN
    // pattern re-match; the fixed order and digit-free placeholders
    // make the chain idempotent.
    val s = spark
    import s.implicits._
    val tricky = Seq((1L, "x 123-45-6789@host.com y")).toDF("doc_id", "text")
    val r = Scrub.scrubReport(tricky, "doc_id", "text").collect()(0)
    assert(r.getAs[String]("redacted") == "x <EMAIL> y")
  }

  test("policyScreen counts exact token hits per category, no substring trips") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "the Spark engine is fast and spark again"),
      (2L, "scunthorpe sparkle tablet"), // substrings must NOT match
      (3L, "plain words only")
    ).toDF("doc_id", "text")
    val out = Scrub.policyScreen(d, "doc_id", "text",
      Seq("perf" -> Seq("fast"), "infra" -> Seq("spark", "table")))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((1L, 2L, true), (0L, 0L, false), (0L, 0L, false)))
    val plan = Scrub.policyScreen(d, "doc_id", "text",
      Seq("perf" -> Seq("fast"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("scrubReport plan is a single map-only projection (no exchange)") {
    val plan = Scrub.scrubReport(piiDocs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- Gopher repetition ------------------------------------------

  private def gopherVal(text: String, n: Int): (Double, Double) = {
    val s = spark
    import s.implicits._
    val cols = TextAnalysis.gopherRepetition(col("text"), n)
    val r = Seq(text).toDF("text").select(cols: _*).collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("gopherRepetition top2 mass: 'a b' repeated dominates") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] — 'a b' count 3
    // len 3 mass 9; 'b a' count 2 mass 6; total 15.
    val (top2, dup2) = gopherVal("a b a b a b", 2)
    assert(top2 == 0.6)
    assert(dup2 == 1.0) // every 2-gram is duplicated
  }

  test("gopherRepetition on all-distinct text has zero dup mass") {
    val (top2, dup2) = gopherVal("one two three four five", 2)
    // Four distinct 2-grams, counts all 1: top mass = len of the
    // lexicographically... no — max count ties at 1, first sorted run
    // wins: 'five' never starts a 2-gram; sorted grams begin 'four five'.
    assert(dup2 == 0.0)
    assert(top2 > 0.0 && top2 < 0.5)
  }

  test("gopherRepetition below gram size yields zeros, not nulls") {
    val (top5, dup5) = gopherVal("a b c", 5)
    assert(top5 == 0.0 && dup5 == 0.0)
  }

  test("gopherRepetition native masses are bit-identical to the chain") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "a b a b a b",
      "one two three four five",
      "x",
      "b c b c b",
      "the the the the",
      "αβ γ αβ γ αβ", // greek, non-ASCII
      "𝕏 y 𝕏 y 𝕏", // supplementary plane
      "a  b a  b" // double space -> empty tokens preserved
    ).toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val native = texts.select(TextAnalysis.gopherRepetition(col("text"), n): _*)
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
      val chain = texts.select(TextAnalysis.gopherRepetitionChain(col("text"), n): _*)
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
      assert(native == chain, s"n=$n")
    }
  }

  test("gopherRepetition top gram tie-breaks to lexicographically smallest") {
    // 'b c' and 'c b' both appear twice ('b c b c b'): sorted order
    // finalizes 'b c' first; strict > keeps it.
    val (top2, _) = gopherVal("b c b c b", 2)
    // 'b c': count 2, len 3, mass 6; 'c b': count 2, mass 6; total 12.
    assert(top2 == 0.5)
  }
}
