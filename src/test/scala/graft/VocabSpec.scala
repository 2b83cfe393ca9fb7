package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vocab

/** Tokenizer-design operators: BPE merge-pair learning, the power-of-two
  * length histogram, and the vocabulary coverage curve. */
class VocabSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "aba aba cd"),
      (2L, "aba x cd cd"),
      (3L, "Aba! cd")
    ).toDF("doc_id", "text")
  }

  test("wordCounts lowercases and counts letter runs only") {
    val m = Vocab
      .wordCounts(docs, "text")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // "Aba!" → "aba"; "x" is a single-letter word; punctuation dropped.
    assert(m == Map("aba" -> 4L, "cd" -> 4L, "x" -> 1L))
  }

  test("bpeMergePairs counts adjacent char pairs weighted by word frequency") {
    val rows = Vocab
      .bpeMergePairs(docs, "text", topK = 10)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // aba×4 → pairs ab, ba (4 each); cd×4 → cd (4); "x" has no pair.
    assert(rows.toMap == Map("ab" -> 4L, "ba" -> 4L, "cd" -> 4L))
    // Deterministic order: count desc, then pair asc.
    assert(rows.map(_._1).toSeq == Seq("ab", "ba", "cd"))
  }

  test("bpeMergePairs topK takes the highest-count pairs") {
    val rows = Vocab.bpeMergePairs(docs, "text", topK = 2).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ab", "ba"))
  }

  test("lengthHistogram buckets are exact at powers of two") {
    val s = spark
    import s.implicits._
    // Token counts 1, 2, 3, 4 → binary digit counts 1, 2, 2, 3.
    val df = Seq(
      (1L, "a"),
      (2L, "a b"),
      (3L, "a b c"),
      (4L, "a b c d")
    ).toDF("doc_id", "text")
    val m = Vocab
      .lengthHistogram(df, "text")
      .collect()
      .map(r =>
        r.getAs[Int]("bucket") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("lo"))))
      .toMap
    assert(m == Map(
      1 -> ((1L, 1L, 1L)),
      2 -> ((2L, 5L, 2L)),
      3 -> ((1L, 4L, 4L))))
  }

  test("vocabCoverage finds the smallest covering prefix per threshold") {
    // Vocab ranked (c desc, w): aba=4, cd=4, x=1; total 9.
    // t=0.5 → need cum_before < 4.5: aba(0), cd(4) → size 2, frac 8/9.
    // t=0.99 → need cum_before < 8.91: all 3 → size 3, frac 1.0.
    val m = Vocab
      .vocabCoverage(docs, "text", thresholds = Seq(0.5, 0.99))
      .collect()
      .map(r =>
        r.getAs[Double]("threshold") ->
          ((r.getAs[Long]("vocab_size"), r.getAs[Double]("covered_frac"))))
      .toMap
    assert(m(0.5)._1 == 2L)
    assert(math.abs(m(0.5)._2 - 0.888889) < 1e-9)
    assert(m(0.99) == ((3L, 1.0)))
  }

  test("zipfFit recovers the exact slope of a perfect power law") {
    val s = spark
    import s.implicits._
    // Counts 12, 6, 4, 3 at ranks 1..4 are c = 12/rank, so
    // ln(c) = ln 12 − 1·ln(rank): slope exactly −1.
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = Vocab.zipfFit(df, "text").collect()(0)
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(r.getAs[Double]("zipf_slope") == -1.0)
    assert(math.abs(r.getAs[Double]("zipf_intercept") - math.log(12)) < 1e-3)
  }

  test("rareNgramIndex lists exactly the docs carrying each rare gram") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d"),     // grams: "a b c", "b c d"
      (2L, "a b c x"),     // shares "a b c"
      (3L, "a b c y"),     // shares "a b c"
      (4L, "a b c z"),     // shares "a b c" → df=4 for "a b c"
      (5L, "q r s t")      // grams: "q r s", "r s t"
    ).toDF("doc_id", "text")
    val idx = Vocab
      .rareNgramIndex(df, "doc_id", "text", k = 3, maxDf = 3)
      .collect()
      .map(r =>
        r.getAs[String]("gram") ->
          ((r.getAs[Long]("df"), r.getAs[String]("postings"))))
      .toMap
    // "a b c" has df=4 → excluded; every other gram has df=1.
    assert(!idx.contains("a b c"))
    assert(idx("b c d") == ((1L, "1")))
    assert(idx("q r s") == ((1L, "5")))
    assert(idx.size == 6)
  }

  test("rareNgramIndex streams occurrences through a join — no window, no pre-join sort") {
    // The hot-gram safety property: occurrence rows must reach the rare
    // set via a hash-join probe (streaming), never via a per-gram
    // window or sort (which would buffer a hot gram's whole population
    // on one task before discarding it).
    val plan = Vocab
      .rareNgramIndex(docs, "doc_id", "text", k = 3, maxDf = 3)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      s"rare-set join must hash-probe, not sort-merge:\n${plan.take(800)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n${plan.take(800)}")
  }

  test("learnBpeMerges replays the textbook greedy rounds") {
    val s = spark
    import s.implicits._
    // The classic BPE teaching corpus shape: low x3, lower x2, newest x2.
    // Hand-derived greedy rounds (count desc, then pair text):
    //   1: (l,o)=5  -> lo      2: (lo,w)=5 -> low
    //   3: all-tie at 2, (e,r) wins the text tie-break -> er
    //   4: (e,s) -> es         5: (e,w) -> ew
    val df = Seq(
      (1L, "low low low"),
      (2L, "lower lower"),
      (3L, "newest newest")).toDF("doc_id", "text")
    val merges = operators.Vocab.learnBpeMerges(df, "text", 5)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("merged"),
        r.getAs[Long]("cnt")))
    assert(merges.toSeq == Seq(
      (1, "lo", 5L), (2, "low", 5L), (3, "er", 2L), (4, "es", 2L),
      (5, "ew", 2L)))
  }

  test("tokenizeWithMerges applies the ordered merge chain per word") {
    val s = spark
    import s.implicits._
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "r", "e" -> "s",
      "e" -> "w")
    val out = operators.Vocab.tokenizeWithMerges(
      Seq((1L, "low lower newest"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    // newest: es fires before ew in chain order -> n ew es t.
    assert(out(1L) == (("low low er n ew es t", 7)))
    assert(out(2L) == (("", 0)))
  }

  test("tokenizeWithMerges is map-only — no exchange in the plan") {
    val plan = operators.Vocab
      .tokenizeWithMerges(docs, "doc_id", "text", Seq("e" -> "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("learnBpeMerges stops early when the corpus runs out of pairs") {
    val s = spark
    import s.implicits._
    // Single 2-char word: one pair exists, then the vocab is one symbol.
    val df = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = operators.Vocab.learnBpeMerges(df, "text", 5).collect()
    assert(merges.length == 1)
    assert(merges(0).getAs[String]("merged") == "ab")
  }

  test("pair mass conservation: sum of pair counts equals sum of (len-1)*count") {
    val s = spark
    import s.implicits._
    // A messier corpus with repeats, casing, digits and punctuation.
    val df = Seq(
      (1L, "Alpha beta beta GAMMA delta-eps 42 zz"),
      (2L, "beta gamma gamma alpha alpha alpha x7y"),
      (3L, "Epsilon, zeta; eta! theta? iota")
    ).toDF("doc_id", "text")
    val wc = Vocab.wordCounts(df, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val expected = wc.collect {
      case (w, c) if w.length >= 2 => (w.length - 1).toLong * c
    }.sum
    val total = Vocab.bpeMergePairs(df, "text", topK = 10000)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    assert(total == expected)
  }

  test("vocabCoverage is monotone in the threshold") {
    val ts = Seq(0.1, 0.3, 0.5, 0.7, 0.9, 0.99)
    val rows = Vocab.vocabCoverage(docs, "text", ts).collect()
      .map(r => (r.getAs[Double]("threshold"),
        r.getAs[Long]("vocab_size"), r.getAs[Double]("covered_frac")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == ts)
    val sizes = rows.map(_._2).toSeq
    val fracs = rows.map(_._3).toSeq
    assert(sizes == sizes.sorted, s"vocab_size not monotone: $sizes")
    assert(fracs == fracs.sorted, s"covered_frac not monotone: $fracs")
    // Every threshold is actually covered.
    rows.foreach { case (t, _, frac) => assert(frac >= t, s"t=$t frac=$frac") }
  }

  test("all vocab operators return cleanly on an empty corpus") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Vocab.wordCounts(empty, "text").count() == 0)
    assert(Vocab.bpeMergePairs(empty, "text", 5).count() == 0)
    assert(Vocab.lengthHistogram(empty, "text").count() == 0)
    assert(Vocab.vocabCoverage(empty, "text").count() == 0)
    assert(Vocab.rareNgramIndex(empty, "doc_id", "text").count() == 0)
    // zipfFit aggregates: one row, zero terms, null regression.
    val z = Vocab.zipfFit(empty, "text").collect()(0)
    assert(z.getAs[Long]("n_terms") == 0L)
    assert(z.isNullAt(z.fieldIndex("zipf_slope")))
  }

  test("bpeMergePairs plans a TakeOrderedAndProject, not a global sort") {
    val plan = Vocab
      .bpeMergePairs(docs, "text", topK = 10)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
