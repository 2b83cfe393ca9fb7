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

  test("bpeMergePairs plans a TakeOrderedAndProject, not a global sort") {
    val plan = Vocab
      .bpeMergePairs(docs, "text", topK = 10)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
