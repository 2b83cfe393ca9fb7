package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Augment

/** Deterministic training-sample generation: span corruption and
  * causal splits. */
class AugmentSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def docs = spark.read
    .parquet(TestSpark.sf001 + "/documents.parquet")
    .select("doc_id", "text")

  test("spanCorrupt: input+target reconstruct the original exactly") {
    val out = Augment.spanCorrupt(docs, "doc_id", "text", spanLen = 5)
      .join(docs, "doc_id")
    // Reassemble: input's sentinel slot replaced by target's span (the
    // target is "<X> w1 ... w5").
    val rebuilt = out.select(
      col("doc_id"),
      regexp_replace(
        col("input"), lit("<X>"),
        regexp_replace(col("target"), "^<X> ", "")).as("rebuilt"),
      col("text"))
    assert(rebuilt.filter(col("rebuilt") =!= col("text")).count() == 0)
    // every target carries exactly spanLen masked tokens + sentinel
    val bad = Augment.spanCorrupt(docs, "doc_id", "text", spanLen = 5)
      .filter(size(split(col("target"), " ")) =!= 6)
    assert(bad.count() == 0)
  }

  test("causalSplits: context ++ continuation is the original, bounds hold") {
    val out = Augment.causalSplits(docs, "doc_id", "text",
      minContext = 8, minContinuation = 4)
      .join(docs, "doc_id")
    assert(out
      .filter(concat_ws(" ", col("context"), col("continuation")) =!= col("text"))
      .count() == 0)
    val sizes = out.select(
      size(split(col("context"), " ")).as("nc"),
      size(split(col("continuation"), " ")).as("nn"))
    assert(sizes.filter(col("nc") < 8 || col("nn") < 4).count() == 0)
  }

  test("generation is deterministic and map-only") {
    val a = Augment.spanCorrupt(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Augment.spanCorrupt(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val plan = Augment.causalSplits(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("fimSplit: parts reassemble the original, PSM format holds") {
    val out = Augment.fimSplit(docs, "doc_id", "text").join(docs, "doc_id")
    val rebuilt = out.select(
      col("doc_id"),
      concat_ws(" ",
        Seq("prefix", "middle", "suffix").map(c =>
          when(col(c) === "", null).otherwise(col(c))): _*).as("rebuilt"),
      col("text"), col("psm"))
    assert(rebuilt.filter(col("rebuilt") =!= col("text")).count() == 0)
    assert(out.filter(!col("psm").startsWith("<PRE> ")).count() == 0)
    assert(out.filter(!col("psm").contains(" <SUF> ") ||
      !col("psm").contains(" <MID> ")).count() == 0)
  }

  test("too-short documents are dropped, not mangled") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "a b c"), (2L, (1 to 40).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Augment.spanCorrupt(tiny, "doc_id", "text", spanLen = 5)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Augment.causalSplits(tiny, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
