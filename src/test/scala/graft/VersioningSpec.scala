package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Versioning

class VersioningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val got = Versioning.snapshotDiff(oldSnap, newSnap, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: NULL text is presence, not absence") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "text")
    val got = Versioning.snapshotDiff(oldSnap, newSnap, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1: text -> NULL is changed (not 'added'); id 2: NULL on both
    // sides classifies changed too, matching SQL `=` on NULL.
    assert(got == Map(1L -> "changed", 2L -> "changed"), s"got $got")
  }

  test("snapshotDiff never ships text through an exchange") {
    val docs = spark.read.parquet(TestSpark.sf001 + "/documents.parquet")
    val df = Versioning.snapshotDiff(
      docs.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text"),
      docs.select("doc_id", "text"), "doc_id", "text")
    val bad = PlanCheck.exchangesCarrying(df, "text")
    assert(bad.isEmpty, "an exchange input still carries the text column")
    // And the fixture exercises every status on real data.
    val statuses = Versioning.snapshotDiff(
      docs.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text"),
      docs.filter(col("doc_id") % 5 =!= 3).select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text")),
      "doc_id", "text")
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"))
  }

  test("vocabDrift ranks the injected word first and bounds shifts by probability mass") {
    val s = TestSpark.spark
    import s.implicits._
    // identical snapshots except every new doc gains the token "zz":
    // zz moves from p=0 to 5/20 -> shift 0.25, everything else shrinks
    // proportionally (each old word 1/15 -> 3/4 of that in new)
    val oldS = Seq("a b c", "d e f", "g h i", "j k l", "m n o").toDF("text")
    val newS = oldS.select(concat(col("text"), lit(" zz")).as("text"))
    val top = Versioning.vocabDrift(oldS, newS, "text", topK = 3).collect()
    assert(top.head.getString(0) == "zz")
    assert(top.head.getLong(1) == 0L && top.head.getLong(2) == 5L)
    assert(top.head.getDouble(3) == 0.25)
    // remaining words all share the same smaller shift; tie broken by word
    val rest = top.tail.map(r => (r.getString(0), r.getDouble(3)))
    assert(rest.map(_._1).toSeq == Seq("a", "b"), s"got ${rest.toSeq}")
    val expectedShift = BigDecimal(1.0 / 15 - 1.0 / 20)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rest.forall(_._2 == expectedShift))
  }
}
