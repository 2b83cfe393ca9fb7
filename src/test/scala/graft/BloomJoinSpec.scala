package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bloom-pruned semi join equals the plain semi join exactly") {
    val big = spark.read.parquet(TestSpark.sf001 + "/lineitem.parquet")
    val small = spark.read.parquet(TestSpark.sf001 + "/orders.parquet")
      .filter(col("o_totalprice") > 400000)
    val pruned = BloomJoin
      .bloomSemiJoin(big, small, "l_orderkey", "o_orderkey", expectedItems = 100000L)
      .select("l_orderkey", "l_linenumber")
    val plain = big
      .join(small, big("l_orderkey") === small("o_orderkey"), "leftsemi")
      .select("l_orderkey", "l_linenumber")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom prefilter sits below the join in the physical plan") {
    val big = spark.read.parquet(TestSpark.sf001 + "/lineitem.parquet")
    val small = spark.read.parquet(TestSpark.sf001 + "/orders.parquet")
      .filter(col("o_totalprice") > 400000)
    val plan = BloomJoin
      .bloomSemiJoin(big, small, "l_orderkey", "o_orderkey", expectedItems = 100000L)
      .queryExecution.executedPlan.toString
    // The native probe must appear (scan-side pruning), and the join
    // must still be there to remove the false positives.
    assert(plan.contains("bloom_might_contain_long"),
      s"no bloom prefilter in plan:\n$plan")
    assert(plan.toLowerCase.contains("semi"), s"no semi join in plan:\n$plan")
  }

  test("bloom-prefiltered decontamination is bit-identical to the plain form") {
    val docs = spark.read.parquet(TestSpark.sf001 + "/documents.parquet")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("eval_set", (col("doc_id") % 2).cast("int"))
    val plain = graft.operators.Decontaminate.ngramOverlapPerSet(
      train, eval, "doc_id", "text", "eval_set", k = 13, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bloomed = graft.operators.Decontaminate.ngramOverlapPerSetBloom(
      train, eval, "doc_id", "text", "eval_set", k = 13, minShared = 1,
      expectedItems = 100000L)
    val got = bloomed
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == plain && got.nonEmpty)
    // The map-side probe must sit below the join in the physical plan.
    val p = bloomed.queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain_long"),
      s"no bloom prefilter in plan:\n${p.take(1500)}")
  }

  test("tiny small side prunes most of the big side before the join") {
    val big = spark.read.parquet(TestSpark.sf001 + "/lineitem.parquet")
    val small = spark.read.parquet(TestSpark.sf001 + "/orders.parquet")
      .filter(col("o_totalprice") > 450000) // very selective
    val bf = small.stat.bloomFilter("o_orderkey", 10000L, 0.01)
    val survivors = big.filter(
      udf((k: Long) => bf.mightContainLong(k)).apply(col("l_orderkey"))).count()
    val total = big.count()
    assert(survivors < total / 10,
      s"bloom left $survivors of $total rows — not selective")
  }
}
