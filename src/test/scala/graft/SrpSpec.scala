package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class SrpSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def planted = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val bases = List.fill(20)(vec())
    // 20 random vectors + a near-identical copy of the first five.
    val rows = bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      bases.take(5).zipWithIndex.map { case (v, i) => (100L + i, perturb(v).toSeq) }
    rows.toDF("vec_id", "embedding")
  }

  test("SRP pairs find planted near-dups with exact cosine values") {
    val df = planted
    val srp = Similarity.srpCosinePairs(df, "vec_id", "embedding", threshold = 0.9)
    val exact = Dedup.exactCosinePairsBlocked(df, "vec_id", "embedding", 0.9)
    val srpSet = srp.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactSet.size >= 5, s"fixture should plant >=5 near-dup pairs, got $exactSet")
    val recall = (srpSet intersect exactSet).size.toDouble / exactSet.size
    assert(recall >= 0.8, s"SRP recall $recall < 0.8 (found $srpSet of $exactSet)")
    // No false positives: every emitted pair really clears the threshold
    // (the exact verify guarantees it — sims must match the exact path).
    assert(srpSet.subsetOf(exactSet), s"SRP emitted non-qualifying pairs: ${srpSet -- exactSet}")
  }

  test("SRP plan has no model fit and no cartesian join") {
    val df = planted
    val p = Similarity.srpCosinePairs(df, "vec_id", "embedding", threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in SRP plan:\n$p")
  }

  test("maxBucket: no-op when generous; caps clone-bucket explosion when tight") {
    val s = spark
    import s.implicits._
    val df = planted
    // Generous cap changes nothing (every bucket under the cap).
    val none = Similarity
      .srpCosinePairs(df, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val generous = Similarity
      .srpCosinePairs(df, "vec_id", "embedding", threshold = 0.9,
        maxBucket = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == none)
    // Clone-heavy corpus: 30 exact copies of ONE vector + the planted
    // set. Uncapped, the clones alone contribute C(30,2)=435 pairs;
    // a tight cap drops the clone bucket while the planted near-dup
    // pairs (small buckets) all survive.
    val rnd = new scala.util.Random(3)
    val cloneV = Array.fill(16)(rnd.nextGaussian().toFloat).toSeq
    val clones = (0 until 30).map(i => (1000L + i, cloneV))
    val heavy = (df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).toSeq ++ clones)
      .toDF("vec_id", "embedding")
    val capped = Similarity
      .srpCosinePairs(heavy, "vec_id", "embedding", threshold = 0.9,
        maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((none -- capped).isEmpty,
      s"planted pairs lost under the cap: ${none -- capped}")
    assert(!capped.exists { case (a, b) => a >= 1000L && b >= 1000L },
      "clone-clone pairs must be dropped by the cap")
    // Same guard on the MinHash form: clone texts capped, distinct kept.
    val docs = ((0 until 30).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta")) ++
      Seq((100L, "one two three four five six seven"),
        (101L, "one two three four five six eight")))
      .toDF("doc_id", "text")
    val mh = Dedup.minHashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBucket = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((100L, 101L)), s"distinct near-dup pair lost: $mh")
    assert(!mh.exists { case (a, b) => a < 30L && b < 30L },
      "clone-clone pairs must be dropped by the cap")
  }

  test("SRP signatures are deterministic across invocations") {
    val df = planted
    val a = Similarity.srpCosinePairs(df, "vec_id", "embedding", threshold = 0.9).collect().toSet
    val b = Similarity.srpCosinePairs(df, "vec_id", "embedding", threshold = 0.9).collect().toSet
    assert(a == b)
  }
}
