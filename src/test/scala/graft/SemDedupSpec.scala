package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** SemDeDup (cluster-bounded semantic dedup): output invariants on
  * crafted clusters and the multi-probe assignment contract. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two tight duplicate clusters + one isolated vector. Cosine within
    * a cluster ≈ 1, across ≈ 0. */
  private def crafted = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)),
      (2L, Array(0.99f, 0.0f, 0.01f)),
      (3L, Array(1.0f, 0.0f, 0.02f)),
      (10L, Array(0.0f, 1.0f, 0.01f)),
      (11L, Array(0.01f, 0.99f, 0.0f)),
      (20L, Array(0.0f, 0.01f, 1.0f))).toDF("vec_id", "embedding")
  }

  test("crafted clusters: one representative per duplicate cluster") {
    val out = Dedup.semanticDedup(crafted, "vec_id", "embedding",
      threshold = 0.9, nClusters = 2, nProbes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val reps = out.filter(_._3).map(_._1).toSet
    assert(reps == Set(1L, 10L, 20L), s"expected component minima, got $reps")
    val repOf = out.map(t => t._1 -> t._2).toMap
    assert(repOf(2L) == 1L && repOf(3L) == 1L, s"cluster A must share rep 1: $repOf")
    assert(repOf(11L) == 10L, s"cluster B must share rep 10: $repOf")
    assert(repOf(20L) == 20L, "isolated vector is its own rep")
  }

  test("keep marks exactly id == rep; every non-zero row appears once") {
    val out = Dedup.semanticDedup(crafted, "vec_id", "embedding",
      threshold = 0.9, nClusters = 2)
    val rows = out.collect()
    assert(rows.length == 6, "every non-zero input row appears exactly once")
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) == r.getLong(2)),
        s"keep must mean id == rep: $r")
    }
  }

  test("zero-norm embeddings are dropped, not crashed on") {
    val s = spark
    import s.implicits._
    val df = crafted.unionByName(
      Seq((99L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val ids = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.9, nClusters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(99L), "zero-norm row must be dropped")
    assert(ids.size == 6)
  }

  test("multi-probe assignment: nProbes distinct cells, nearest first") {
    val cells = Similarity.assignCellsMulti(crafted, "vec_id", "embedding",
      nLists = 3, nProbes = 2)
      .select(col("vec_id"), col("__cells")).collect()
    assert(cells.length == 6)
    cells.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 2, s"expected 2 probed cells, got $cs")
      assert(cs.distinct.length == cs.length, s"cells must be distinct: $cs")
    }
  }

  test("single-probe misses boundary pairs that multi-probe catches") {
    // The threshold-0.45 pair graph on the sf0.001 embeddings: top-2
    // probing must catch at least as many exact pairs as top-1 (and on
    // this corpus, strictly more co-component hits were measured —
    // 0.29 → 0.785 pooled at sf0.1; here just pin the monotonicity).
    val e = spark.read.parquet(TestSpark.sf0001 + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val exact = Dedup.embeddingNearDupPairs(
      e, "vec_id", "embedding", threshold = 0.45, exact = true)
    def hits(nProbes: Int): Long = {
      val comp = Dedup.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.45, nClusters = 8, nProbes = nProbes)
        .select(col("rep"), col("vec_id"))
      val co = comp.as("x").join(comp.as("y"),
        col("x.rep") === col("y.rep") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      operators.Quality.pairRecallCounts(exact, co).collect().head.getLong(1)
    }
    assert(hits(2) >= hits(1), "multi-probe recall must not regress")
  }
}
