package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Deterministic Lloyd's k-means + cluster-balanced sampling. */
class ClusteringSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Two tight groups far apart, ids interleaved so the md5 seed draw
    * is not accidentally aligned with the structure. */
  private def vecs = {
    val s = spark
    import s.implicits._
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0 else 100.0
      (i.toLong, Array(base + i * 0.01f, base - i * 0.01f).map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("lloyd separates two far-apart groups after one iteration") {
    val out = Clustering.lloyd(vecs, "vec_id", "embedding", k = 2, iters = 1)
      .collect()
    assert(out.length == 20)
    val byParity = out.groupBy(_.getLong(0) % 2).map { case (p, rows) =>
      p -> rows.map(_.getInt(1)).toSet
    }
    // Each parity class (one tight group) lands entirely in one cluster,
    // and the two groups land in different clusters.
    assert(byParity.values.forall(_.size == 1))
    assert(byParity(0L) != byParity(1L))
  }

  test("spread seeding separates the groups in one iteration and is stable") {
    // Farthest-first guarantees the second seed comes from the OTHER
    // group (max min-distance), so even iters=1 separates perfectly.
    val out = Clustering.lloyd(
      vecs, "vec_id", "embedding", k = 2, iters = 1, seeding = "spread")
      .collect()
    val byParity = out.groupBy(_.getLong(0) % 2)
      .map { case (p, rows) => p -> rows.map(_.getInt(1)).toSet }
    assert(byParity.values.forall(_.size == 1))
    assert(byParity(0L) != byParity(1L))
    val again = Clustering.lloyd(
      vecs.repartition(5), "vec_id", "embedding", 2, 1, seeding = "spread")
      .orderBy("vec_id").collect().toSeq
    assert(again == out.sortBy(_.getLong(0)).toSeq)
  }

  test("spread seeding fails loudly when the corpus has < k distinct vectors") {
    val s = spark
    import s.implicits._
    // 5 rows but only 2 distinct vectors: k=3 must not silently fit
    // duplicate centroids.
    val dup = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(5f, 5f)), (4L, Array(5f, 5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Clustering.lloyd(dup, "vec_id", "embedding", k = 3, iters = 1,
        seeding = "spread").collect())
    assert(e.getMessage.contains("fewer than 3 distinct vectors"))
  }

  test("native centroid argmin is bit-identical to the least-struct chain") {
    val s = spark
    import s.implicits._
    val embs = s.read
      .parquet(TestSpark.sf0001 + "/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("__v"))
    // Centroids from real data + a tie case (two identical centroids:
    // strict < must keep the lower index in both forms).
    val rows = embs.limit(3).collect().map(_.getSeq[Double](0))
    val centroids = Array(rows(0), rows(1), rows(1), rows(2))
    val native = embs.select(
      graft.functions.CentroidArgmin.argmin(
        col("__v"), centroids.map(_.toArray)).as("b"))
      .select(col("b.d"), col("b.c"))
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq
    val chain = embs.select(
      Clustering.chainBest(col("__v"), centroids).as("b"))
      .select(col("b.d"), col("b.c"))
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq
    assert(native == chain)
    assert(native.exists(_._2 == 1) || chain.forall(_._2 != 2),
      "ties must resolve to the lower duplicate index")
  }

  test("lloyd is invariant to input partitioning") {
    val a = Clustering.lloyd(vecs, "vec_id", "embedding", 2, 2)
      .orderBy("vec_id").collect().toSeq
    val b = Clustering.lloyd(vecs.repartition(7), "vec_id", "embedding", 2, 2)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("lloyd assignment stage is map-only (no join, no shuffle)") {
    // The per-iteration update shuffles (cluster, dim) partials; the
    // assignment itself must fold centroids in as literals. Check the
    // FINAL output plan: one projection over the scan, no Exchange
    // other than none at all (the output is assignment-only).
    val plan = Clustering.lloyd(vecs, "vec_id", "embedding", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("lloyd rejects degenerate shapes") {
    intercept[IllegalArgumentException](
      Clustering.lloyd(vecs, "vec_id", "embedding", k = 1, iters = 1))
    intercept[IllegalArgumentException](
      Clustering.lloyd(vecs, "vec_id", "embedding", k = 2, iters = 0))
    intercept[IllegalArgumentException](
      Clustering.lloyd(vecs.limit(1), "vec_id", "embedding", 2, 1))
  }

  test("assignToCentroids off a materialized model matches in-fit assignment") {
    val model = Clustering.lloydCentroids(vecs, "vec_id", "embedding", 2, 2)
    assert(model.count() == 2)
    // Assigning the SAME frame against the exported model must equal
    // lloyd's own final assignment.
    val viaModel = Clustering.assignToCentroids(
      vecs, "vec_id", "embedding", model)
      .orderBy("vec_id").collect().toSeq
    val direct = Clustering.lloyd(vecs, "vec_id", "embedding", 2, 2)
      .orderBy("vec_id").collect().toSeq
    assert(viaModel == direct)
    // A NEW batch assigns map-only: no exchange in the plan.
    val s = spark
    import s.implicits._
    val batch = Seq((100L, Array(0.1f, 0.2f)), (101L, Array(99.5f, 99.9f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.assignToCentroids(batch, "vec_id", "embedding", model)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(100L) != got(101L), "far-apart batch rows split clusters")
  }

  test("clusterOutliers returns the farthest vectors per cluster") {
    val assigned = Clustering.lloyd(vecs, "vec_id", "embedding", 2, 2)
    val out = Clustering.clusterOutliers(assigned, "vec_id", 2)
    val rows = out.collect()
    assert(rows.length == 4)
    // Every returned dist2 is >= the max dist2 of the non-returned
    // members of its cluster.
    val all = assigned.collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getDouble(2)))
    val chosen = rows.map(r => (r.getInt(0), r.getLong(1))).toSet
    for ((c, id, d) <- all if !chosen.contains((c, id))) {
      val minChosen = rows.filter(_.getInt(0) == c).map(_.getDouble(2)).min
      assert(d <= minChosen, s"non-outlier $id (d=$d) beats cut $minChosen")
    }
  }

  test("clusterBalancedSample caps every cluster and is deterministic") {
    val assigned = Clustering.lloyd(vecs, "vec_id", "embedding", 2, 1)
    val sample = Clustering.clusterBalancedSample(assigned, "vec_id", 3)
    val rows = sample.collect()
    assert(rows.length == 6)
    assert(rows.groupBy(_.getInt(0)).values.forall(_.length == 3))
    val again = Clustering.clusterBalancedSample(assigned, "vec_id", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(again == rows.map(r => (r.getInt(0), r.getLong(1))).toSet)
  }
}
