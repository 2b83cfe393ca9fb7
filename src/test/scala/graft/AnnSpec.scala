package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EuclidLshBuckets
import graft.operators.{ModelCache, Similarity}

/** The native euclidean-LSH ANN path: seeded-plane determinism, zero
  * model state, bucket arithmetic, and the no-UDT plan shape. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embs = spark.read
    .parquet(TestSpark.sf0001 + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def queries = embs.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("bucket expression: numTables entries, bit-identical across evaluations") {
    val b = EuclidLshBuckets.euclidLshBuckets(
      col("embedding").cast("array<double>"), seed = 7L,
      numTables = 6, bucketLength = 0.5)
    val twice = embs.limit(50)
      .select(col("vec_id"), b.as("b1"), b.as("b2"))
      .collect()
    assert(twice.nonEmpty)
    twice.foreach { r =>
      val b1 = r.getSeq[Long](1); val b2 = r.getSeq[Long](2)
      assert(b1.length == 6, s"expected 6 tables, got ${b1.length}")
      assert(b1 == b2, s"vec ${r.getLong(0)}: non-deterministic buckets")
    }
  }

  test("identical vectors share every bucket; seed changes the buckets") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0.3f, -0.8f, 0.5f)),
      (2L, Array(0.3f, -0.8f, 0.5f))).toDF("id", "v")
    val vd = col("v").cast("array<double>")
    val r = df.select(
      EuclidLshBuckets.euclidLshBuckets(vd, 42L, 4, 0.25).as("a"),
      EuclidLshBuckets.euclidLshBuckets(vd, 43L, 4, 0.25).as("b"))
      .collect()
    assert(r(0).getSeq[Long](0) == r(1).getSeq[Long](0),
      "equal vectors must land in equal buckets")
    assert(r(0).getSeq[Long](0) != r(0).getSeq[Long](1),
      "a different seed must draw different planes")
  }

  test("ANN fits nothing: the model cache stays empty") {
    ModelCache.clear()
    Similarity.annCosineTopK(embs, queries, "vec_id", "embedding",
      "qid", "qvec", k = 3).count()
    assert(ModelCache.size == 0,
      s"native LSH must not fit a model, cached ${ModelCache.size}")
  }

  test("ANN output is deterministic across executions (seeded planes)") {
    val run = () => Similarity.annCosineTopK(embs, queries, "vec_id",
      "embedding", "qid", "qvec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(run() == run(), "same seed must reproduce the same top-k")
  }

  test("ANN top-k plan: one broadcast scan, one exchange, no UDF, no fit") {
    val df = Similarity.annCosineTopK(embs, queries, "vec_id", "embedding",
      "qid", "qvec", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    // The query side broadcasts with its bucket keys; the corpus is
    // scanned once. The ONLY exchange is the final partial top-k agg —
    // no posting explode, no candidate distinct, no vector join-back.
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"top-k must broadcast the prefiltered query side:\n${plan.take(2000)}")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"expected only the top-k agg exchange(s), got $exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "candidate scoring must be the native fused cosine, not a UDF")
  }

  test("ANN pairs plan: equi hash join on buckets, no cartesian, no UDF") {
    val df = Similarity.annCosinePairs(embs, embs, "vec_id", "embedding",
      "vec_id", "embedding", maxCosDist = 0.55, rowsPerTable = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"bucket join must stay an equi join:\n${plan.take(2000)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "candidate scoring must be the native fused cosine, not a UDF")
  }

  test("pairs path verifies candidates exactly (no false positives)") {
    // Coarse buckets make everything a candidate; the exact verify must
    // still cut the output to true cosine >= threshold.
    val pairs = Similarity.annCosinePairs(embs, embs, "vec_id", "embedding",
      "vec_id", "embedding", maxCosDist = 0.55,
      numHashTables = 8, bucketLength = 2.0)
      .filter(col("id_a") < col("id_b"))
    val exact = graft.operators.Dedup.embeddingNearDupPairs(
      embs, "vec_id", "embedding", threshold = 0.45, exact = true)
    val p = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.subsetOf(e), s"false positives: ${p diff e}")
    assert(e.subsetOf(p), s"total-recall params missed: ${e diff p}")
  }

  test("materialized IVF index: cache round trip answers identically to the live model") {
    import graft.extensions._
    val (assigned, centroids) = Similarity.buildIvfIndex(
      embs, "vec_id", "embedding", nLists = 4)
    // Materialize both frames through the persistent cache and read
    // them back — the index survives where the in-heap ModelCache
    // would not.
    val assignedBack = assigned.cacheToDbfs(
      overridePreferSparkCache = true,
      dbfsCacheComplexityThreshold = None,
      dbfsCacheMultiplierThreshold = None)
    val centroidsBack = centroids.cacheToDbfs(
      overridePreferSparkCache = true,
      dbfsCacheComplexityThreshold = None,
      dbfsCacheMultiplierThreshold = None)
    val fromIndex = Similarity.ivfTopKFromIndex(
      assignedBack, centroidsBack, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Same session => ModelCache serves the identical quantizer to the
    // live path, so from-index results must match exactly.
    val live = Similarity.ivfCosineTopK(
      embs, queries, "vec_id", "embedding", "qid", "qvec",
      k = 5, nLists = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromIndex == live)
    assert(fromIndex.nonEmpty)
  }

  test("extendIvfIndex assignment == the quantizer's own assignment") {
    val (assigned, centroids) = Similarity.buildIvfIndex(
      embs, "vec_id", "embedding", nLists = 4)
    // Re-assign the SAME vectors relationally against the frozen
    // centroid table: every cell must match model.transform's choice —
    // the parity that makes extending an index equivalent to having
    // assigned the new vectors at build time.
    val re = Similarity.extendIvfIndex(embs, centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ref = assigned.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re == ref)
    assert(re.nonEmpty)
  }

  test("quantizerDrift: identical delta reads zero drift; a shifted delta does not") {
    val (assigned, centroids) = Similarity.buildIvfIndex(
      embs, "vec_id", "embedding", nLists = 4)
    // Null hypothesis: the delta IS the base — every shift must be
    // exactly 0 (the fixed-point sums make this bit-exact, not
    // approximately-zero).
    val zero = Similarity.quantizerDrift(
        assigned, assigned, centroids, "embedding")
      .collect()
    assert(zero.length == 4)
    zero.foreach { r =>
      assert(r.getDouble(r.fieldIndex("fill_shift")) == 0.0, r.toString)
      assert(r.getDouble(r.fieldIndex("d2_shift")) == 0.0, r.toString)
      assert(r.getLong(r.fieldIndex("n_base")) ==
        r.getLong(r.fieldIndex("n_delta")), r.toString)
    }
    // A deliberately shifted delta must register: fill shares move
    // (some |fill_shift| > 0) and distances to the frozen centroids
    // grow somewhere.
    val shifted = Similarity.extendIvfIndex(
      embs.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i === 0, x + lit(1.0)).otherwise(x))
          .as("embedding")),
      centroids, "vec_id", "embedding")
    val drift = Similarity.quantizerDrift(
        assigned, shifted, centroids, "embedding")
      .collect()
    assert(drift.exists(r =>
      math.abs(r.getDouble(r.fieldIndex("fill_shift"))) > 0.01),
      drift.mkString("; "))
    assert(drift.exists(r => !r.isNullAt(r.fieldIndex("d2_shift")) &&
      r.getDouble(r.fieldIndex("d2_shift")) > 0.0),
      drift.mkString("; "))
    // fill columns are SHARES: each side sums to 1 (fixture has no
    // zero-norm drops).
    val fb = drift.map(r => r.getDouble(r.fieldIndex("fill_base"))).sum
    assert(math.abs(fb - 1.0) < 1e-4, s"fill_base sums to $fb")
  }

  test("embeddingCard counts nulls, zero vectors, ragged dims, and exact norms") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Some(Array(3.0f, 4.0f))),        // norm 5
      (2L, Some(Array(0.0f, 0.0f))),        // zero vector
      (3L, None),                           // null
      (4L, Some(Array(1.0f, 0.0f, 0.0f)))   // ragged dim, norm 1
    ).toDF("vec_id", "embedding")
    val r = operators.Similarity.embeddingCard(vecs, "embedding").collect().head
    assert(r.getLong(0) == 4L, "n_vectors")
    assert(r.getLong(1) == 1L, "n_null")
    assert(r.getInt(2) == 2 && r.getInt(3) == 3, "dim bounds")
    assert(r.getLong(4) == 1L, "n_zero")
    assert(r.getDouble(5) == 2.0, "avg of 5,0,1")
    assert(r.getDouble(6) == 1.0, "median of 0,1,5")
    assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 5.0, "min/max")
    // the real fixture has no pathologies
    val real = operators.Similarity.embeddingCard(embs, "embedding").collect().head
    assert(real.getLong(1) == 0L && real.getLong(4) == 0L)
    assert(real.getInt(2) == real.getInt(3), "fixture dims must be uniform")
    assert(real.getDouble(7) > 0.0)
  }
}
