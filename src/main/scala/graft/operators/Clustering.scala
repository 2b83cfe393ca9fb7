package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the
  * clustering primitive behind cluster-aware curation (SemDeDup-style
  * semantic dedup, cluster-balanced sampling, diversity-driven data
  * selection), built so the WHOLE fit is exact-oracle-replayable:
  * seeded md5 initialization, a fixed iteration count, centroid means
  * rounded to 6 decimals after every update, and lexicographic
  * tie-breaks everywhere — two engines (or two runs on different
  * partitionings) produce the identical model and the identical
  * assignment, which spark.ml's KMeans (RDD-order-sensitive init)
  * cannot promise.
  *
  * Scale shape per iteration: assignment is MAP-ONLY — the k·d
  * centroid table is folded into the row expression as literals, so
  * each vector computes its argmin in codegen without a join or
  * shuffle. The update is ONE shuffle of (cluster, dim) partial sums
  * (map-side combined: each task emits ≤ k·d rows no matter how many
  * vectors it holds), and only the k·d aggregated means ever reach the
  * driver. With k=8, d=64 that is 512 rows per iteration at ANY corpus
  * size — the driver loop is control flow, not data flow.
  */
object Clustering {

  /** Full-pass count at which the (id, vec) projection is worth
    * LAZILY pinning before a Lloyd fit: every seeding scan, every
    * iteration's mean collect, and the final assignment re-reads the
    * projection from source, so a run with many passes trades one
    * vector-array block write (materialized by the first seeding
    * action — zero extra jobs) for pass−1 block reads. At the bench's
    * 4-pass shape (hash seed + 2 iters + assign) the write measured
    * as a wash, so the gate sits above it; realistic iteration counts
    * (Lloyd to stability: 10-25 passes) clear it immediately (r17
    * verdict follow-up #7). */
  val PinPasses = 6

  private def pinIfManyPasses(vecs: DataFrame, passes: Int): DataFrame =
    if (passes >= PinPasses) Materialize.checkpoint(vecs, eager = false)
    else vecs

  /** Squared L2 distance `Σ (v_i − c_i)²` as a sequential left fold —
    * the evaluation order the SQL oracle mirrors term by term. */
  private def dist2(v: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(v, typedLit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** The composable-expression reference form of the assignment
    * argmin: `least` over (dist-fold, index) structs. The hot path is
    * the fused native [[graft.functions.CentroidArgmin]] (identical
    * IEEE accumulation sequence); this chain stays spec-pinned
    * bit-identical to it. */
  def chainBest(vec: Column, centroids: Array[Seq[Double]]): Column = {
    val cands = centroids.zipWithIndex.map { case (c, i) =>
      struct(dist2(vec, c).as("d"), lit(i).as("c"))
    }
    if (cands.length == 1) cands.head else least(cands: _*)
  }

  /** Fit + assign: `iters` Lloyd iterations from md5-seeded initial
    * centroids, returning `(idCol, cluster, dist2)` — dist2 to the
    * final centroid, rounded to 6.
    *
    * Initialization: the k rows with the smallest `md5('km' || id)`
    * (a deterministic pseudo-random draw, portable to any engine with
    * md5), cluster index = rank in that order. Empty clusters keep
    * their previous centroid. Ties in assignment break to the lower
    * cluster index via a struct `least`. */
  /** Farthest-first traversal seeds (the deterministic k-means++
    * shape): seed 0 is the md5-min vector, seed r the vector MAXIMIZING
    * the minimum distance to the seeds chosen so far (ties to the
    * smaller id). k bounded 1-row driver round trips, each a map-only
    * scan + `TakeOrderedAndProject`; the distance chains are the same
    * literal folds the oracle replays, so the whole traversal is
    * engine-portable. Better-spread centroids than the hash draw at
    * the cost of k extra scans. */
  private def farthestFirstSeeds(
      vecs: DataFrame, idCol: String, k: Int): Array[Seq[Double]] = {
    val first = vecs
      .withColumn("__h", md5(concat(lit("km"), col(idCol).cast("string"))))
      .orderBy("__h")
      .limit(1)
      .select("__v")
      .collect()
    require(first.nonEmpty, "corpus is empty")
    val seeds = scala.collection.mutable.ArrayBuffer[Seq[Double]](
      first(0).getSeq[Double](0))
    while (seeds.size < k) {
      val dists = seeds.map(s => dist2(col("__v"), s)).toSeq
      val minDist = if (dists.size == 1) dists.head else least(dists: _*)
      val next = vecs
        .orderBy(minDist.desc, col(idCol))
        .limit(1)
        .select(col("__v"), minDist.as("__d"))
        .collect()
      // A zero max-min-distance pick means every remaining vector
      // coincides with a chosen seed: fewer than k distinct vectors.
      // Fail loudly like hash seeding rather than fit degenerate
      // duplicate centroids.
      require(next(0).getDouble(1) > 0.0,
        s"corpus has fewer than $k distinct vectors")
      seeds += next(0).getSeq[Double](0)
    }
    seeds.toArray
  }

  /** The Lloyd fitting loop, shared by [[lloyd]] and
    * [[lloydCentroids]]: returns the final centroid array. */
  private def fitCentroids(
      vecs: DataFrame,
      idCol: String,
      k: Int,
      iters: Int,
      seeding: String): Array[Seq[Double]] = {
    require(k >= 2, "need at least 2 clusters")
    require(iters >= 1, "need at least one Lloyd iteration")
    require(seeding == "hash" || seeding == "spread",
      "seeding must be 'hash' (md5 draw) or 'spread' (farthest-first)")
    // Bounded driver collects only: k rows (hash) or k × 1 row (spread).
    val init: Array[Seq[Double]] =
      if (seeding == "spread") farthestFirstSeeds(vecs, idCol, k)
      else vecs
        .withColumn("__h", md5(concat(lit("km"), col(idCol).cast("string"))))
        .orderBy("__h")
        .limit(k)
        .select("__v")
        .collect()
        .map(_.getSeq[Double](0))
    require(init.length == k, s"corpus has fewer than $k vectors")
    var centroids = init
    for (_ <- 1 to iters) {
      // One (cluster, dim) shuffle — ≤ k·d rows out of every task.
      val means = vecs
        .withColumn("__best", graft.functions.CentroidArgmin.argmin(
          col("__v"), centroids.map(_.toArray)))
        .select(col("__best.c").as("__c"), posexplode(col("__v")))
        .groupBy("__c", "pos")
        .agg(round(avg("col"), 6).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (prev, i) =>
        byCluster.get(i) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None => prev // empty cluster keeps its centroid
        }
      }
    }
    centroids
  }

  private def vecsOf(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))

  private def assignVecs(
      vecs: DataFrame,
      idCol: String,
      centroids: Array[Seq[Double]]): DataFrame =
    vecs
      .withColumn("__best", graft.functions.CentroidArgmin.argmin(
        col("__v"), centroids.map(_.toArray)))
      .select(
        col(idCol),
        col("__best.c").as("cluster"),
        round(col("__best.d"), 6).as("dist2"))

  def lloyd(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      seeding: String = "hash"): DataFrame = {
    val passes = (if (seeding == "spread") k else 1) + iters + 1
    val vecs = pinIfManyPasses(vecsOf(df, idCol, vecCol), passes)
    assignVecs(vecs, idCol, fitCentroids(vecs, idCol, k, iters, seeding))
  }

  /** The fitted model itself as a PLAIN frame `(cluster, centroid)` —
    * k rows, ready for persistent materialization through the cache
    * layer (the same index-is-a-cache-entry pattern as
    * [[Similarity.buildIvfIndex]]), so later sessions and recrawl
    * batches assign against it without refitting. */
  def lloydCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      seeding: String = "hash"): DataFrame = {
    val passes = (if (seeding == "spread") k else 1) + iters
    val vecs = pinIfManyPasses(vecsOf(df, idCol, vecCol), passes)
    val fitted = fitCentroids(vecs, idCol, k, iters, seeding)
    val spark = df.sparkSession
    import spark.implicits._
    fitted.toSeq.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cluster", "centroid")
  }

  /** Incremental assignment: map each row of `df` to its nearest
    * centroid from a MATERIALIZED centroid frame (`(cluster,
    * centroid)`, e.g. [[lloydCentroids]] read back from a cache
    * table) — the recrawl path: one bounded k-row collect folds the
    * model in as literals and the batch never shuffles. Clusters must
    * be the contiguous 0..k−1 of the fitted model. */
  def assignToCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val rows = centroids
      .select(col("cluster").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1)
    require(rows.nonEmpty, "centroid frame is empty")
    require(rows.map(_._1).toSeq == (0 until rows.length),
      "centroid frame must carry contiguous cluster ids 0..k-1")
    assignVecs(vecsOf(df, idCol, vecCol), idCol, rows.map(_._2))
  }

  /** Per-cluster outlier report: the `topN` vectors FARTHEST from
    * their centroid — the residual-pruning view k-means curation uses
    * to drop noise/off-manifold documents before training. Ordered by
    * the rounded `dist2` (id tiebreak) so the cut is engine-portable;
    * bounded per-group heaps, never a per-cluster sort. */
  def clusterOutliers(
      assignments: DataFrame,
      idCol: String,
      topN: Int): DataFrame =
    graft.plans.GroupedTopK
      .topKPerGroup(
        assignments,
        Seq("cluster"),
        Seq(col("dist2").desc, col(idCol).asc),
        topN)
      .select(col("cluster"), col(idCol), col("dist2"))

  /** Cluster-balanced sample: up to `perCluster` ids from every
    * cluster, drawn by smallest `md5('cs' || id)` — the diversity-
    * preserving selection k-means curation pipelines feed a training
    * mix from. Bounded per-group heaps ([[graft.plans.GroupedTopK]]),
    * never a per-cluster sort. */
  def clusterBalancedSample(
      assignments: DataFrame,
      idCol: String,
      perCluster: Int): DataFrame =
    graft.plans.GroupedTopK
      .topKPerGroup(
        assignments.withColumn(
          "__h", md5(concat(lit("cs"), col(idCol).cast("string")))),
        Seq("cluster"),
        Seq(col("__h").asc),
        perCluster)
      .select(col("cluster"), col(idCol))
}
