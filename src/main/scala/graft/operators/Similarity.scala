package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, the
  * score is a codegen'd expression over the corpus scan (no UDF, no
  * shuffle for scoring; only the final per-query top-k aggregation
  * shuffles, and it shuffles score rows, not vectors).
  *
  * Scale path: `BucketedRandomProjectionLSH` over L2-normalized vectors —
  * on the unit sphere euclidean distance is monotone in cosine
  * (`cos = 1 − d²/2`), so a euclidean LSH bucket join gives
  * approximate-cosine candidates without the n·m scoring pass.
  */
object Similarity {

  /** Dot product of two float/double array columns — native codegen'd
    * expression ([[graft.functions.ArrayDotProduct]]): one primitive
    * loop, no intermediate array allocation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.functions.dotProduct(a, b)

  /** Cosine similarity of two float/double array columns, computed in
    * double in a single fused pass
    * ([[graft.functions.ArrayCosineSimilarity]]). Accumulation order
    * matches a sequential left fold, so values are bit-identical with
    * the composable `zip_with`/`aggregate` form. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.functions.cosineSimilarity(a, b)

  /** All (query, corpus) pairs with cosine ≥ `threshold`. Queries are
    * broadcast; the corpus is scanned once. */
  def cosineThresholdPairs(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      threshold: Double): DataFrame =
    corpus
      .join(broadcast(queries), col(idCol) =!= col(qidCol))
      .withColumn("sim", round(cosine(col(qvecCol), col(vecCol)), 6))
      .filter(col("sim") >= threshold)
      .select(col(qidCol), col(idCol), col("sim"))

  /** Brute-force cosine top-k per query. Deterministic: ranked by
    * (similarity desc, corpus id asc). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col(idCol) =!= col(qidCol))
      .withColumn("sim", round(cosine(col(qvecCol), col(vecCol)), 6))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol).asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rn"))
  }

  private def unitVectors(df: DataFrame, vecCol: String): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val nrm = sqrt(aggregate(transform(vd, x => x * x), lit(0.0), (a, x) => a + x))
    df.withColumn("__unit",
      array_to_vector(transform(vd, x => x / nrm)))
  }

  /** Brute-force cosine top-k via the partial-aggregating
    * [[graft.functions.TopKAggregator]]: every map task pre-reduces its
    * scored rows to ≤ k candidates before the shuffle, so a query group
    * moves O(k × partitions) rows — the window formulation in
    * [[bruteForceTopK]] ships every scored row of a query to a single
    * task (few queries ⇒ few hot partitions). Same output contract. */
  def bruteForceTopKAgg(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col(idCol) =!= col(qidCol))
      .withColumn("sim", round(cosine(col(qvecCol), col(vecCol)), 6))
    val topk = graft.functions.TopKAggregator.topK(k)
    scored
      .groupBy(col(qidCol))
      .agg(topk(col(idCol), col("sim")).as("top"))
      .select(col(qidCol), posexplode(col("top")))
      .select(
        col(qidCol),
        col("col._1").as(idCol),
        col("col._2").as("sim"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** IVF (inverted-file) approximate cosine top-k — the scale path for
    * 100 TB corpora: a k-means coarse quantizer partitions the corpus
    * into `nLists` cells once; each query probes only its `nProbe`
    * nearest cells and reranks exactly inside them, so the scoring pass
    * touches ~nProbe/nLists of the corpus instead of all of it.
    * Centroids are broadcast (nLists rows); the cell assignment is a
    * one-off distributed job (at petabyte scale, fit the quantizer on a
    * sample). Seeded ⇒ deterministic. `nProbe = nLists` degrades to
    * exact brute force. */
  def ivfCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 2,
      seed: Long = 42L,
      maxIter: Int = 8,
      fitSampleFraction: Double = 0.25): DataFrame = {
    val corpusU = unitVectors(corpus, vecCol)
    // A coarse quantizer doesn't need converged centroids — cells just
    // need to partition the space roughly. So: random init (k-means||
    // costs ~5 extra distributed passes for quality we don't need),
    // capped iterations, and the fit runs on a SAMPLE in few partitions
    // — at 100 TB fitting the quantizer on the full corpus is never the
    // plan; only the one-pass cell ASSIGNMENT below must see every row.
    val fitInput =
      (if (fitSampleFraction < 1.0)
         corpusU.sample(withReplacement = false, fitSampleFraction, seed)
       else corpusU)
        .select("__unit").coalesce(8).cache()
    val km = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("__unit").setPredictionCol("__cell")
    val model =
      try km.fit(fitInput)
      finally fitInput.unpersist(blocking = false)
    val assigned = model.transform(corpusU)
      .select(col(idCol), col(vecCol), col("__cell"))
    // Tiny centroid table: (cell, centroid) — broadcast everywhere.
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("__cell", "__centroid")
    // Per query: rank cells by centroid cosine, keep the nProbe nearest.
    val wCell = Window.partitionBy(col(qidCol))
      .orderBy(cosine(col(qvecCol), col("__centroid")).desc, col("__cell").asc)
    val probed = queries
      .join(broadcast(centroids))
      .withColumn("__cellrank", row_number().over(wCell))
      .filter(col("__cellrank") <= nProbe)
      .select(col(qidCol), col(qvecCol), col("__cell"))
    // Exact rerank inside the probed cells only.
    val scored = assigned
      .join(broadcast(probed), Seq("__cell"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", round(cosine(col(qvecCol), col(vecCol)), 6))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol).asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rn"))
  }

  /** LSH-bucketed candidate PAIRS with approximate cosine ≥ 1 −
    * `maxCosDist`: unit-normalize both sides, euclidean-LSH bucket join,
    * convert distance back to cosine. Returns `(id_a, id_b, sim)` —
    * the building block for semantic dedup self-joins. Seeded ⇒
    * deterministic. */
  def annCosinePairs(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      maxCosDist: Double,
      numHashTables: Int = 4,
      bucketLength: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val corpusU = unitVectors(corpus, vecCol).select(col(idCol).as("__idb"), col("__unit"))
    val queriesU = unitVectors(queries, qvecCol).select(col(qidCol).as("__ida"), col("__unit"))
    val brp = new BucketedRandomProjectionLSH()
      .setInputCol("__unit").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = brp.fit(corpusU)
    val maxEuclid = math.sqrt(2.0 * maxCosDist)
    model
      .approxSimilarityJoin(queriesU, corpusU, maxEuclid, "euclid")
      .select(
        col("datasetA.__ida").as("id_a"),
        col("datasetB.__idb").as("id_b"),
        round(lit(1.0) - col("euclid") * col("euclid") / 2.0, 6).as("sim"))
  }

  /** LSH-bucketed approximate cosine top-k: normalize to the unit
    * sphere, euclidean-LSH join within `maxCosDist` (cosine ≥ 1 −
    * maxCosDist), then exact rerank per query. Seeded ⇒ deterministic
    * bucketing. */
  def annCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      maxCosDist: Double = 0.8,
      numHashTables: Int = 4,
      bucketLength: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val corpusU = unitVectors(corpus, vecCol).select(col(idCol), col("__unit"))
    val queriesU = unitVectors(queries, qvecCol).select(col(qidCol), col("__unit"))
    val brp = new BucketedRandomProjectionLSH()
      .setInputCol("__unit").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = brp.fit(corpusU)
    // cos = 1 - d^2/2 on unit vectors => d = sqrt(2*(1-cos))
    val maxEuclid = math.sqrt(2.0 * maxCosDist)
    val joined = model
      .approxSimilarityJoin(queriesU, corpusU, maxEuclid, "euclid")
      .filter(col(s"datasetA.$qidCol") =!= col(s"datasetB.$idCol"))
      .select(
        col(s"datasetA.$qidCol").as(qidCol),
        col(s"datasetB.$idCol").as(idCol),
        round(lit(1.0) - col("euclid") * col("euclid") / 2.0, 6).as("sim"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol).asc)
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rn"))
  }
}
