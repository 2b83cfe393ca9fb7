package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Symmetric int8 quantization for embedding columns — the
  * storage/bandwidth lever for vector search at corpus scale: an
  * `array<float>` column shrinks 4× (and int dot products are
  * SIMD-friendly), which at 100 TB of embeddings is the difference in
  * what a shuffle or a broadcast costs. Per-vector scale (max-abs), so
  * quantization is a pure per-row projection: no shuffle, no state.
  *
  * Rounding is `floor(x·s + 0.5)` rather than `round` — floor is
  * defined identically in every engine (Spark's `round` half-up on
  * shortest-decimal vs DuckDB's true-double rounding diverge at .5
  * boundaries), so the quantized values are bit-reproducible
  * cross-engine and the oracle can check them exactly.
  */
object Quantize {

  /** `(scale, qvec)` for one vector: `scale = maxabs/127`,
    * `q_i = floor(x_i/scale + 0.5)` clamped to [-127, 127]
    * (symmetric: -128 unused). Zero vectors get scale 0 and all-zero
    * codes. */
  def int8(vec: Column): (Column, Column) = {
    val vd = vec.cast("array<double>")
    val maxAbs = array_max(transform(vd, x => abs(x)))
    val scale = maxAbs / lit(127.0)
    val q = when(maxAbs === 0.0, transform(vd, _ => lit(0)))
      .otherwise(transform(vd, x =>
        greatest(lit(-127),
          least(lit(127), floor(x / scale + lit(0.5)).cast("int")))))
    (scale, q)
  }

  /** Projection form: adds `scale` (double) + `qvec` (array<int>). */
  def int8Quantize(df: DataFrame, vecCol: String): DataFrame = {
    val (scale, q) = int8(col(vecCol))
    df.withColumn("scale", scale).withColumn("qvec", q)
  }

  /** Approximate cosine top-k over QUANTIZED vectors with an exact
    * float rerank of the final k: the integer dot product ranks a
    * shortlist of `shortlist ≥ k` candidates per query (cheap: int8
    * arithmetic over 4× less data), then only the shortlist's raw
    * vectors are scored with the exact fused cosine. Quantized cosine
    * error is ≤ ~1%, so `shortlist = 4k` recovers the true top-k on
    * real distributions (spec-checked against brute force); rows-only
    * at the corpus level because the shortlist is approximate. */
  def int8CosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      shortlistFactor: Int = 4): DataFrame = {
    val cq = int8Quantize(corpus, vecCol)
      .select(col(idCol), col(vecCol), col("qvec").as("__cq"))
    val qq = int8Quantize(queries, qvecCol)
      .select(col(qidCol), col(qvecCol), col("qvec").as("__qq"))
    // Integer dot product over the codes is monotone in the quantized
    // cosine once both sides are unit-scaled by their own maxabs — the
    // per-vector scales cancel in the ranking within a query only up to
    // the corpus vector's norm, so normalize by the int self-norms.
    val qdot = Similarity.dot(col("__cq").cast("array<double>"),
      col("__qq").cast("array<double>"))
    val qnorm = (c: Column) =>
      sqrt(aggregate(transform(c.cast("array<double>"), x => x * x),
        lit(0.0), (a, x) => a + x))
    val scored = cq
      .join(broadcast(qq), col(idCol) =!= col(qidCol))
      .withColumn("__qsim", qdot / (qnorm(col("__cq")) * qnorm(col("__qq"))))
    val wShort = Window.partitionBy(col(qidCol))
      .orderBy(col("__qsim").desc, col(idCol).asc)
    val shortlist = scored
      .withColumn("__srn", row_number().over(wShort))
      .filter(col("__srn") <= k * shortlistFactor)
    // Exact rerank of the shortlist only.
    val wFinal = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    shortlist
      .withColumn("sim", round(Similarity.cosine(col(qvecCol), col(vecCol)), 6))
      .withColumn("rn", row_number().over(wFinal))
      .filter(col("rn") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rn"))
  }
}
