package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Similarity}

class QuantizeSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def embs = spark.read
    .parquet(TestSpark.sf0001 + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("int8 codes are in range and dequantize within one step of scale") {
    val q = Quantize.int8Quantize(embs, "embedding")
    val bad = q.select(explode(col("qvec")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(bad == 0, "codes outside [-127, 127]")
    // max |x - q*scale| <= scale/2 (+ float32 noise) per vector
    val err = q.select(max(array_max(zip_with(
      col("embedding").cast("array<double>"), col("qvec"),
      (x, c) => abs(x - c * col("scale")) / col("scale"))))).first.getDouble(0)
    assert(err <= 0.5 + 1e-6, s"max quantization error $err steps")
  }

  test("quantized-shortlist top-k recovers brute-force top-k (exact rerank)") {
    val queries = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(
      embs, queries, "vec_id", "embedding", "qid", "qvec", k = 5)
      .select("qid", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaInt8 = Quantize.int8CosineTopK(
      embs, queries, "vec_id", "embedding", "qid", "qvec", k = 5)
      .select("qid", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect viaInt8).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 shortlist recall $recall < 0.9")
  }
}
