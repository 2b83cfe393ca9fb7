package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base = spark.read
    .parquet(TestSpark.sf001 + "/documents.parquet")
    .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))

  test("tokenShards equals the single-task global-window formulation") {
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    val expected = base
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .withColumn("shard", floor((col("cum") - col("n_tok")) / lit(2048.0)))
      .select("doc_id", "n_tok", "shard")
    val got = Packing.tokenShards(base, "doc_id", "n_tok", 2048L)
      .select("doc_id", "n_tok", "shard")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("shards are contiguous in key order and within token bounds") {
    val shards = Packing.tokenShards(base, "doc_id", "n_tok", 2048L)
    // The straddle property needs each shard's LAST document's tokens:
    // a doc may push a shard past the budget only if it is the final
    // (straddling) one.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("doc_id").desc)
    val lastTok = shards
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("shard"), col("n_tok").cast("long").as("last_tok"))
    val ranges = shards.groupBy("shard")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"),
        sum(col("n_tok").cast("long")).as("tok"))
      .join(lastTok, "shard")
      .orderBy("shard")
      .collect()
    // Contiguity: per shard, the doc_id ranges must not interleave —
    // max(doc_id) of shard s < min(doc_id) of shard s+1.
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"shard ${a.getLong(0)} hi=${a.getLong(2)} overlaps " +
            s"shard ${b.getLong(0)} lo=${b.getLong(1)}")
      case _ => ()
    }
    // Budget: tokens minus the last (straddling) doc's tokens < budget
    // for every shard — i.e. no shard was already over budget BEFORE
    // its final document arrived.
    ranges.foreach { r =>
      assert(r.getLong(3) - r.getLong(4) < 2048L,
        s"shard ${r.getLong(0)} holds ${r.getLong(3)} tokens, " +
          s"${r.getLong(3) - r.getLong(4)} before its last doc — over budget")
    }
    assert(ranges.forall(_.getLong(3) > 0))
  }

  test("weightedMix interleaves sources at their weights") {
    val docs = spark.read.parquet(TestSpark.sf001 + "/documents.parquet")
    val embs = spark.read.parquet(TestSpark.sf001 + "/embeddings.parquet")
      .withColumnRenamed("vec_id", "doc_id")
    val mixed = Packing.weightedMix(
      Seq(("docs", docs, 0.7), ("embs", embs, 0.3)), "doc_id")
    // In any pos-ordered prefix long enough to smooth boundary effects,
    // source proportions track the weights (normalized by source sizes:
    // a source is exhausted when rank > n, so test within range).
    val head = mixed.orderBy("pos").limit(200).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracDocs = head.getOrElse("docs", 0L).toDouble / 200
    assert(math.abs(fracDocs - 0.7) < 0.05, s"docs fraction $fracDocs, want ~0.7")
    // Every source row appears exactly once.
    assert(mixed.count() == docs.count() + embs.count())
  }

  test("bucketedPack equals the per-bucket-window formulation") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    val withBucket = base
      .withColumn("n", col("n_tok").cast("long"))
      .withColumn("bucket", length(bin(col("n"))).cast("int"))
    val expected = withBucket
      .withColumn("cb", sum("n").over(w) - col("n"))
      .select(col("doc_id"), col("bucket"), col("n"),
        expr("cb DIV 256").as("bin"), (col("cb") % 256).as("bin_offset"))
    val got = Packing.bucketedPack(base, "doc_id", col("n_tok"), 256)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("bucketedPack bins start at zero offset and stay under contextLen") {
    val packed = Packing.bucketedPack(base, "doc_id", col("n_tok"), 256)
    assert(packed.filter(col("bin_offset") < 0 ||
      col("bin_offset") >= 256).count() == 0)
    // Each bucket's first doc (lowest id) sits at bin 0, offset 0.
    val firsts = packed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("bin") =!= 0 || col("bin_offset") =!= 0)
      .count() == 0)
  }

  test("groupedPack with an arbitrary group equals the per-group-window formulation") {
    // Group by source (bounded cardinality like a cluster id) instead
    // of the derived length bucket.
    val df = spark.read
      .parquet(TestSpark.sf001 + "/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    val expected = df
      .withColumn("n", col("n_tok").cast("long"))
      .withColumn("cb", sum("n").over(w) - col("n"))
      .select(col("doc_id"), col("source"), col("n"),
        expr("cb DIV 128").as("bin"), (col("cb") % 128).as("bin_offset"))
    val got = Packing.groupedPack(
      df, "doc_id", col("source"), "source", col("n_tok"), 128)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // Bin numbering restarts per group: every group has a bin 0.
    val groups = df.select("source").distinct.count()
    assert(got.filter(col("bin") === 0).select("source").distinct
      .count() == groups)
  }

  test("startTokens continuation: A-then-B packing is append-only and boundary-exact") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(TestSpark.sf0001 + "/documents.parquet")
      .select(col("doc_id"),
        operators.TextAnalysis.tokenCount(col("text")).as("n"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val packedA = operators.Packing
      .tokenShardOffsets(a, "doc_id", "n", 512L)
    val maxShardA = packedA.agg(max(col("shard"))).collect()(0).getLong(0)
    val packedB = operators.Packing.tokenShardOffsets(
      b, "doc_id", "n", 512L, startTokens = (maxShardA + 1L) * 512L)
    // B opens a FRESH shard after A's last: disjoint, contiguous start.
    val minShardB = packedB.agg(min(col("shard"))).collect()(0).getLong(0)
    assert(minShardB == maxShardA + 1L,
      s"B must start at shard ${maxShardA + 1}, got $minShardB")
    // The first B document sits at offset 0 of that shard.
    val firstB = packedB.orderBy("doc_id").limit(1)
      .select("shard", "tok_offset").collect()(0)
    assert(firstB.getLong(0) == maxShardA + 1L && firstB.getLong(1) == 0L)
    // Continuation with startTokens = 0 is plain packing (same frame).
    val plain = operators.Packing.tokenShardOffsets(b, "doc_id", "n", 512L)
      .orderBy("doc_id").collect().toSeq
    val shifted = packedB.orderBy("doc_id").collect().toSeq
    assert(plain.size == shifted.size)
  }

  test("releaseIncremental: recrawl dedups against the release, shards append") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val reference = docs.filter(col("doc_id") % 3 === 0)
    val prior = operators.Pipeline.releaseManifest(
      reference, "doc_id", "text", windowLen = 512L, bpeRounds = 3)
    val maxPrior = prior.agg(max(col("shard"))).collect()(0).getLong(0)
    // Batch: the other docs PLUS an exact copy of a released document
    // (new id, same text) — the copy must be dropped by the reference
    // dedup even though its id is new.
    val copied = reference.limit(1)
      .select(lit(999999L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(copied)
    val inc = operators.Pipeline.releaseIncremental(
      batch, reference, prior, "doc_id", "text",
      windowLen = 512L, bpeRounds = 3)
    val ids = inc.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(999999L), "copied released doc must be dropped")
    assert(ids.nonEmpty)
    val minShard = inc.agg(min(col("shard"))).collect()(0).getLong(0)
    assert(minShard == maxPrior + 1L,
      s"incremental shards must append after $maxPrior, got $minShard")
  }

  test("no single-task global window in the plan") {
    val plan = Packing.tokenShards(base, "doc_id", "n_tok", 2048L)
      .queryExecution.executedPlan.toString
    // A global window would appear as an empty partition spec; ours
    // partitions by the frozen range-partition id.
    assert(!plan.contains("Window [sum") || plan.contains("__pid"),
      s"global window detected:\n$plan")
  }
}
