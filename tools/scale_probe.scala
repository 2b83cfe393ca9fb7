// Scaling probe: run headline operators at 1x and 10x the sf0.1 corpus
// and report the wall-clock growth ratio. A super-linear ratio (>> 10)
// would expose a hidden quadratic; ~10 or below (overhead amortizes)
// is the expected linear shape.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft._
import graft.operators._
spark.experimental.extraStrategies = Seq(new graft.plans.GroupedTopKStrategy)
spark.conf.set("spark.sql.shuffle.partitions", "32")

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val vecs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

// 10x: union 10 deterministic copies; each copy's text gets a distinct
// suffix token so dedup density stays realistic instead of 90% dupes.
def docsX(f: Int): DataFrame =
  (0 until f).map { i =>
    base.select(
      (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
      concat(col("text"), lit(s" copytag$i")).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }.reduce(_ unionByName _)
def vecsX(f: Int): DataFrame =
  (0 until f).map { i =>
    vecs.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
      col("embedding"))
  }.reduce(_ unionByName _)

def run(df: DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def time(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}

val model = Clustering.lloydCentroids(
  vecs.limit(500), "vec_id", "embedding", k = 4, iters = 2)

def ops(docs: DataFrame, vs: DataFrame): Seq[(String, () => Unit)] = Seq(
  "exact_dedup" -> (() => run(Dedup.dropExactDuplicates(docs, "text", "doc_id"))),
  "line_dedup" -> (() => run(SubstringDedup.lineDedup(
    docs.select(col("doc_id"), array_join(SubstringDedup.tokenChunks(
      split(col("text"), " "), 8), "\n").as("text")),
    "doc_id", "text", maxDf = 2))),
  "anchored_spans" -> (() => run(SubstringDedup.anchoredSpanProfile(
    docs, "doc_id", "text"))),
  "bm25" -> (() => run(Retrieval.bm25(docs, "doc_id", "text",
    Seq("spark", "window"), topK = 20))),
  "pack_offsets" -> (() => run(Packing.tokenShardOffsets(
    docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n")),
    "doc_id", "n", 2048L))),
  "kmeans_assign" -> (() => run(Clustering.assignToCentroids(
    vs, "vec_id", "embedding", model))),
  "minhash_neardup" -> (() => run(Dedup.minHashNearDupPairs(
    docs, "doc_id", "text"))),
  "decontam_13g" -> (() => run(Decontaminate.decontaminate13Gram(
    docs, base.limit(100).withColumn("eval_set", lit(0)),
    "doc_id", "text", "eval_set"))))

def ops2(docs: DataFrame, vs: DataFrame): Seq[(String, () => Unit)] = Seq(
  "winnow_contain" -> (() => run(TextAnalysis.winnowContainmentPairs(
    docs, "doc_id", "text", maxDf = Some(50)))),
  "tfidf" -> (() => run(TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 5))),
  "chunk_dedup_glob" -> (() => run(SubstringDedup.chunkDedupGlobal(
    docs, "doc_id", "text", w = 3))),
  "strip_freq_chunks" -> (() => run(SubstringDedup.stripFrequentChunks(
    docs, "doc_id", "text", 3, 2))),
  "ngram_pairs" -> (() => run(Dedup.ngramJaccardPairs(
    docs, "doc_id", "text", k = 3, threshold = 0.8, maxDf = Some(50)))),
  "curriculum" -> (() => run(Curation.curriculumSample(
    docs, "doc_id", col("n_chars"), Seq(250, 500, 750, 1000)))),
  "budget_select" -> (() => run(Curation.budgetSelect(
    docs.select(col("doc_id"), col("n_chars").as("n")),
    "doc_id", "n", col("n").cast("double"), 100000L))),
  "srp_pairs_uncapped" -> (() => run(Similarity.srpCosinePairs(
    vs, "vec_id", "embedding", threshold = 0.8))),
  "srp_pairs_cap50" -> (() => run(Similarity.srpCosinePairs(
    vs, "vec_id", "embedding", threshold = 0.8, maxBucket = Some(50)))),
  "bigram_lm" -> (() => run(TextAnalysis.bigramLogProbs(
    docs, "doc_id", "text"))),
  "temperature_mix" -> (() => run(Curation.temperatureMix(
    docs, "doc_id", "source", 0.5, 1000L))))


def ops3(docs: DataFrame, vs: DataFrame): Seq[(String, () => Unit)] = Seq(
  "semdedup" -> (() => run(Dedup.semanticDedup(
    vs, "vec_id", "embedding", threshold = 0.45, nClusters = 8))),
  "clean_corpus" -> (() => run(Pipeline.cleanCorpus(docs, "doc_id", "text"))),
  "bpe_learn" -> (() => { Vocab.learnBpeMerges(docs, "text", 5).collect(); () }),
  "edit_pairs_uncapped" -> (() => run(Dedup.editDistancePairs(
    docs, "doc_id", "text", jaccardMin = 0.5))),
  "edit_pairs_cap50" -> (() => run(Dedup.editDistancePairs(
    docs, "doc_id", "text", jaccardMin = 0.5, maxDf = Some(50)))),
  "canonical_pipe" -> (() => run(Dedup.keepCanonical(
    docs, Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, Some(50)),
    "doc_id", Seq(col("n_chars").desc, col("doc_id"))))))

val probeQueries = vecs.limit(16)
  .withColumnRenamed("vec_id", "qid").withColumnRenamed("embedding", "qvec")
def ops4(docs: DataFrame, vs: DataFrame): Seq[(String, () => Unit)] = Seq(
  "brute_topk" -> (() => run(Similarity.bruteForceTopKAgg(
    vs, probeQueries, "vec_id", "embedding", "qid", "qvec", k = 10))),
  "ivf_topk" -> (() => run(Similarity.ivfCosineTopK(
    vs, probeQueries, "vec_id", "embedding", "qid", "qvec", k = 10,
    nLists = 16, nProbe = 2))),
  "int8_topk" -> (() => run(Quantize.int8CosineTopK(
    vs, probeQueries, "vec_id", "embedding", "qid", "qvec", k = 10))),
  "bucketed_pack" -> (() => run(Packing.bucketedPack(
    docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n")), "doc_id", col("n"), 2048))),
  "rare_index" -> (() => run(Vocab.rareNgramIndex(
    docs, "doc_id", "text", k = 3, maxDf = 2))),
  "ann_pairs" -> (() => run(Similarity.annCosinePairs(
    vs, vs.limit(64).withColumnRenamed("vec_id", "qid")
      .withColumnRenamed("embedding", "qvec"),
    "vec_id", "embedding", "qid", "qvec", maxCosDist = 0.3))))

// Warm up everything once at 1x (codegen + JIT), then time 1x and 10x.
val d1 = docsX(1).cache(); d1.count()
val v1 = vecsX(1).cache(); v1.count()
val d10 = docsX(10).cache(); d10.count()
val v10 = vecsX(10).cache(); v10.count()
def all(d: org.apache.spark.sql.DataFrame, v: org.apache.spark.sql.DataFrame) =
  ops(d, v) ++ ops2(d, v) ++ ops3(d, v) ++ ops4(d, v)
all(d1, v1).foreach { case (_, f) => f() }
val t1 = all(d1, v1).map { case (n, f) => n -> time(f()) }.toMap
val t1b = all(d1, v1).map { case (n, f) => n -> time(f()) }.toMap
val t10 = all(d10, v10).map { case (n, f) => n -> time(f()) }.toMap
val t10b = all(d10, v10).map { case (n, f) => n -> time(f()) }.toMap
all(d1, v1).map(_._1).foreach { n =>
  val a = math.min(t1(n), t1b(n)); val b = math.min(t10(n), t10b(n))
  println(f"PROBE $n%-16s 1x=${a}%6.2fs 10x=${b}%6.2fs ratio=${b / a}%5.1f")
}
sys.exit(0)
