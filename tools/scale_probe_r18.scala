// Round-18 probe: 1x/10x rows for the TOP-10 bench queries' operators
// (VERDICT r17 #1 -- sf0.1 wall-clock is launch-bound, so row-scaling
// ratios are the only local signal left for 100 TB defects).
//
// Sizes are chosen so the 1x run is compute-dominated (seconds, not
// launch latency); a healthy ratio is ~10x or less (sub-linear when a
// fixed vocab/key table bounds a stage). Ratios far above 10x flag a
// super-linear stage. q_semdedup_recall's EXACT side is all-pairs BY
// DESIGN (the ground-truth gate) -- the probe covers semanticDedup, the
// operator meant to scale.
//
// Run via spark-shell with compiled classes (see .claude/skills/verify)
// AND the graft extensions -- keepCanonical/nearDupComponents plan the
// custom GroupedTopK exec, which needs the strategy registered:
//   --conf spark.sql.extensions=graft.functions.GraftSparkExtensions
// Results land as rows in SCALE.md.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators._

spark.conf.set("spark.sql.shuffle.partitions", "32")

def run(df: DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def time(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}
def best(f: => Unit): Double = { f; math.min(time(f), time(f)) }
def settle(): Unit = {
  try spark.sparkContext.getPersistentRDDs.values
    .foreach(_.unpersist(blocking = true))
  catch { case _: Throwable => () }
  spark.catalog.clearCache(); System.gc(); Thread.sleep(1500); System.gc()
}
def probe(name: String, f: Long => Double, n1: Long): Unit = {
  val a = f(n1); settle()
  val b = f(n1 * 10); settle()
  println(f"PROBE $name 1x=$a%.2f 10x=$b%.2f ratio=${b / a}%.1f")
}

// ---- synthetic inputs ------------------------------------------------
// Link graph: fan-out id%4 (0..3, avg 1.5), dst stride 131 -- the
// linkEdges/convEdges synthesis family at probe scale.
def edges(n: Long): DataFrame = spark.range(n)
  .select(col("id").as("src"),
    explode(when(col("id") % 4 > 0, sequence(lit(1L), col("id") % 4))
      .otherwise(array().cast("array<long>"))).as("j"))
  .select(col("src"), ((col("src") + col("j") * 131) % n).as("dst"))

// Near-dup corpus: trios of near-identical docs (ids 3t, 3t+1, 3t+2
// share 39 of 40 words; word vocab is PER-TRIO, so posting lists are
// <= 3 and pair work is linear in docs -- the operator contract, not a
// convenient lie: production near-dup clusters are small because exact
// dedup ran first).
def docs(n: Long): DataFrame = spark.range(n)
  .select(col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(0), lit(39)),
      j => when(j === col("id") % 3,
          concat(lit("u"), col("id").cast("string")))
        .otherwise(concat(lit("g"), (col("id") / 3).cast("string"),
          lit("w"), j.cast("string"))))).as("text"))
  .withColumn("n_chars", length(col("text")))

// Embeddings: 8 well-separated direction clusters (dim 16), small
// deterministic within-cluster jitter -- semantic near-dups within a
// cluster, nothing across.
def embeds(n: Long): DataFrame = spark.range(n)
  .select(col("id").as("vec_id"),
    transform(sequence(lit(0), lit(15)), j =>
      when(j === (col("id") % 8).cast("int") * 2, lit(1.0))
        .otherwise((col("id") % 97).cast("double") / lit(9700.0) *
          when(j % 3 === 0, 1.0).otherwise(-1.0))).as("embedding"))

// semanticDedup's pair stage is Sigma(cell^2) BY CONTRACT -- the caller
// sizes nClusters so cells stay bounded. A first probe draft kept the
// bench's nClusters=8 at 1M vectors (125k-vector cells -> 6e10 cosine
// pairs) and correctly hung: that is an input-contract violation, not
// an operator defect. The probe holds CELL SIZE constant instead
// (nClusters = n/781), so the dedup stage should scale linearly and
// whatever super-linearity remains is the coarse-quantizer fit
// (sample*k*iter distance evals -- the known k-scaling bound of a
// sampled-kmeans quantizer; SCALE.md note). Direction-rich vectors
// (d = trio % 512 picks two spike positions + magnitude) give kmeans
// real structure at any k; trios are the near-dup clusters.
// One pseudo-random sign direction PER TRIO (dim 64): trio members are
// parallel (cosine 1 -- the near-dup cluster), cross-trio cosines
// concentrate near 0 (stddev 1/8, so P(>= 0.45) ~ 2e-4) -- pair volume
// inside a cell stays ~cell^2 COMPARISONS but ~zero emitted rows, and
// no direction ever floods a cell. (A first draft capped directions at
// 512, so at 10x each direction held ~1000 near-parallel vectors and
// the within-cell pair join spilled the disk -- probe-data bug, not an
// operator defect.)
def semEmbeds(n: Long): DataFrame = {
  val d = col("id") / 3
  spark.range(n).select(col("id").as("vec_id"),
    transform(sequence(lit(0), lit(63)), j =>
      when(pmod(d * 31 + j.cast("long") * 17 + (d % 13 + 1) * j * j, lit(97)) < 48,
          lit(1.0)).otherwise(lit(-1.0)) *
        (lit(1.0) + (col("id") % 3).cast("double") / 1000.0))
      .as("embedding"))
}

// ---- probes ----------------------------------------------------------
def pagerank8(n: Long): Double =
  best(run(LinkGraph.pageRank(edges(n), "src", "dst", iterations = 8)))

def conv8(n: Long): Double = best(run(LinkGraph.pageRankConverged(
  edges(n), "src", "dst", tolFp = 0L, maxIterations = 8, segment = 4)._1))

def delta(n: Long): Double = {
  val prev = edges(n).filter(col("dst") % 11 =!= 0)
  val added = edges(n).filter(col("dst") % 11 === 0)
  val removed = edges(n).filter(col("src") % 13 === 0)
  val prior = Materialize.checkpoint(
    LinkGraph.pageRank(prev, "src", "dst", iterations = 2))
  best(run(LinkGraph.pageRankDelta(
    prev, added, removed, "src", "dst", prior, iterations = 2)))
}

def ppr4(n: Long): Double = {
  val seeds = spark.range(n).select(col("id")).filter(col("id") % 17 === 0)
  best(run(LinkGraph.personalizedPageRank(
    edges(n), "src", "dst", seeds, iterations = 4)))
}

def release(n: Long): Double =
  best(run(Pipeline.releaseManifest(docs(n), "doc_id", "text",
    windowLen = 2048L, bpeRounds = 5)))

def canonical(n: Long): Double = {
  val dd = docs(n)
  best(run(Dedup.keepCanonical(
    dd.select("doc_id", "n_chars"),
    Dedup.ngramJaccardPairs(dd, "doc_id", "text", k = 3, threshold = 0.8)
      .select("id_a", "id_b"),
    "doc_id", Seq(col("n_chars").desc, col("doc_id").asc))))
}

def leakfree(n: Long): Double = {
  val dd = docs(n)
  best(run(Dedup.nearDupComponents(
    dd.select("doc_id"),
    Dedup.ngramJaccardPairs(dd, "doc_id", "text", k = 3, threshold = 0.8)
      .select("id_a", "id_b"))))
}

def componentsInc(n: Long): Double = {
  val dd = docs(n)
  val half = dd.filter(col("doc_id") % 2 === 0)
  val prior = Dedup.nearDupComponents(
    half.select("doc_id"),
    Dedup.nearDupPairs(half, "doc_id", "text", k = 3, threshold = 0.8)
      .select("id_a", "id_b"))
  val newPairs = Dedup.nearDupPairs(dd, "doc_id", "text",
    k = 3, threshold = 0.8).select("id_a", "id_b")
  best(run(Dedup.nearDupComponentsIncremental(
    dd.select("doc_id"), prior, newPairs)))
}

def semdedup(n: Long): Double =
  best(run(Dedup.semanticDedup(semEmbeds(n), "vec_id", "embedding",
    threshold = 0.45, nClusters = math.max(8, (n / 469L).toInt))))

def ivfDrift(n: Long): Double = {
  val e = embeds(n)
  val vd = col("embedding").cast("array<double>")
  val nrm = sqrt(aggregate(transform(vd, x => x * x),
    lit(0.0), (a, x) => a + x))
  val centroids = e.filter(col("vec_id") < 8)
    .select(col("vec_id").cast("int").as("cell"),
      transform(vd, x => x / nrm).as("centroid"))
  val base = Similarity.extendIvfIndex(
    e.filter(col("vec_id") % 7 =!= 0), centroids, "vec_id", "embedding")
  val shifted = e.filter(col("vec_id") % 7 === 0)
    .select(col("vec_id"),
      transform(vd, (x, i) => when(i === 0, x + lit(0.5)).otherwise(x))
        .as("embedding"))
  val delta = Similarity.extendIvfIndex(
    shifted, centroids, "vec_id", "embedding")
  best(run(Similarity.quantizerDrift(base, delta, centroids, "embedding")))
}

def frontier(n: Long): Double = {
  import spark.implicits._
  val rules = Seq(
    ("site0.example.com", "/private/", false),
    ("site0.example.com", "/", true),
    ("site1.example.com", "/p", true),
    ("site2.example.com", "/d/", true),
    ("site3.example.com", "/", true),
    ("site4.example.com", "/", true)).toDF("host", "prefix", "allow")
  val policy = Seq(
    ("site0.example.com", 2.0), ("site2.example.com", 5.0))
    .toDF("host", "delay_s")
  val h = (col("id") % 5).cast("string")
  val b = col("id").cast("string")
  val path = when(col("id") % 4 === 0, concat(lit("/private/p"), b))
    .when(col("id") % 4 === 1, concat(lit("/d/"), b))
    .when(col("id") % 4 === 2, concat(lit("/public/p"), b))
    .otherwise(concat(lit("/p"), b))
  val cand = spark.range(n).select(
    concat(lit("http://site"), h, lit(".example.com"), path).as("url"),
    (col("id") % 9973).cast("double").as("priority"))
  val logUrl = when(col("id") % 2 === 0,
      concat(lit("http://site"), h, lit(".example.com/d/"), b))
    .otherwise(concat(lit("http://site"), h, lit(".example.com/p/"),
      (col("id") % 7).cast("string")))
  val fetchLog = spark.range(n).select(logUrl.as("url"))
  best(run(Crawl.frontierPlanGated(
    cand, "url", "priority", rules, fetchLog, "url", policy,
    defaultDelayS = 7.0, maxPerHost = 40, maxUrlsPerTemplate = 50L)))
}

probe("pageRank8", pagerank8, 300000L)
probe("pageRankConverged(max8)", conv8, 300000L)
probe("pageRankDelta", delta, 300000L)
probe("personalizedPageRank4", ppr4, 300000L)
probe("releaseManifest", release, 100000L)
probe("keepCanonical(ngram)", canonical, 100000L)
probe("nearDupComponents(ngram)", leakfree, 100000L)
probe("nearDupComponentsIncremental", componentsInc, 100000L)
probe("semanticDedup(cells~470)", semdedup, 30000L)
probe("quantizerDrift", ivfDrift, 100000L)
probe("frontierPlanGated", frontier, 1000000L)
sys.exit(0)
