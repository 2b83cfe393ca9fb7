// Round-11 extension of tools/scale_probe.scala: 1x/10x wall-clock
// ratios for the operator families added in rounds 10-11 that the
// original probe predates -- the MinHash band index (build + probe +
// incremental near-dup), grouped/in-context packing, the extraction
// front (NFC normalize + markup strip), the incremental release, and
// the round-11 crawl-front URL family + paragraph dedup. Run via
// spark-shell with compiled classes (see .claude/skills/verify);
// results land as rows in SCALE.md.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft._
import graft.operators._
spark.experimental.extraStrategies = Seq(new graft.plans.GroupedTopKStrategy)
spark.conf.set("spark.sql.shuffle.partitions", "32")

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def docsX(f: Int): DataFrame =
  (0 until f).map { i =>
    base.select(
      (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
      concat(col("text"), lit(s" copytag$i")).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }.reduce(_ unionByName _)

def run(df: DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def time(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}

// Deterministic messy-URL synthesis (the q_url_* construction).
def withUrl(df: DataFrame): DataFrame = {
  val bs = floor(col("doc_id") / 4).cast("long")
  val v = col("doc_id") % 4
  val h = (bs % 7).cast("string")
  val b = bs.cast("string")
  val url = when(v === 0, concat(
      lit("HTTP://WWW.Site"), h, lit(".EXAMPLE.COM:80/a/"), b,
      lit("/?id="), b, lit("&utm_source=feed")))
    .when(v === 1, concat(
      lit("http://site"), h, lit(".example.com/a/"), b, lit("?id="), b))
    .when(v === 2, concat(
      lit("http://site"), h, lit(".example.com:80/a/"), b,
      lit("/index.html?id="), b, lit("#sec-2")))
    .otherwise(concat(
      lit("HTTPS://site"), h, lit(".example.com:443/b/"), b))
  df.select(col("doc_id"), col("n_chars"), url.as("url"))
}

def reflow(df: DataFrame, w: Int, sep: String): DataFrame =
  df.select(col("doc_id"), array_join(
    SubstringDedup.tokenChunks(split(col("text"), " "), w), sep).as("text"))

// Fixed-size rule/policy tables for the round-11 crawl gates (both
// broadcast; the corpus is the 1x/10x variable).
val robotsRules = spark.range(7)
  .selectExpr("concat('site', id, '.example.com') as host")
  .crossJoin(Seq(("/a/", false), ("/a/1", true), ("/b/", false))
    .toDF("prefix", "allow"))
val frontierPolicy = spark.range(4).selectExpr(
  "concat('site', id, '.example.com') as host",
  "cast(id + 1 as double) as delay_s")

def ops(docs: DataFrame, index: DataFrame, batch: DataFrame,
        priorManifest: DataFrame): Seq[(String, () => Unit)] = Seq(
  "band_index_build" -> (() => run(
    Dedup.buildMinHashBandIndex(docs, "doc_id", "text"))),
  "band_index_probe" -> (() => run(
    Dedup.minHashPairsAgainstIndex(batch, index, "doc_id", "text",
      maxBucket = Some(50)))),
  "near_dup_vs_index" -> (() => run(
    Dedup.nearDupAgainstIndex(batch, index, "doc_id", "text",
      maxBucket = Some(50)))),
  "grouped_pack" -> (() => run(Packing.groupedPack(
    docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("n")),
    "doc_id", col("source"), "grp", col("n"), 2048))),
  "nfc_normalize" -> (() => run(docs.select(col("doc_id"),
    TextAnalysis.normalizeText(
      regexp_replace(col("text"), "a", "a\u0301")).as("t")))),
  "html_strip" -> (() => run(docs.select(col("doc_id"),
    TextAnalysis.stripMarkup(concat(lit("<div>"), col("text"),
      lit("</div>"))).as("t")))),
  "release_incr" -> (() => run(Pipeline.releaseIncremental(
    batch, docs, priorManifest, "doc_id", "text",
    windowLen = 2048L, bpeRounds = 3))),
  "url_canon" -> (() => run(withUrl(docs).select(col("doc_id"),
    Crawl.canonicalizeUrl(col("url")).as("c")))),
  "url_dedup" -> (() => run(Crawl.urlDedup(withUrl(docs), "url",
    Seq(col("n_chars").desc, col("doc_id"))))),
  "host_report" -> (() => run(Crawl.hostReport(withUrl(docs), "url"))),
  "robots_filter" -> (() => run(Crawl.robotsFilter(
    withUrl(docs), "url", "doc_id", robotsRules))),
  "frontier_plan" -> (() => run(Crawl.frontierPlan(
    withUrl(docs), "url", "n_chars", frontierPolicy, 5.0, 1000))),
  "para_dedup" -> (() => run(SubstringDedup.paraDedup(
    reflow(docs, 24, "\n\n"), "doc_id", "text", maxDf = 2))))

val d1 = docsX(1).cache(); d1.count()
val d10 = docsX(10).cache(); d10.count()
// Probe batch: a FIXED-size recrawl batch at both scales (the real
// shape: batch small, reference/index grows) -- the index is the 1x/10x
// variable. Index materialized (cached) so probe timings exclude build.
val batch = base.limit(2000).cache(); batch.count()
val ix1 = Dedup.buildMinHashBandIndex(d1, "doc_id", "text").cache(); ix1.count()
val ix10 = Dedup.buildMinHashBandIndex(d10, "doc_id", "text").cache(); ix10.count()
// Prior manifest for the incremental release: the packed reference.
val pm1 = Packing.tokenShardOffsets(
  d1.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n")),
  "doc_id", "n", 2048L).cache(); pm1.count()
val pm10 = Packing.tokenShardOffsets(
  d10.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n")),
  "doc_id", "n", 2048L).cache(); pm10.count()

ops(d1, ix1, batch, pm1).foreach { case (_, f) => f() } // warm codegen/JIT
val t1 = ops(d1, ix1, batch, pm1).map { case (n, f) => n -> time(f()) }.toMap
val t1b = ops(d1, ix1, batch, pm1).map { case (n, f) => n -> time(f()) }.toMap
val t10 = ops(d10, ix10, batch, pm10).map { case (n, f) => n -> time(f()) }.toMap
val t10b = ops(d10, ix10, batch, pm10).map { case (n, f) => n -> time(f()) }.toMap
ops(d1, ix1, batch, pm1).map(_._1).foreach { n =>
  val a = math.min(t1(n), t1b(n)); val b = math.min(t10(n), t10b(n))
  println(f"PROBE $n%-18s 1x=${a}%6.2fs 10x=${b}%6.2fs ratio=${b / a}%5.1f")
}
sys.exit(0)
