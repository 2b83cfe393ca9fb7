// Round-11 probe, part 2: 1x/10x wall-clock ratios for the link-graph
// family (fixed-point PageRank, degree/locality report). Edges grow
// linearly with the corpus (1.5 per doc); PageRank runs 4 iterations,
// so the expected shape is ~linear with a constant-factor iteration
// count. Run via spark-shell with compiled classes (see
// .claude/skills/verify); results land as rows in SCALE.md.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft._
import graft.operators._
spark.experimental.extraStrategies = Seq(new graft.plans.GroupedTopKStrategy)
spark.conf.set("spark.sql.shuffle.partitions", "32")

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def idsX(f: Int): DataFrame =
  (0 until f).map { i =>
    base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"))
  }.reduce(_ unionByName _)

// The q_pagerank synthesis: doc u -> (u + j*131) % maxId, j in 1..u%4.
def edges(ids: DataFrame, maxId: Long): DataFrame = {
  val m = col("doc_id") % 4
  ids.select(col("doc_id").as("src"),
      explode(when(m > 0, sequence(lit(1L), m))
        .otherwise(array().cast("array<long>"))).as("j"))
    .select(col("src"), ((col("src") + col("j") * 131) % maxId).as("dst"))
}

def run(df: DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def time(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}

val e1 = edges(idsX(1), 600000L).cache(); e1.count()
val e10 = edges(idsX(10), 6000000L).cache(); e10.count()

def withHosts(e: DataFrame): DataFrame = e.select(
  col("src"), col("dst"),
  concat(lit("site"), (col("src") % 7).cast("string")).as("sh"),
  concat(lit("site"), (col("dst") % 7).cast("string")).as("dh"))

// Three-word synthetic anchors with term variety (src mod buckets).
def withAnchor(e: DataFrame): DataFrame = e.select(
  col("dst"),
  concat(lit("word"), (col("src") % 997).cast("string"),
    lit(" link"), (col("src") % 31).cast("string"),
    lit(" page")).as("anchor"))

// Trap/mirror inputs derived from the same id space: half the ids make
// one-URL-per-id trap paths, half cycle 97 stable pages; every third
// id mirrors its content digest onto a partner host.
def trapUrls(ids: DataFrame): DataFrame = ids.select(
  when(col("doc_id") % 2 === 0, concat(
      lit("http://site"), (col("doc_id") % 23).cast("string"),
      lit(".example.com/d/"), col("doc_id").cast("string")))
    .otherwise(concat(
      lit("http://site"), (col("doc_id") % 23).cast("string"),
      lit(".example.com/p/"), (col("doc_id") % 97).cast("string")))
    .as("url"))
def mirrorFetches(ids: DataFrame): DataFrame = {
  val k = (col("doc_id") % 50).cast("string")
  val t = concat(lit("content body "), col("doc_id").cast("string"))
  ids.select(concat(lit("h"), k).as("host"), t.as("text"))
    .unionByName(ids.filter(col("doc_id") % 3 === 0)
      .select(concat(lit("m"), k).as("host"), t.as("text")))
}

def ops(e: DataFrame): Seq[(String, () => Unit)] = Seq(
  "pagerank_4it" -> (() => run(
    LinkGraph.pageRank(e, "src", "dst", iterations = 4))),
  "degree_report" -> (() => run(
    LinkGraph.degreeReport(withHosts(e), "src", "dst", "sh", "dh"))),
  "anchor_terms" -> (() => run(
    LinkGraph.anchorTerms(withAnchor(e), "dst", "anchor", k = 3))))

def ops2(ids: DataFrame): Seq[(String, () => Unit)] = Seq(
  "url_traps" -> (() => run(
    Crawl.urlTemplateReport(trapUrls(ids), "url", 1000))),
  "mirror_hosts" -> (() => run(
    Crawl.mirrorHosts(mirrorFetches(ids), "host", "text",
      maxDf = 5, minShared = 3))),
  "mirror_clusters" -> (() => run(
    Crawl.mirrorClusters(mirrorFetches(ids), "host", "text",
      maxDf = 5, minShared = 3))),
  "host_quality" -> (() => {
    val docs = ids.select(
      concat(lit("site"), (col("doc_id") % 23).cast("string")).as("host"),
      concat(lit("body text segment "), (col("doc_id") % 997).cast("string"),
        lit(" with some repeated repeated filler words to score")).as("text"))
    val top2 = TextAnalysis.gopherRepetition(col("text"), 2).head
    val top3 = TextAnalysis.gopherRepetition(col("text"), 3).head
    val dup5 = TextAnalysis.gopherRepetition(col("text"), 5)(1)
    run(docs.select(col("host"),
        (top2 < 0.20 && top3 < 0.18 && dup5 < 0.15).cast("double").as("p"),
        TextAnalysis.tokenCount(col("text")).cast("double").as("nt"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"), avg(col("p")).as("pass_rate"),
        avg(col("nt")).as("mean_tokens")))
  }))

val i1 = idsX(1).cache(); i1.count()
val i10 = idsX(10).cache(); i10.count()

def all1 = ops(e1) ++ ops2(i1)
def all10 = ops(e10) ++ ops2(i10)
all1.foreach { case (_, f) => f() } // warm codegen/JIT
val t1 = all1.map { case (n, f) => n -> time(f()) }.toMap
val t1b = all1.map { case (n, f) => n -> time(f()) }.toMap
val t10 = all10.map { case (n, f) => n -> time(f()) }.toMap
val t10b = all10.map { case (n, f) => n -> time(f()) }.toMap
all1.map(_._1).foreach { n =>
  val a = math.min(t1(n), t1b(n)); val b = math.min(t10(n), t10b(n))
  println(f"PROBE $n%-18s 1x=${a}%6.2fs 10x=${b}%6.2fs ratio=${b / a}%5.1f")
}
sys.exit(0)
