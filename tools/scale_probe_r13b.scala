// Round-13 probe (b): 1x/10x wall-clock ratios for the incremental
// operators -- pageRankDelta (edge patch + 2 warm iterations) and
// mirrorClustersIncremental (new-pair mining + contracted closure).
// Dense-id synthesis at both scales (the r12 probe discipline); the
// prior state (ranks / cluster table) is built and checkpointed
// UNTIMED -- a recrawl inherits it from the previous release, so only
// the per-recrawl work is on the clock.
// Run via spark-shell with compiled classes; results land in SCALE.md.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators._

spark.conf.set("spark.sql.shuffle.partitions", "32")

def ids(n: Long): DataFrame = spark.range(n).select(col("id").as("doc_id"))
def run(df: DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def time(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}
def minOf2(f: => Unit): Double = { val a = time(f); val b = time(f); math.min(a, b) }

// --- pageRankDelta: the q_pagerank_delta synthesis on dense ids ---
def prevE(n: Long): DataFrame = {
  val m2 = least(col("doc_id") % 4, lit(2L))
  ids(n).select(col("doc_id").as("src"),
      explode(when(m2 > 0, sequence(lit(1L), m2))
        .otherwise(array().cast("array<long>"))).as("j"))
    .select(col("src"), ((col("src") + col("j") * 131) % n).as("dst"))
    .unionByName(ids(n).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("src"), ((col("doc_id") + 977) % n).as("dst")))
}
def addE(n: Long): DataFrame = ids(n).filter(col("doc_id") % 4 === 3)
  .select(col("doc_id").as("src"), ((col("doc_id") + 393) % n).as("dst"))
def remE(n: Long): DataFrame = ids(n).filter(col("doc_id") % 5 === 0)
  .select(col("doc_id").as("src"), ((col("doc_id") + 977) % n).as("dst"))

// Warm the class graph once.
run(LinkGraph.pageRankDelta(prevE(5000L), addE(5000L), remE(5000L),
  "src", "dst", LinkGraph.pageRank(prevE(5000L), "src", "dst", 1), 1))

println("== pageRankDelta (patch + 2 warm iterations) ==")
for (n <- Seq(200000L, 2000000L)) {
  val prior = Materialize.checkpoint(
    LinkGraph.pageRank(prevE(n), "src", "dst", 2))
  val t = minOf2(run(LinkGraph.pageRankDelta(
    prevE(n), addE(n), remE(n), "src", "dst", prior, iterations = 2)))
  println(f"PRDELTA n=$n%d t=$t%.2f s")
}

// --- mirrorClustersIncremental: host triples scale with the corpus ---
def corpus(n: Long, hosts: Long, third: Boolean): DataFrame = {
  val k = (col("doc_id") % hosts).cast("string")
  val base = ids(n).select(col("doc_id"),
    concat(lit("text "), col("doc_id").cast("string")).as("text"))
  val two = base.select(col("doc_id"),
      concat(lit("h"), k, lit(".example.com")).as("host"), col("text"))
    .unionByName(base.filter(col("doc_id") % 3 === 0).select(col("doc_id"),
      concat(lit("m"), k, lit(".example.com")).as("host"), col("text")))
  if (!third) two.select(col("host"), col("text"))
  else two.unionByName(base.filter(col("doc_id") % 6 === 0)
      .select(col("doc_id"),
        concat(lit("w"), k, lit(".example.com")).as("host"), col("text")))
    .select(col("host"), col("text"))
}

println("== mirrorClustersIncremental (pair mining + contracted closure) ==")
for (n <- Seq(200000L, 2000000L)) {
  val hosts = n / 20000L // host triples scale with the corpus
  val prior = Materialize.checkpoint(Crawl.mirrorClusters(
    corpus(n, hosts, third = false), "host", "text",
    maxDf = 5, minShared = 3))
  val three = corpus(n, hosts, third = true)
  val t = minOf2 {
    val pairs = Crawl.mirrorHosts(three, "host", "text",
      maxDf = 5, minShared = 3)
    run(Crawl.mirrorClustersIncremental(
      three.select(col("host")), prior, pairs))
  }
  println(f"MIRRINC n=$n%d hosts=${hosts * 3}%d t=$t%.2f s")
}

println("R13B-PROBE-DONE")
sys.exit(0)
