// Round-17 probe: 1x/10x rows for the selection/budget compositions.
//  - thresholdSelectBy: corpus collapses to <= keys x (10^scale + 1)
//    grid rows in ONE keyed partial-agg exchange; the sweep windows
//    and argmax run on that bounded grid, so wall should track the
//    single corpus pass (the rocAucBy shape).
//  - applyThresholdBy: broadcast O(keys) thresholds, corpus map-only.
//  - hostQuality -> hostFetchBudget: one host-keyed partial-agg
//    exchange, then apportionment windows over the host TABLE only.
// 1000 keys throughout. Run via spark-shell with compiled classes
// (see .claude/skills/verify); results land as rows in SCALE.md.
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
  spark.catalog.clearCache(); System.gc(); Thread.sleep(2000); System.gc()
}

// n scored rows across 1000 keys; ~997 distinct raw scores per key.
def scored(n: Long): DataFrame =
  spark.range(n).select(
    concat(lit("src"), (col("id") % 1000).cast("string")).as("source"),
    ((col("id") % 997).cast("double") / 997.0).as("score"),
    (col("id") % 3 === 0).as("label"))

def selectBy(n: Long): Double = best(run(
  QualityModel.thresholdSelectBy(scored(n), "source", "score", "label")))
def applyBy(n: Long): Double = {
  val thr = Materialize.checkpoint(QualityModel.thresholdSelectBy(
    scored(n / 10), "source", "score", "label"))
  best(run(QualityModel.applyThresholdBy(
    scored(n), "source", "score", thr)))
}
// per-doc host + verdict + mass -> census -> Hamilton slots
def hostBudget(n: Long): Double = {
  val docs = spark.range(n).select(
    concat(lit("h"), (col("id") % 1000).cast("string")).as("host"),
    (col("id") % 7 =!= 0).as("pass"),
    (col("id") % 1000 + 100).as("mass"))
  best(run(Crawl.hostFetchBudget(
    Crawl.hostQuality(docs, "host", col("pass"), col("mass")),
    budget = 1000000000L)))
}

val n1 = 2000000L
val n10 = 20000000L
println(f"PROBE thresholdSelectBy 1x=${selectBy(n1)}%.2f 10x=${selectBy(n10)}%.2f")
settle()
println(f"PROBE applyThresholdBy 1x=${applyBy(n1)}%.2f 10x=${applyBy(n10)}%.2f")
settle()
println(f"PROBE hostQuality+hostFetchBudget 1x=${hostBudget(n1)}%.2f 10x=${hostBudget(n10)}%.2f")
sys.exit(0)
