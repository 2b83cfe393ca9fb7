// Round-16 probe: 1x/10x rows for the keyed scorer observability
// family -- each pass collapses the corpus to <= keys x bins (or
// keys x distinct-score) post-aggregate rows in ONE keyed
// partial-aggregating exchange, then every verdict join broadcasts on
// O(keys) rows, so wall should grow with the single corpus pass, not
// the key count. 1000 keys throughout (the production shape: one key
// per crawl source / language). Run via spark-shell with compiled
// classes (see .claude/skills/verify); results land as rows in
// SCALE.md.
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
// the previous release: the even half, same scoring
def prevOf(n: Long): DataFrame =
  scored(n).filter(crc32(col("source")) % 2 === 0)

def aucBy(n: Long): Double = best(run(
  QualityModel.rocAucBy(scored(n), "source", "score", "label")))
def psiBy(n: Long): Double = best(run(
  QualityModel.populationStabilityBy(
    prevOf(n), scored(n), "source", "score")))
def gateBy(n: Long): Double = best(run(
  QualityModel.scorerGateBy(scored(n), "source", "score", "label",
    prevOf(n))))

val n1 = 2000000L
val n10 = 20000000L
println(f"PROBE rocAucBy 1x=${aucBy(n1)}%.2f 10x=${aucBy(n10)}%.2f")
settle()
println(f"PROBE populationStabilityBy 1x=${psiBy(n1)}%.2f 10x=${psiBy(n10)}%.2f")
settle()
println(f"PROBE scorerGateBy 1x=${gateBy(n1)}%.2f 10x=${gateBy(n10)}%.2f")
sys.exit(0)
