// Round-14 probe: 1x/10x rows for the new freshness/report operators
// (recrawlSchedule, robotsFreshness, calibrationReport/ECE) -- each a
// single-exchange shape whose claim is "wall ~ rows on fixed cores".
// Run via spark-shell with compiled classes (see .claude/skills/verify);
// results land as rows in SCALE.md.
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

// recrawlSchedule: n urls x 4 fetches, same digest-period synthesis as
// q_recrawl (change counts 3/1/1/0 across the four id classes).
def hist(n: Long): DataFrame = {
  val ids = spark.range(n).select(col("id").as("doc_id"))
  val gap = lit(600.0) + (col("doc_id") % 10).cast("double") * lit(300.0)
  val period = col("doc_id") % 4 + 1
  ids.select(col("doc_id"), gap.as("g"),
      explode(sequence(lit(0L), lit(3L))).as("j"))
    .select(
      concat(lit("http://h"), (col("doc_id") % 1000).cast("string"),
        lit(".example.com/d/"), col("doc_id").cast("string")).as("url"),
      (col("j").cast("double") * col("g")).as("ts"),
      floor(col("j") / period).cast("string").as("dg"))
}
def recrawl(n: Long): Double = best(run(
  Crawl.recrawlSchedule(hist(n), "url", "ts", "dg", 300.0, 2592000.0)))

// robotsFreshness: n frontier urls over 1000 hosts, 1000-row robots log.
def frontier(n: Long): DataFrame =
  spark.range(n).select(
    concat(lit("http://h"), (col("id") % 1200).cast("string"),
      lit(".example.com/p/"), col("id").cast("string")).as("url"))
val rlog = spark.range(1000).select(
  concat(lit("h"), col("id").cast("string"), lit(".example.com")).as("host"),
  (lit(1000000.0) - col("id").cast("double") * 100.0).as("ts"))
def freshness(n: Long): Double = best(run(
  Crawl.robotsFreshness(frontier(n), "url", rlog, "host", "ts",
    nowS = 1050000.0, ttlS = 86400.0)))

// calibrationReport + ECE: n scored rows into 10 bins.
def scored(n: Long): DataFrame =
  spark.range(n).select(
    ((col("id") % 997).cast("double") / 997.0).as("score"),
    (col("id") % 3 === 0).as("label"))
def calib(n: Long): Double = best(run(
  QualityModel.expectedCalibrationError(
    QualityModel.calibrationReport(scored(n), "score", "label"))))

val n1 = 2000000L
val n10 = 20000000L
println(f"PROBE recrawlSchedule 1x=${recrawl(n1)}%.2f 10x=${recrawl(n10)}%.2f")
println(f"PROBE robotsFreshness 1x=${freshness(n1)}%.2f 10x=${freshness(n10)}%.2f")
println(f"PROBE calibration+ECE 1x=${calib(n1)}%.2f 10x=${calib(n10)}%.2f")
sys.exit(0)
