// Round-15 probe: 1x/10x rows for the new recalibration and seeded
// scheduling operators -- recalibrate collapses to <= bins rows in one
// exchange (wall ~ rows on fixed cores), applyCalibration is map-only
// plus a broadcast probe, recrawlScheduleSeeded adds one sitemap-side
// url-key exchange and a co-partitioned full-outer join to the
// recrawlSchedule shape. Run via spark-shell with compiled classes
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

// recalibrate + applyCalibration: n scored rows, 10 bins. The fit's
// triple join runs over <= 1000 post-aggregate rows regardless of n;
// the apply pass is the corpus-sized side.
def scored(n: Long): DataFrame =
  spark.range(n).select(
    ((col("id") % 997).cast("double") / 997.0).as("score"),
    (col("id") % 3 === 0).as("label"))
def recal(n: Long): Double = best {
  val s = scored(n)
  run(QualityModel.applyCalibration(
    s, "score", QualityModel.recalibrate(s, "score", "label")))
}

// recrawlScheduleSeeded: the r14 recrawl history synthesis plus a
// sitemap side declaring lastmod for half the urls (plus 20% never-
// fetched urls only the sitemap knows).
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
def sitemap(n: Long): DataFrame =
  spark.range((n * 6) / 5)
    .filter(col("id") % 2 === 0)
    .select(
      concat(lit("http://h"), (col("id") % 1000).cast("string"),
        lit(".example.com/d/"), col("id").cast("string")).as("loc"),
      date_add(to_date(lit("1970-01-01")),
        (col("id") % 120).cast("int")).as("lastmod"))
def seeded(n: Long): Double = best(run(
  Crawl.recrawlScheduleSeeded(hist(n), "url", "ts", "dg",
    sitemap(n), "loc", "lastmod",
    nowS = 9000000.0, minIntervalS = 300.0, maxIntervalS = 2592000.0)))

// Settle between groups (the Bench.settle lesson): a 20M-row group
// leaves GC debt that pollutes the next group's timed window.
def settle(): Unit = {
  spark.catalog.clearCache(); System.gc(); Thread.sleep(2000); System.gc()
}

val n1 = 2000000L
val n10 = 20000000L
println(f"PROBE recrawlSeeded 1x=${seeded(n1)}%.2f 10x=${seeded(n10)}%.2f")
settle()
println(f"PROBE recalibrate+apply 1x=${recal(n1)}%.2f 10x=${recal(n10)}%.2f")
sys.exit(0)
