package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property that round 1 shipped broken: two fresh, structurally
  * identical DataFrames must produce the SAME cleaned plan text (and hence
  * the same cache hash), even though Spark 4 embeds session-monotonic
  * `#exprId` and `[plan_id=NN]` markers in the raw explain output
  * (reference property: `tests/test_dbfs_spark_cache.py:132-168`).
  */
class PlanStabilitySpec extends AnyFunSuite {

  private def freshAgg(): DataFrame = {
    val spark = TestSpark.spark
    spark.read
      .parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum("l_extendedprice").as("total"), count("*").as("n"))
  }

  test("identical plans from fresh DataFrames hash equal") {
    // Burn some expression IDs between the two constructions so the raw
    // explain text definitely differs in #NNN / [plan_id=NN].
    val p1 = PlanFingerprint.getQueryPlan(freshAgg())
    val burn = freshAgg().filter(col("n") > 1).count() // advance id counters
    assert(burn >= 0)
    val p2 = PlanFingerprint.getQueryPlan(freshAgg())
    assert(p1 == p2, "cleaned plan text must be identical across sessions")
    assert(PlanFingerprint.md5Hex(p1) == PlanFingerprint.md5Hex(p2))
  }

  test("Photon plan note is extracted only when the full marker is present") {
    // Parity with the reference's Photon-limitation log passthrough
    // (core_caching.py:320-321) - unreachable on a local session (no
    // Photon), so pinned on synthetic plan text.
    val note = PlanFingerprint.photonNote(
      "== Physical Plan ==\nPhoton does not fully support the query " +
        "because: expression Xyz is not supported")
    assert(note.contains(" expression Xyz is not supported"))
    assert(PlanFingerprint.photonNote("ordinary plan text").isEmpty)
    // A normal local plan never carries the marker and getQueryPlan
    // stays well-formed.
    assert(!PlanFingerprint.getQueryPlan(freshAgg()).contains("Photon"))
  }

  test("lambda-bearing plans fingerprint stably across constructions") {
    // Higher-order-function lambda variables carry a session-global
    // counter (lambda x_5 vs lambda x_15 for the same query built
    // twice); cleaning renumbers them by order of appearance so the
    // fingerprint is construction-invariant.
    val spark = TestSpark.spark
    def mk(): DataFrame = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"),
        aggregate(transform(col("embedding").cast("array<double>"),
          x => x * x), lit(0.0), (a, x) => a + x).as("sq_norm"))
    val p1 = PlanFingerprint.getQueryPlan(mk())
    val burn = mk().count() // advance the global lambda-variable counter
    assert(burn >= 0)
    val p2 = PlanFingerprint.getQueryPlan(mk())
    assert(p1 == p2, "lambda counters must not leak into the fingerprint")
  }

  test("distinct lambda variables stay distinct after cleaning") {
    // Renumbering must preserve WHICH variable is referenced: zip_with
    // (x, y) => x * x differs from (x, y) => x * y; dropping counters
    // outright would collapse the two.
    val spark = TestSpark.spark
    def zw(f: (Column, Column) => Column): String =
      PlanFingerprint.getQueryPlan(spark.read
        .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
        .select(zip_with(col("embedding"), col("embedding"), f).as("z")))
    val xx = zw((x, _) => x * x)
    val xy = zw((x, y) => x * y)
    assert(xx != xy, "x*x and x*y must fingerprint differently")
  }

  test("a string literal that reads like a lambda variable is preserved") {
    // Analyzed plans print literals unquoted, so `lambda x_5` in a
    // Filter is textually identical to a real lambda variable.
    // Renumbering is scoped to lambdafunction(...) spans: outside them
    // the text must survive untouched, or two queries differing only
    // in such literals would collide on one canonical fingerprint.
    val spark = TestSpark.spark
    val base = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
    val a = PlanFingerprint.getQueryPlan(base.filter(col("c_name") === "lambda x_5"))
    val b = PlanFingerprint.getQueryPlan(base.filter(col("c_name") === "lambda x_9"))
    assert(a != b, "literal-only differences must produce distinct fingerprints")
    assert(a.contains("lambda x_5"), s"literal mangled in: $a")
  }

  test("no volatile markers survive cleaning") {
    val p = PlanFingerprint.getQueryPlan(freshAgg())
    assert(!p.contains("plan_id="), s"plan_id leaked into fingerprint: $p")
    assert(!"#\\d+".r.findFirstIn(p).isDefined, "exprId leaked")
  }

  test("spark-caching a DataFrame does not change its fingerprint") {
    val before = PlanFingerprint.getQueryPlan(freshAgg())
    val df = freshAgg()
    df.cache()
    try {
      df.count() // materialize so InMemoryRelation substitution is live
      assert(PlanFingerprint.getQueryPlan(df) == before,
        "fingerprint must be cache-state-invariant (backup workflow)")
    } finally df.unpersist()
  }

  test("different plans hash differently") {
    val spark = TestSpark.spark
    val base = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val a = PlanFingerprint.getQueryPlan(base.groupBy("l_returnflag").count())
    val b = PlanFingerprint.getQueryPlan(base.groupBy("l_linestatus").count())
    assert(a != b)
  }

  test("wide projections (>25 cols) differing only in the tail hash differently") {
    // Default spark.sql.debug.maxToStringFields=25 truncates node field
    // lists to "... N more fields": without an explicit maxFields the
    // fingerprint of two distinct wide plans collides → wrong cache hit.
    val spark = TestSpark.spark
    val base = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    def wide(tail: String): DataFrame = {
      val cols = (1 to 30).map(i => (col("l_quantity") + i).as(s"c$i")) :+
        col(tail).as("tailcol")
      base.select(cols: _*)
    }
    val a = PlanFingerprint.getQueryPlan(wide("l_returnflag"))
    val b = PlanFingerprint.getQueryPlan(wide("l_linestatus"))
    assert(!a.contains("more fields"), "fingerprint text must not be truncated")
    assert(a != b, "wide plans differing only past field 25 must not collide")
  }

  test("string literals that look like object addresses are preserved") {
    // Analyzed plans print string literals unquoted; `user@abcdef12` must
    // not be stripped by the object-address regex, or two queries
    // differing only in such literals would fingerprint identically.
    val spark = TestSpark.spark
    val base = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
    val a = PlanFingerprint.getQueryPlan(base.filter(col("c_name") === "user@abcdef12"))
    val b = PlanFingerprint.getQueryPlan(base.filter(col("c_name") === "user@deadbeef99"))
    assert(a != b, "literal-only differences must produce distinct fingerprints")
    assert(a.contains("user@abcdef12"), s"literal mangled in: $a")
  }
}
