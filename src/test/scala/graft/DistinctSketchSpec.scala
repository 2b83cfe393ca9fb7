package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DistinctSketch.distinctSketch

/** The TypedImperativeAggregate distinct sketch: exact vs
  * countDistinct, merge correctness across partitionings, SQL
  * registration, and the one-shuffle plan shape. */
class DistinctSketchSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  test("matches count(DISTINCT) exactly") {
    val a = orders.groupBy("o_orderstatus")
      .agg(distinctSketch(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("merge is partitioning-invariant (serialize/deserialize round trip)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(distinctSketch(col("o_custkey")).as("n")).collect().head.getLong(0)
    val expected = run(orders)
    assert(run(orders.repartition(1)) == expected)
    assert(run(orders.repartition(17, col("o_orderkey"))) == expected)
  }

  test("registered for SQL via GraftSparkExtensions") {
    orders.createOrReplaceTempView("orders_ds")
    val n = spark.sql(
      "SELECT distinct_sketch(o_custkey) AS n FROM orders_ds").collect().head.getLong(0)
    assert(n == orders.select(countDistinct(col("o_custkey"))).collect().head.getLong(0))
  }

  test("hll sketch: within 5% of exact and partitioning-invariant") {
    import graft.functions.DistinctSketch.hllSketch
    val exact = orders.select(countDistinct(col("o_custkey")))
      .collect().head.getLong(0)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(hllSketch(col("o_custkey")).as("n")).collect().head.getLong(0)
    val est = run(orders)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"hll estimate $est vs exact $exact")
    // Registers merge by max (commutative, idempotent): the estimate
    // must be EXACTLY the same under any partitioning.
    assert(run(orders.repartition(1)) == est)
    assert(run(orders.repartition(17, col("o_orderkey"))) == est)
  }

  test("hll sketch registered for SQL and fixed-size state") {
    orders.createOrReplaceTempView("orders_hll")
    val viaSql = spark.sql(
      "SELECT hll_sketch(o_custkey) AS n FROM orders_hll").collect().head.getLong(0)
    val viaCol = orders
      .agg(graft.functions.DistinctSketch.hllSketch(col("o_custkey")))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
    // State is 2^P bytes regardless of cardinality.
    val sk = graft.functions.HllLongSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    assert(sk.serialize(sk.createAggregationBuffer()).length ==
      graft.functions.HllLongSketch.M)
  }

  test("plans one partial/final aggregation, not count-distinct's expand") {
    val p = orders.groupBy("o_orderstatus")
      .agg(distinctSketch(col("o_custkey")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"sketch must not plan an Expand:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$p")
  }
}
