package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the round-3 corpus widening: every QueriesExtra
  * entry executes at sf0.001 and returns rows, and every entry carries an
  * oracle (exactness is the driver's DuckDB gate; replicated locally by
  * tools/check_oracles.py). */
class QueriesExtraSpec extends AnyFunSuite {

  test("every extra query has a matching oracle entry") {
    assert(QueriesExtra.all.keySet == QueriesExtra.oracles.keySet)
  }

  QueriesExtra.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val n = fn(TestSpark.spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("rows-only q_approx_distinct estimates within HLL tolerance of exact") {
    // The driver can only row-count this query (approximate values differ
    // across engines by design); pin the accuracy contract here instead.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val approx = Queries.all("q_approx_distinct")(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"${TestSpark.sf001}/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = approx(k).toDouble
      assert(math.abs(est - n) / n <= 0.15,
        s"$k: estimate $est vs exact $n beyond 15% (default rsd is 5%)")
    }
  }
}
