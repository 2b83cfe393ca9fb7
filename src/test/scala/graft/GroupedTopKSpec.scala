package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupedTopK

/** The custom grouped-top-k Catalyst operator: semantics pinned against
  * the window formulation, physical shape pinned to partial+final execs
  * around one exchange. */
class GroupedTopKSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  private def viaOperator(k: Int) =
    GroupedTopK.topKPerGroup(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k)
      .select("o_custkey", "o_orderkey", "o_totalprice")

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("matches the window formulation exactly") {
    for (k <- Seq(1, 2, 5)) {
      val a = viaOperator(k)
      val b = viaWindow(k)
      assert(a.count() == b.count(), s"k=$k row counts")
      assert(a.except(b).isEmpty && b.except(a).isEmpty, s"k=$k row sets differ")
    }
  }

  test("plans as partial+final execs (map-side reduction before the shuffle)") {
    val physical = viaOperator(3).queryExecution.executedPlan.toString
    assert(physical.contains("GroupedTopKExec(partial"), physical)
    assert(physical.contains("GroupedTopKExec(final"), physical)
  }

  test("groups smaller than k pass through whole") {
    val tiny = viaOperator(1000)
    assert(tiny.count() == orders.count(),
      "k larger than any group must keep every row")
  }

  test("multi-column grouping works") {
    val df = GroupedTopK.topKPerGroup(orders,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1)
    val expected = orders.groupBy("o_orderstatus", "o_orderpriority").count().count()
    assert(df.count() == expected, "exactly one row per (status, priority)")
  }
}
