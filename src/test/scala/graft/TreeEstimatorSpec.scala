package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The tree-walking cost estimator (config flag) agrees with the factor
  * table on real plans and resists the keyword method's substring
  * traps. */
class TreeEstimatorSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def lineitem = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
  private def orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")

  test("single join multiplies by the join base factor") {
    val df = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
    val m = Complexity.multiplierFromTree(df)
    assert(math.abs(m - 2.0) < 1e-9) // 0.6 * (2.0/0.6)
  }

  test("grouped aggregate scores complex-aggregate") {
    val df = lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity"), count(lit(1)))
    val m = Complexity.multiplierFromTree(df)
    assert(math.abs(m - 1.6) < 1e-9) // 0.6 * (1.6/0.6)
  }

  test("distinct scores the distinct factor, not aggregate") {
    val df = orders.select("o_orderstatus").distinct()
    val m = Complexity.multiplierFromTree(df)
    assert(math.abs(m - 1.5) < 1e-9) // 0.6 * (1.5/0.6)
  }

  test("a column alias containing 'join' does not fool the tree walker") {
    val df = lineitem.select(col("l_quantity").as("joined_quantity_join"))
    assert(math.abs(Complexity.multiplierFromTree(df) - 0.6) < 1e-9)
    // ...whereas the keyword estimator counts the alias text:
    val keywordM = Complexity.calculateFromPlan(
      PlanFingerprint.extendedPlanText(df).toLowerCase, 1.0)._2
    assert(keywordM > 0.6, "keyword method inflates on the alias (the trap)")
  }

  test("estimate() honors the useTreeEstimator flag") {
    val df = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
    val (_, mTree, _) = CacheConfig.withConfig(
      CacheConfig.current.copy(useTreeEstimator = true))(Complexity.estimate(df))
    assert(math.abs(mTree - 2.0) < 1e-9)
  }
}
