package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test run (suites run serially). */
object TestSpark {
  lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    d
  }
  lazy val cacheDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-cache").toString
    CacheConfig.current = CacheConfig(sparkCacheDir = d + "/")
    d + "/"
  }
  lazy val spark: SparkSession = {
    val _ = cacheDir // force config init before any caching call
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

/** Typed plan pins that survive AQE.
  *
  * `AdaptiveSparkPlanExec` is a LEAF to `TreeNode.collect`, and after
  * execution every exchange is additionally wrapped in a
  * `QueryStageExec` leaf — so a naive
  * `executedPlan.collect { case e: Exchange => … }` sees NOTHING once
  * AQE wraps the plan (it always does when exchanges exist; AQE is on
  * by default in Spark 4). Such a pin passes no matter what the plan
  * does. Every typed plan assertion in the test suites must go through
  * [[PlanCheck.nodes]], which descends both wrappers, so the pin works
  * identically before and after the frame executes.
  */
object PlanCheck {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeLike}

  /** Every physical node, descending AQE wrappers and subquery plans. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
      case q: QueryStageExec        => p +: nodes(q.plan)
      case _                        => p +: p.children.flatMap(nodes)
    }
    here ++ p.subqueries.flatMap(nodes)
  }

  def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  /** Exchanges whose INPUT row type carries `colName` — the
    * "column X never crosses the wire" scale pin. */
  def exchangesCarrying(df: DataFrame, colName: String): Seq[Exchange] =
    nodes(df).collect {
      case e: Exchange if e.child.output.exists(_.name == colName) => e
    }

  /** All shuffle exchanges (hash/range/rebalance), through AQE. */
  def shuffles(df: DataFrame): Seq[SparkPlan] =
    nodes(df).collect { case e: ShuffleExchangeLike => e }
}
