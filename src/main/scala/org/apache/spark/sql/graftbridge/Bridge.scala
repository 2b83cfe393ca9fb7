package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge: `Column <-> Expression` conversion lives in
  * `private[sql]` helpers in Spark 4 (the Connect split removed the
  * public `Column(expr)` constructor), so custom Catalyst expressions
  * need one forwarding object inside the `org.apache.spark.sql`
  * namespace — the standard pattern for Spark-extension libraries.
  * Nothing else from the internals is exposed. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan in a DataFrame (`Dataset.ofRows` is
    * `private[sql]` in Spark 4) — needed to expose custom logical
    * operators ([[graft.plans.GroupedTopK]]) through the public API. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until every posted listener event has been delivered — the
    * listener bus is `private[spark]`, and graft.Bench's per-query CPU
    * attribution needs a deterministic drain between timed windows (a
    * fixed sleep would race late task-end events into the next
    * query's counter). */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Register a native function in an existing session's registry (the
    * registry is also behind `private[sql]` session state). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
