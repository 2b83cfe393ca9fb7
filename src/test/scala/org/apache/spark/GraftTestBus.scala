package org.apache.spark

/** Test-only visibility bridge: `SparkContext.listenerBus` is
  * `private[spark]`, but deterministic listener-based assertions need
  * to DRAIN the async bus instead of sleeping a fixed interval (a
  * fixed sleep flakes under CI load when a late-posted event lands
  * between two deltas). Same pattern as
  * [[org.apache.spark.sql.graftbridge.Bridge]] — one forwarder, no
  * other internals exposed. */
object GraftTestBus {
  /** Block until every event posted so far has been delivered to every
    * registered listener. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
