package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot values.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the declarative fallback when a hot key would still overwhelm one
  * task (e.g. a power-law `user_id` against a dimension): the skewed
  * side gets a random-but-deterministic salt in `[0, saltFactor)`, the
  * other side is replicated `saltFactor` times, and the join key becomes
  * `(key, salt)` — the hot key's rows spread over `saltFactor` tasks.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, salted on the left.
    * `left` is the large/skewed side; `right` is replicated ×
    * `saltFactor` (keep it the smaller side). The salt is
    * `xxhash64(monotonically_increasing_id) % saltFactor` — spreads hot
    * keys without an RNG (deterministic plan). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 1, "saltFactor must exceed 1")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit(_)): _*)))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
