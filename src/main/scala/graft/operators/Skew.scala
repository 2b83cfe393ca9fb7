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

  /** Join-key skew diagnostic — the numbers that decide whether a key
    * needs [[saltedJoin]] (or AQE skew splitting) before it becomes the
    * hot reducer: key cardinality, the biggest key's row count and
    * corpus share, the p99 key size, and `skew_ratio` = max/mean (1.0
    * = perfectly uniform; a power-law key shows 10–1000×).
    *
    * Cost shape: one map-side-combined groupBy down to key-cardinality
    * rows, then a single-row summary aggregate — the detail table never
    * leaves the cluster and no global sort is planned. The exact
    * `percentile` keeps a count-value → frequency map, so its state is
    * O(distinct key sizes) — bounded by key cardinality, NOT fixed; at
    * extreme key cardinality swap it for `percentile_approx` (fixed
    * sketch state) and keep the rest of the report unchanged. Exact is
    * the default here because the oracle gate compares against
    * DuckDB's `quantile_cont` bit-for-bit. */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum("c").as("n_rows"),
        max("c").as("max_rows"),
        round(expr("percentile(c, 0.99D)"), 4).as("p99_rows"))
      .withColumn(
        "top_share",
        round(col("max_rows").cast("double") / col("n_rows"), 6))
      .withColumn(
        "skew_ratio",
        round(
          col("max_rows").cast("double") * col("n_keys") / col("n_rows"),
          4))

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
