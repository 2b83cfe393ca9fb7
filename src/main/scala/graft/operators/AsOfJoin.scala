package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row is matched with the single
  * most recent right row for the same key whose time is ≤ the left
  * row's time — the canonical "join quotes to trades" / "state as of
  * event time" operator that plain equi-joins can't express.
  *
  * Spark-first composition (the brief's preference (a): built-ins
  * before custom plans): tag and union both sides, then one window pass
  * per key ordered by (time, side) carrying the last-seen right payload
  * forward (`last(_, ignoreNulls = true)`), then keep left rows. Cost:
  * ONE shuffle of (|L| + |R|) rows on the key plus a per-partition sort
  * — the same distribution a custom SortMergeExec would demand via
  * requiredChildDistribution, with zero bespoke physical code to
  * maintain. Right rows sort before left rows at equal timestamps, so
  * the match is inclusive (≤).
  *
  * At 100 TB: both sides shuffle once on the key; skewed keys can be
  * pre-salted with [[Skew.saltedJoin]] semantics only if the right side
  * is replicable — otherwise rely on AQE skew splitting of the sort.
  */
object AsOfJoin {

  /** @param left       the driving side (every row kept)
    * @param right      the state/quote side
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  effective-time column on the right
    * @param payload    right-side columns to carry (null when no right
    *                   row is ≤ the left time)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      "payload column names must not collide with left columns")
    // side marker: right rows (0) sort before left rows (1) at the same
    // instant, making the as-of match inclusive. The payload rides as
    // ONE struct so every carried field comes from the SAME right row
    // (per-column lasts could mix rows when a field is legitimately
    // null).
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(right.select(payload.map(col): _*).schema
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .catalogString))
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(payload.map(col): _*))
    val lSlim = l.select(col("__key"), col("__t"), col("__side"),
      col("__payload"), struct(leftCols.map(col): _*).as("__left"))
    val rSlim = r.select(col("__key"), col("__t"), col("__side"),
      col("__payload"),
      lit(null).cast(lSlim.schema("__left").dataType.catalogString).as("__left"))
    val unioned = lSlim.unionByName(rSlim)
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__carried",
      last(col("__payload"), ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__left.$c").as(c)) ++
          payload.map(c => col(s"__carried.$c").as(c)): _*)
  }
}
