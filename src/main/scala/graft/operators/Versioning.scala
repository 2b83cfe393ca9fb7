package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Snapshot-diff for incremental corpus pipelines: classify every id
  * across two corpus snapshots as added / removed / changed /
  * unchanged — the audit step before an incremental recrawl ingest
  * ([[Dedup.dedupAgainstReference]] drops what this calls unchanged;
  * this names everything).
  *
  * Both sides reduce to `(id, sha2-256 digest)` BEFORE the full outer
  * join — `unhex` packs the digest to its raw 32 BYTES, so that is
  * literally what the exchange carries, never document text (the same
  * never-shuffle-the-text contract as incremental dedup, plan-pinned in
  * the spec). Digest equality stands in for text equality exactly
  * (equal text ⇒ equal digest; a sha2-256 collision is not a practical
  * event). Presence is tracked by an explicit per-side flag, NOT by
  * digest nullness — an id present with NULL text still counts as
  * present (and NULL-text comparisons classify as `changed`, matching
  * SQL `=` semantics on NULL).
  */
object Versioning {

  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("__id"),
      unhex(sha2(col(textCol), 256)).as("__od"), lit(true).as("__op"))
    val n = newSnap.select(col(idCol).as("__id"),
      unhex(sha2(col(textCol), 256)).as("__nd"), lit(true).as("__np"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(col("__od") === col("__nd"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Top-`topK` DRIFTED words between two corpus snapshots — the
    * content-level companion to [[snapshotDiff]]'s row-level diff:
    * which vocabulary actually moved between recrawls, ranked by
    * absolute unigram-probability shift `|c_old/N_old − c_new/N_new|`.
    * A recrawl that swapped a boilerplate template, changed language
    * mix, or lost a source shows up here before any model does.
    *
    * Scale shape: one token shuffle per snapshot to word counts
    * (map-side combined), a vocab ⋈ vocab full outer join, totals on a
    * 1-row broadcast, and a `TakeOrderedAndProject` top-K — no global
    * sort, nothing doc-sized past the first aggregation. The rank key
    * is the ROUNDED shift (ties broken on the word) so the ordering is
    * reproducible cross-engine; per-word shifts are single divisions of
    * exact counts, bit-identical by IEEE. */
  def vocabDrift(
      oldSnap: DataFrame, newSnap: DataFrame, textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be positive")
    def counts(df: DataFrame) = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    val o = counts(oldSnap).withColumnRenamed("c", "c_old")
    val n = counts(newSnap).withColumnRenamed("c", "c_new")
    val totals = o.agg(sum("c_old").as("n_old"))
      .crossJoin(n.agg(sum("c_new").as("n_new")))
    o.join(n, Seq("word"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .crossJoin(broadcast(totals))
      .select(
        col("word"), col("c_old"), col("c_new"),
        round(abs(
          col("c_old").cast("double") / col("n_old").cast("double") -
            col("c_new").cast("double") / col("n_new").cast("double")), 6)
          .as("shift"))
      .orderBy(col("shift").desc, col("word"))
      .limit(topK)
  }
}
