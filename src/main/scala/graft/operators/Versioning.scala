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
}
