package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-export sinks — the pipeline's END: a cleaned corpus leaves
  * Spark as JSONL shards a trainer's data loader streams directly.
  *
  * Determinism is the design constraint: a re-export of the same
  * corpus must produce byte-identical shards (so release artifacts can
  * be content-addressed and a retrain diffed against a prior export).
  * That rules out leaving shard assignment to whatever partitioning
  * the upstream plan happened to have: rows are range-partitioned by
  * the id column (contiguous id ranges per shard) and sorted within
  * each shard, so shard membership AND in-file row order are functions
  * of the DATA alone.
  */
object Sinks {

  /** Write `df` as `numShards` deterministic JSONL shards under `dir`.
    *
    * `repartitionByRange(idCol)` gives contiguous, data-determined
    * shard ranges (the shard boundaries come from a sampled range
    * exchange — deterministic for a given dataset); the within-shard
    * sort pins row order; Spark's JSON writer emits fields in schema
    * order. Shards stream straight from executors to storage — the
    * driver never sees a row. `maxRecordsPerFile` caps any one file as
    * a guard (0 = no cap). */
  def writeJsonlShards(
      df: DataFrame,
      idCol: String,
      dir: String,
      numShards: Int = 32,
      maxRecordsPerFile: Int = 0): Unit =
    df.repartitionByRange(numShards, col(idCol))
      .sortWithinPartitions(idCol)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .json(dir)

  /** Manifest of an exported JSONL directory: one row per shard file
    * with its row count and content digest — the artifact a release
    * ships next to the data. Computed distributed (lines grouped by
    * their `input_file_name`), output is O(files) rows. The digest is
    * sha256 over the file's SORTED lines: `collect_list` merge order is
    * not deterministic when a file spans splits, so an order-sensitive
    * digest of the same bytes could flap run-to-run — the sorted form
    * is a pure content digest (same line multiset ⇒ same digest), which
    * is what re-export comparison needs. */
  def jsonlManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .text(dir)
      .select(input_file_name().as("path"), col("value"))
      .groupBy("path")
      .agg(
        count(lit(1)).as("n_rows"),
        sha2(
          concat_ws("\n", sort_array(collect_list(col("value"))))
            .cast("binary"),
          256).as("sha256"))
      .withColumn("file", element_at(split(col("path"), "/"), -1))
      .drop("path")
}
