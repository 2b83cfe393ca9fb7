package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-export sinks — the pipeline's END: a cleaned corpus leaves
  * Spark as JSONL shards a trainer's data loader streams directly.
  *
  * Determinism is the design constraint: a re-export of the same
  * corpus must produce byte-identical SHARD CONTENTS (so release
  * artifacts can be content-addressed and a retrain diffed against a
  * prior export). That rules out leaving shard assignment to whatever
  * partitioning the upstream plan happened to have: rows are
  * hash-partitioned by the id column (`hash(id) mod numShards` — see
  * [[writeJsonlShards]] for why range partitioning was rejected) and
  * sorted within each shard, so shard membership AND in-file row order
  * are functions of the DATA alone. Note the stability unit is the
  * shard's CONTENT (its fingerprint in the manifest), not its file
  * name: Spark part-file names embed a per-job UUID, so two re-exports
  * of identical data produce identical fingerprints under differing
  * file names — diff on the fingerprint column.
  */
object Sinks {

  /** Write `df` as `numShards` deterministic JSONL shards under `dir`.
    *
    * Shard assignment is `hash(id) mod numShards` (a plain hash
    * repartition on the id column) — a pure function of the DATA, with
    * no sampling anywhere. A range partition would read nicer (shard 7
    * = ids 7000–7999) but `repartitionByRange` draws its boundaries
    * from per-partition reservoir samples, which depend on the
    * upstream partition layout once partitions exceed the sample size
    * — exactly the nondeterminism this sink exists to exclude. The
    * within-shard sort pins row order; Spark's JSON writer emits
    * fields in schema order. Shards stream straight from executors to
    * storage — the driver never sees a row. `maxRecordsPerFile` caps
    * any one file as a guard (0 = no cap). */
  def writeJsonlShards(
      df: DataFrame,
      idCol: String,
      dir: String,
      numShards: Int = 32,
      maxRecordsPerFile: Int = 0): Unit =
    df.repartition(numShards, col(idCol))
      .sortWithinPartitions(idCol)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .json(dir)

  /** Manifest of an exported JSONL directory: one row per shard file
    * with its row count, byte count, and content fingerprint — the
    * artifact a release ships next to the data. Computed distributed
    * (lines grouped by their `input_file_name`), output is O(files)
    * rows.
    *
    * The fingerprint must be (a) order-independent — `collect_list`
    * merge order is not deterministic when a file spans splits — and
    * (b) CONSTANT-STATE per file: an agg that gathers every line of a
    * shard into one buffer (collect_list / one giant concat) holds the
    * whole multi-GB file in a single task's memory, the same
    * collect-then-filter OOM shape [[graft.operators.Vocab.rareNgramIndex]]
    * exists to avoid. So each line contributes its xxhash64 to three
    * O(1) accumulators — count, wrap-safe hash sum (hash mod 2^31, so
    * even 2^32 lines stay far from long overflow under ANSI
    * arithmetic), and hash xor — and the fingerprint is the hex sha256
    * of that triple. Multiset-sensitive (sum counts duplicate lines
    * the xor alone would cancel), order-independent, and a few longs
    * of state no matter the shard size. Not a digest of the file BYTES
    * — a content fingerprint: equal line multisets ⇒ equal
    * fingerprint, which is what re-export comparison needs. */
  def jsonlManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .text(dir)
      .select(
        input_file_name().as("path"),
        xxhash64(col("value")).as("h"),
        length(col("value")).cast("long").as("len"))
      .groupBy("path")
      .agg(
        count(lit(1)).as("n_rows"),
        sum("len").as("n_bytes"),
        sha2(
          concat_ws(":",
            count(lit(1)),
            sum(pmod(col("h"), lit(2147483647L))),
            expr("bit_xor(h)")).cast("binary"),
          256).as("fingerprint"))
      .withColumn("file", element_at(split(col("path"), "/"), -1))
      .drop("path")
}
