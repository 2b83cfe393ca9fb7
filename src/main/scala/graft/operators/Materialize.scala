package graft.operators

import org.apache.spark.sql.DataFrame

/** The materialization primitive behind the iterative/two-pass operators
  * ([[Dedup.nearDupComponents]], [[Packing]], [[Splits]]): pins a
  * DataFrame's contents so (a) loop plans don't grow with iterations and
  * (b) both passes of a prefix-sum read the SAME sampled range
  * partitioning.
  *
  * `spark.graft.checkpoint` selects the storage:
  *
  *  - `local` (default): `localCheckpoint(eager = true)` — blocks live
  *    in executor storage only. Fastest, and right for single-node /
  *    short jobs, but NOT fault-tolerant: lineage is truncated, so on a
  *    large cluster one lost executor mid-loop aborts the job
  *    unrecoverably (Spark's own WARN: "lineage has been truncated and
  *    cannot be recomputed").
  *  - `reliable`: `checkpoint(eager = true)` against the cluster's
  *    checkpoint directory (`sparkContext.setCheckpointDir`, an
  *    HDFS/object-store path in production). Survives executor loss —
  *    the setting to run with at 100 TB, where some executor loss per
  *    hour is the expected case, not the exception.
  */
object Materialize {

  val ConfKey = "spark.graft.checkpoint"

  /** Storage level for `local` checkpoints; `disk` (DISK_ONLY) or
    * `memory` (Spark's MEMORY_AND_DISK default). Disk is the default:
    * checkpointed intermediates are read back exactly once per pass, so
    * keeping them on local disk costs little, while holding them
    * deserialized on the heap leaves the NEXT job to collect them —
    * measured as multi-second GC landing inside later benchmark runs of
    * the prefix-sum family (run-to-run spreads of 80-190%). */
  val StorageConfKey = "spark.graft.checkpointStorage"

  def checkpoint(df: DataFrame): DataFrame = checkpoint(df, eager = true)

  /** `eager = false` defers materialization to the first action while
    * still pinning the result for every later consumer — the shape for
    * operators that reference a small intermediate several times inside
    * ONE query (e.g. [[QualityModel.populationStabilityBy]]'s binned
    * aggregates): construction stays plan-only (no jobs launch from
    * merely building the frame), and the first action computes the
    * pinned rows once instead of once per consumer. Loops and
    * multi-pass operators keep the eager default — they need the
    * barrier. */
  def checkpoint(df: DataFrame, eager: Boolean): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local" =>
        df.sparkSession.conf.get(StorageConfKey, "disk") match {
          case "disk" =>
            df.localCheckpoint(eager = eager,
              org.apache.spark.storage.StorageLevel.DISK_ONLY)
          case "memory" => df.localCheckpoint(eager = eager)
          case other =>
            throw new IllegalArgumentException(
              s"$StorageConfKey must be 'disk' or 'memory', got '$other'")
        }
      case "reliable" =>
        require(
          df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          s"$ConfKey=reliable requires sparkContext.setCheckpointDir(...) " +
            "to point at fault-tolerant storage (HDFS/object store)")
        df.checkpoint(eager = eager)
      case other =>
        throw new IllegalArgumentException(
          s"$ConfKey must be 'local' or 'reliable', got '$other'")
    }
}
