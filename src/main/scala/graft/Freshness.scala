package graft

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}

import scala.collection.immutable.ListMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Input-source freshness probe.
  *
  * The newest modification time of every input directory is baked into the
  * cache fingerprint, so a data change produces a new hash and therefore a
  * cache miss (reference `dbfs_spark_cache/core_caching.py:212-297`).
  * Probes are per *directory*, not per file — one `listStatus` per input
  * dir regardless of file count, which is what keeps this viable against
  * 100 TB sources with millions of files.
  */
object Freshness {

  val SchemaChangedPlaceholder = "<schema_changed_placeholder>"
  val DirectDataCacheMarker = "<direct_data_cache>"

  /** Timestamp format used in metadata text (reference
    * `core_caching.py:378`: `%Y-%m-%d %H:%M:%S`). */
  val TsFormat: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def formatMillis(millis: Long): String =
    LocalDateTime
      .ofInstant(Instant.ofEpochMilli(millis), ZoneOffset.UTC)
      .format(TsFormat)

  /** Max modification time per input directory, formatted, in sorted dir
    * order (reference `core_caching.py:212-297`). Special results:
    *  - empty map: reads a catalog `data_*` table, or no file inputs
    *  - `Map(SchemaChangedPlaceholder -> now)`: analysis-time schema change
    *
    * Skips `_delta_log/` entries and standard cache dirs
    * (`^<cacheDir>/<32hex>/?$`, reference `:289-293`) so cache-on-cache
    * reads don't self-invalidate.
    */
  def inputDirModTimes(df: DataFrame): ListMap[String, String] = {
    val cfg = CacheConfig.current
    val plan = PlanFingerprint.getQueryPlan(df)

    // Reading a catalog data_* table => standard caching logic, no sources
    // (reference core_caching.py:244-250).
    if (PlanFingerprint
        .findCatalogTablePattern(plan, cfg.cacheDatabase, "data_")
        .isDefined) return ListMap.empty

    val inputFiles: Array[String] = inputFilesSafe(df.inputFiles) match {
      case Left(special) => return special
      case Right(files) => files
    }
    if (inputFiles.isEmpty) return ListMap.empty

    dirModTimesForFiles(inputFiles,
      df.sparkSession.sparkContext.hadoopConfiguration)
  }

  /** `inputFiles` fetch with the reference's error contract
    * (`core_caching.py:258-269`): a Delta-style "schema changed since
    * analysis" error maps to `Left(Map(SchemaChangedPlaceholder → now))`
    * — a freshness value no cache entry can ever match, forcing
    * invalidation — and any other failure maps to `Left(empty)` (treat
    * as unknown source). Extracted so the Delta branch is testable in a
    * build with no Delta jar (`FreshnessSpec` pins all three outcomes);
    * the error-code match is on the message substring, exactly what
    * `DELTA_SCHEMA_CHANGE_SINCE_ANALYSIS` carries on a real cluster. */
  private[graft] def inputFilesSafe(
      fetch: => Array[String]): Either[ListMap[String, String], Array[String]] =
    try Right(fetch)
    catch {
      case e: Throwable if Option(e.getMessage)
            .exists(_.contains("SCHEMA_CHANGE")) =>
        Left(ListMap(
          SchemaChangedPlaceholder -> LocalDateTime
            .now(ZoneOffset.UTC)
            .format(TsFormat)))
      case _: Throwable => Left(ListMap.empty)
    }

  /** Dir-level mod-time map for an explicit file list — the core of
    * [[inputDirModTimes]], also used when fingerprinting logical-plan
    * subtrees (auto-substitution) where no DataFrame exists. */
  def dirModTimesForFiles(
      inputFiles: Array[String],
      hadoopConf: org.apache.hadoop.conf.Configuration): ListMap[String, String] = {
    val cfg = CacheConfig.current
    val cacheDirBase = cfg.cacheDirSlash.stripSuffix("/")
    val cacheDirRe =
      ("^" + java.util.regex.Pattern.quote(cacheDirBase) +
        "/[a-f0-9]{32}/?$").r

    val dirs = inputFiles.map(f => new Path(f).getParent.toString).distinct
    val entries = dirs.sorted.flatMap { d =>
      if (cacheDirRe.findFirstIn(stripScheme(d)).isDefined) None
      else lastModTimeOfDir(d, hadoopConf).map(d -> _)
    }
    ListMap(entries.toIndexedSeq: _*)
  }

  private def stripScheme(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "")

  /** Newest mod time among a dir's non-`_delta_log` children, falling back
    * to the dir's own mod time (reference `core_caching.py:217-240`). */
  private def lastModTimeOfDir(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] =
    try {
      val path = new Path(dir)
      val fs = path.getFileSystem(conf)
      val listed = fs.listStatus(path).filterNot(_.getPath.getName == "_delta_log")
      if (listed.isEmpty) Some(formatMillis(fs.getFileStatus(path).getModificationTime))
      else Some(formatMillis(listed.map(_.getModificationTime).max))
    } catch { case _: Throwable => None }
}
