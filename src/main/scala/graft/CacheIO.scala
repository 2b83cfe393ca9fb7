package graft

import java.nio.charset.StandardCharsets

import scala.collection.immutable.ListMap
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache materialization and lookup.
  *
  * A cache entry is (table named by hash in the cache database, sidecar
  * `cache_metadata.txt`) — reference `dbfs_spark_cache/core_caching.py`
  * (`write_dbfs_cache` `:474-516`, `read_dbfs_cache_if_exist` `:409-471`,
  * `_write_standard_cache` `:64-115`). Metadata goes through Hadoop
  * `FileSystem` so any scheme (file://, s3a://, abfss://) works unchanged.
  *
  * Scale note: the cache write is a full distributed job
  * (`saveAsTable`); everything else here is O(1) driver-side metadata, so
  * lookups stay cheap no matter the data size.
  */
object CacheIO {

  // --- tiny Hadoop-FS text IO (reference uses dbutils.fs: core_caching.py:47-61) ---

  def readTextIfExists(pathStr: String, conf: Configuration): Option[String] =
    try {
      val p = new Path(pathStr)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
        finally in.close()
      }
    } catch { case NonFatal(_) => None }

  def writeText(pathStr: String, content: String, conf: Configuration): Unit = {
    val p = new Path(pathStr)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def exists(pathStr: String, conf: Configuration): Boolean =
    try {
      val p = new Path(pathStr)
      p.getFileSystem(conf).exists(p)
    } catch { case NonFatal(_) => false }

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** Whether a cataloged table's storage location still exists. The
    * metastore can outlive the warehouse (persistent metastore, wiped
    * or re-pointed warehouse dir) — the reverse of the orphan
    * writeCacheData sweeps. Errs toward `true` so an unreadable
    * catalog entry degrades to the previous behavior. */
  private def tableLocationExists(spark: SparkSession, tableName: String): Boolean =
    try {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val loc = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
      loc.getFileSystem(hadoopConf(spark)).exists(loc)
    } catch { case NonFatal(_) => true }

  /** `CREATE DATABASE IF NOT EXISTS` + overwrite-save the cache table
    * (reference `core_caching.py:37-44`; format pluggable, parquet
    * locally since Delta isn't on the classpath).
    *
    * `partitionBy` (absent in the reference, which writes one
    * unpartitioned table per entry) lets hot caches be layout-aware at
    * scale: downstream filters on the partition column prune files
    * instead of scanning the whole materialization. Partitioning is
    * physical layout only — it does not participate in the fingerprint.
    */
  def writeCacheData(
      dfW: DataFrame,
      tbl: String,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None): Unit = {
    val spark = dfW.sparkSession
    val cfg = CacheConfig.current
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${cfg.cacheDatabase}")
    // A cache table's DIRECTORY can outlive its catalog entry: the
    // warehouse persists across processes while a fresh session
    // metastore starts empty (and the reverse of the sidecar check in
    // writeStandardCache). Creating a managed table over a leftover
    // location fails LOCATION_ALREADY_EXISTS — the location is ours by
    // construction (hash-named dir under the cache database), so clear
    // it when the catalog has no such table. Guard: the sweep computes
    // the location as <cacheDb location>/<suffix>, so it is ONLY valid
    // for tables that actually live in the cache database — a caller
    // passing `otherdb.t` must not delete cachedb's same-named dir.
    val tblParts = tbl.split('.')
    val tblInCacheDb =
      if (tblParts.length >= 2) tblParts.dropRight(1).mkString(".") == cfg.cacheDatabase
      else spark.catalog.currentDatabase == cfg.cacheDatabase
    if (tblInCacheDb && !spark.catalog.tableExists(tbl)) {
      try {
        // The database's location is fixed at creation and can differ
        // from the session's current warehouse conf — resolve through
        // the catalog, never by re-deriving from spark.sql.warehouse.dir.
        val dbLoc = spark.sessionState.catalog
          .getDatabaseMetadata(cfg.cacheDatabase).locationUri
        val tableDir = tblParts.last
        if (tableDir.nonEmpty) {
          val loc = new Path(new Path(dbLoc), tableDir)
          val fs = loc.getFileSystem(hadoopConf(spark))
          if (fs.exists(loc)) fs.delete(loc, true)
        }
      } catch { case NonFatal(_) => () }
    }
    val w0 = dfW.write.format(cfg.cacheFormat).mode("overwrite")
    val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    // Bucketing co-locates equal keys: two cache tables bucketed the
    // same way join with NO exchange — at 100 TB this removes the
    // dominant shuffle from repeated joins on the cached results.
    val w2 = bucketBy match {
      case Some((n, cols)) =>
        w1.bucketBy(n, cols.head, cols.tail: _*).sortBy(cols.head, cols.tail: _*)
      case None => w1
    }
    w2.saveAsTable(tbl)
  }

  /** Write table + metadata, skipping entirely when the metadata text is
    * identical (reference `core_caching.py:64-115`). Unlike the reference
    * the table is written exactly once (its `:113-114` double-write is a
    * bug SURVEY.md flags as not-to-replicate). */
  def writeStandardCache(
      df: DataFrame,
      hashName: String,
      metadataFilePath: String,
      metadataTxt: String,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None): Unit = {
    val conf = hadoopConf(df.sparkSession)
    val lastMeta = readTextIfExists(metadataFilePath, conf)
    // Skip only when the TABLE is also still there: a metadata sidecar
    // can outlive its table (different warehouse dir across processes,
    // manual DROP) and skipping then would leave the entry
    // unmaterialized forever.
    val skipTable = CacheConfig.current.tableNameFromHash(hashName)
    if (lastMeta.contains(metadataTxt) &&
        df.sparkSession.catalog.tableExists(skipTable) &&
        tableLocationExists(df.sparkSession, skipTable)) {
      PlanFingerprint.log(s"Meta identical $hashName. Skip.")
      return
    }
    writeCacheData(df, CacheConfig.current.tableNameFromHash(hashName),
      partitionBy, bucketBy)
    writeText(metadataFilePath, metadataTxt, conf)
  }

  /** Cache lookup: metadata file present AND table present => re-read
    * (reference `core_caching.py:409-471`). Returns None on miss. */
  def readCacheIfExist(
      df: DataFrame,
      queryPlan: Option[String] = None,
      inputDirModDatetime: Option[ListMap[String, String]] = None): Option[DataFrame] = {
    val spark = df.sparkSession
    val sources = inputDirModDatetime.getOrElse(Freshness.inputDirModTimes(df))
    val plan = queryPlan.getOrElse(PlanFingerprint.getQueryPlan(df))
    val (hashName, _, metadataFilePath, _) =
      CacheMetadata.tableCacheInfo(sources, plan)
    val tableName = CacheConfig.current.tableNameFromHash(hashName)
    if (!exists(metadataFilePath, hadoopConf(spark))) None
    else if (!spark.catalog.tableExists(tableName)) {
      PlanFingerprint.log(s"Cache metadata exists but table $tableName does not")
      None
    } else if (!tableLocationExists(spark, tableName)) {
      // Catalog entry without storage (persistent metastore, wiped
      // warehouse): a "hit" would fail file-not-found at the user's
      // first action. Treat as a miss; the recompute rewrites both.
      PlanFingerprint.log(s"Cache table $tableName exists but its storage location is gone")
      None
    } else Some(spark.read.table(tableName))
  }

  /** Materialize to the cache and return the table-backed DataFrame when
    * `replace` (reference `core_caching.py:474-516`): the caller's lineage
    * is replaced by a plain table scan, so downstream plans hash against
    * the cache table. */
  def writeCache(
      df: DataFrame,
      replace: Boolean = true,
      queryPlan: String = "",
      inputDirModDatetime: Option[ListMap[String, String]] = None,
      hashName: Option[String] = None,
      cachePath: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None): DataFrame = {
    val sources = inputDirModDatetime.getOrElse(Freshness.inputDirModTimes(df))
    val plan = if (queryPlan.nonEmpty) queryPlan else PlanFingerprint.getQueryPlan(df)
    val (finalHash, _, metadataFilePath, metadataTxt) =
      CacheMetadata.tableCacheInfo(sources, plan, hashName, cachePath)
    val tableName = CacheConfig.current.tableNameFromHash(finalHash)
    writeStandardCache(df, finalHash, metadataFilePath, metadataTxt,
      partitionBy, bucketBy)
    // Make the entry visible to the analysis-phase substitution rule.
    graft.plans.AutoSubstitute.register(plan, finalHash)
    if (replace)
      try df.sparkSession.read.table(tableName)
      catch { case NonFatal(_) => df }
    else df
  }

  /** If `df` is nothing but a scan of one of our cache tables (standard
    * 32-hex or `data_*`), return that table's hash name. Such a plan IS
    * the cache — re-caching it would materialize a second copy under a
    * new fingerprint (reference recognizes this via the `get_table_hash`
    * cascade, `core_caching.py:543-552`). */
  def existingCacheScan(df: DataFrame, plan: String): Option[String] = {
    val db = CacheConfig.current.cacheDatabase
    Seq("data_", "").view
      .flatMap(p => PlanFingerprint.findCatalogTablePattern(plan, db, p))
      .collectFirst { case t if DirectData.isPureScanOf(df, t) => t }
  }

  /** A cache hit returns the stored table as-is; if the caller asked for
    * a partitioned/bucketed layout the stored table doesn't have, the
    * documented no-exchange co-located-join property silently wouldn't
    * hold. Surface the mismatch (layout is physical only and not part of
    * the fingerprint, so the hit itself is correct). */
  def warnOnLayoutMismatch(
      spark: SparkSession,
      tableName: String,
      partitionBy: Seq[String],
      bucketBy: Option[(Int, Seq[String])]): Boolean =
    try {
      val cols = spark.catalog.listColumns(tableName).collect()
      val storedPart = cols.filter(_.isPartition).map(_.name).toSeq
      val storedBucket = cols.filter(_.isBucket).map(_.name).toSeq
      val wantBucket = bucketBy.map(_._2).getOrElse(Nil)
      val mismatch = storedPart != partitionBy || storedBucket != wantBucket
      if (mismatch)
        PlanFingerprint.log(
          s"Cache hit $tableName but stored layout (partitionBy=$storedPart, " +
            s"bucketBy=$storedBucket) differs from requested " +
            s"(partitionBy=$partitionBy, bucketBy=$wantBucket); returning the " +
            "stored layout. clearDbfsCache() then re-cache to relayout.")
      mismatch
    } catch { case NonFatal(_) => false }

  /** Spark-cache (memory/disk) marker check (reference
    * `core_caching.py:519-524`). */
  def isSparkCached(df: DataFrame): Boolean =
    try df.storageLevel.useMemory || df.storageLevel.useDisk
    catch { case NonFatal(_) => false }

  /** Hash cascade for a DataFrame (reference `core_caching.py:527-571`):
    * direct-data registry tag, then a pure scan of a `data_*` table, then
    * a cache-table hash extracted from the plan text, else
    * `MD5(metadata)`. */
  def tableHash(df: DataFrame): String = {
    val cfg = CacheConfig.current
    val plan = PlanFingerprint.getQueryPlan(df)

    DirectData.taggedHash(df) match {
      case Some(h) => return h
      case None => ()
    }

    PlanFingerprint.findCatalogTablePattern(plan, cfg.cacheDatabase, "data_") match {
      case Some(dataTable) if DirectData.isPureScanOf(df, dataTable) => return dataTable
      case _ => ()
    }

    val sources = Freshness.inputDirModTimes(df)
    val metadataTxt = CacheMetadata.render(sources, plan)
    PlanFingerprint
      .getHashFromMetadata(metadataTxt)
      .getOrElse(PlanFingerprint.md5Hex(metadataTxt))
  }
}
