package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extensions._

/** Cache-lifecycle management against the temp cache dir (reference
  * `cache_management.py` semantics). */
class ManagementSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** The cache database's real storage root, resolved through the
    * catalog (its location is fixed at creation and need not match the
    * session's warehouse conf). */
  private def cacheDbLocation: java.net.URI = {
    spark.sql(
      s"CREATE DATABASE IF NOT EXISTS ${CacheConfig.current.cacheDatabase}")
    spark.sessionState.catalog
      .getDatabaseMetadata(CacheConfig.current.cacheDatabase).locationUri
  }

  private def cacheSomething(salt: Int): String = {
    val df = spark.read
      .parquet(s"${TestSpark.sf0001}/nation.parquet")
      .withColumn("salt", lit(salt))
    df.cacheToDbfs(
      overridePreferSparkCache = true,
      dbfsCacheComplexityThreshold = None,
      dbfsCacheMultiplierThreshold = None)
    CacheIO.tableHash(df)
  }

  test("registries agree: catalog, warehouse-dir and metadata views") {
    val h = cacheSomething(1)
    val fromDb = Management.getTablesFromDatabase(spark).map(_.hashName)
    val fromFs = Management.getCachedTables(spark).map(_.hashName)
    val fromMeta = Management.getCachedDataframeMetadata(spark).map(_.hashName)
    assert(fromDb.contains(h))
    assert(fromFs.contains(h))
    assert(fromMeta.contains(h))
  }

  test("clearCachesOlderThan(0) deletes regardless of confirmDelete flag") {
    val h = cacheSomething(2)
    // numDays = -1 makes "now" older than the cutoff => eligible.
    val deleted = Management.clearCachesOlderThan(spark, numDays = -1)
    assert(deleted.contains(h), "reference deletes in both confirm branches")
    assert(!spark.catalog.tableExists(CacheConfig.current.tableNameFromHash(h)))
  }

  test("clearCachesOlderThan(7) keeps fresh caches") {
    val h = cacheSomething(3)
    val deleted = Management.clearCachesOlderThan(spark, numDays = 7)
    assert(!deleted.contains(h))
    assert(spark.catalog.tableExists(CacheConfig.current.tableNameFromHash(h)))
  }

  test("clearInconsistentCache removes one-sided orphans") {
    val h = cacheSomething(4)
    // Orphan the entry: drop the table but keep the metadata dir.
    spark.sql(s"DROP TABLE IF EXISTS ${CacheConfig.current.tableNameFromHash(h)}")
    val repaired = Management.clearInconsistentCache(spark)
    assert(repaired.contains(h))
    assert(!Files.exists(Paths.get(s"${CacheConfig.current.cacheDirSlash}$h")))
  }

  test("clearCacheForHash guards empty hash") {
    intercept[IllegalArgumentException] {
      Management.clearCacheForHash(spark, "")
    }
  }

  test("a catalog entry whose storage was wiped is a miss and rewrites") {
    // Reverse orphan: metastore persists, warehouse dir wiped. The read
    // path must report a miss (not a hit that fails file-not-found at
    // first action) and the write path must not meta-skip.
    val df = spark.read
      .parquet(s"${TestSpark.sf0001}/nation.parquet")
      .withColumn("salt", lit(6))
    df.cacheToDbfs(
      overridePreferSparkCache = true,
      dbfsCacheComplexityThreshold = None,
      dbfsCacheMultiplierThreshold = None)
    val h = CacheIO.tableHash(df)
    val tbl = CacheConfig.current.tableNameFromHash(h)
    val dir = Paths.get(cacheDbLocation).resolve(h)
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator.asScala.toSeq.reverse.foreach(Files.delete)
    assert(spark.catalog.tableExists(tbl), "catalog entry should survive the wipe")
    assert(CacheIO.readCacheIfExist(df).isEmpty, "wiped storage must miss")
    df.cacheToDbfs(
      overridePreferSparkCache = true,
      dbfsCacheComplexityThreshold = None,
      dbfsCacheMultiplierThreshold = None)
    assert(spark.table(tbl).count() == 25, "rewrite must rematerialize")
  }

  test("writeCacheData recovers a warehouse dir orphaned from the catalog") {
    // A persistent warehouse + fresh metastore leaves the table's
    // DIRECTORY behind with no catalog entry; saveAsTable would fail
    // LOCATION_ALREADY_EXISTS without the stale-location sweep.
    val tbl = CacheConfig.current.tableNameFromHash("stale_dir_regression")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val dir = Paths.get(cacheDbLocation).resolve("stale_dir_regression")
    Files.createDirectories(dir)
    Files.write(dir.resolve("leftover.parquet"), Array[Byte](1, 2, 3))
    val df = spark.read.parquet(s"${TestSpark.sf0001}/region.parquet")
    CacheIO.writeCacheData(df, tbl)
    assert(spark.catalog.tableExists(tbl))
    assert(spark.table(tbl).count() == df.count())
    spark.sql(s"DROP TABLE $tbl")
  }

  test("writeCacheData sweep never touches the cache db for a foreign-database table") {
    // The stale-location sweep computes <cacheDb location>/<suffix>, so
    // a caller passing `otherdb.t` (absent from the catalog) must NOT
    // delete the cache database's same-named directory — that dir may
    // be another session's in-progress or orphaned-but-recoverable data.
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sweep_other")
    val suffix = "sweep_guard_regression"
    val cacheSide = Paths.get(cacheDbLocation).resolve(suffix)
    Files.createDirectories(cacheSide)
    Files.write(cacheSide.resolve("inprogress.parquet"), Array[Byte](7, 7))
    val df = spark.read.parquet(s"${TestSpark.sf0001}/region.parquet")
    try {
      spark.sql(s"DROP TABLE IF EXISTS graft_sweep_other.$suffix")
      CacheIO.writeCacheData(df, s"graft_sweep_other.$suffix")
      assert(Files.exists(cacheSide.resolve("inprogress.parquet")),
        "sweep must not delete the cache database's same-named dir " +
          "for a table qualified in a different database")
      assert(spark.table(s"graft_sweep_other.$suffix").count() == df.count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft_sweep_other.$suffix")
      spark.sql("DROP DATABASE IF EXISTS graft_sweep_other CASCADE")
      Files.deleteIfExists(cacheSide.resolve("inprogress.parquet"))
      Files.deleteIfExists(cacheSide)
    }
  }
}
