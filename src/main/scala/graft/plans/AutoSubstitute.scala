package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.{CacheConfig, CacheIO, CacheMetadata, Freshness, PlanFingerprint}

/** Transparent cache substitution — the Catalyst-rule variant of the
  * cache lookup (SURVEY §4.2's "optional advanced" path).
  *
  * `cacheToDbfs` substitutes at the API layer: the caller must hold the
  * exact DataFrame. This rule substitutes at ANALYSIS time: any SUBTREE
  * of any query whose fingerprint matches an existing cache entry is
  * rewritten to a scan of the cache table — so a cached aggregation
  * reused inside a bigger join, or re-derived from scratch in another
  * notebook cell, is served from the cache without the caller ever
  * mentioning it. Same phase as Spark's own `CacheManager.useCachedData`
  * (analyzed plans, before optimization moves filters across the
  * subtree boundary), and the same fingerprint pipeline as the API
  * layer, so entries written by either path are visible to both.
  *
  * Cost control: fingerprinting probes the filesystem (freshness), so
  * subtrees are pre-filtered against an in-memory index of plan-text
  * hashes harvested from the cache metadata dir — non-matching subtrees
  * cost one string render + MD5, no I/O.
  *
  * Gate: `spark.graft.autoSubstitute` via `CacheConfig.autoSubstitute`
  * (default off — parity with the reference requires API-layer-only
  * behavior). Install via `GraftSparkExtensions` or
  * `builder.withExtensions(...)`.
  */
object AutoSubstitute {

  /** planTextMd5 -> cache hash name, harvested from metadata files. */
  private val index = TrieMap.empty[String, String]
  @volatile private var loadedFrom: String = null

  /** Called by `CacheIO.writeCache` after a successful write. */
  def register(cleanedPlanText: String, hashName: String): Unit =
    index.put(PlanFingerprint.md5Hex(cleanedPlanText), hashName)

  def clear(): Unit = { index.clear(); loadedFrom = null }

  /** Harvest plan-text hashes from `{cacheDir}/<hash>/cache_metadata.txt`
    * once per cache dir (re-harvested when the configured dir changes). */
  private def ensureLoaded(spark: SparkSession): Unit = {
    val dir = CacheConfig.current.cacheDirSlash
    if (loadedFrom == dir) return
    synchronized {
      if (loadedFrom == dir) return
      try {
        val base = new Path(dir)
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(base)) {
          fs.listStatus(base).filter(_.isDirectory).foreach { d =>
            CacheIO
              .readTextIfExists(new Path(d.getPath, "cache_metadata.txt").toString,
                spark.sparkContext.hadoopConfiguration)
              .flatMap(CacheMetadata.extractQueryPlan)
              .foreach(planText =>
                index.put(PlanFingerprint.md5Hex(planText), d.getPath.getName))
          }
        }
      } catch { case _: Throwable => () }
      loadedFrom = dir
    }
  }

  /** Input files of a subtree (file-backed relations only). */
  private def subtreeFiles(plan: LogicalPlan): Option[Array[String]] = {
    var ok = true
    val files = plan.collect {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) => h.location.inputFiles
      case l: LeafNode if !l.isInstanceOf[LogicalRelation] =>
        // catalog/local/stream relations: freshness semantics differ —
        // leave those subtrees to the API layer.
        ok = false; Array.empty[String]
    }
    if (ok && files.nonEmpty) Some(files.flatten.toArray) else None
  }

  final case class SubstituteCachedPlans(spark: SparkSession)
      extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (!CacheConfig.current.autoSubstitute) return plan
      if (!plan.resolved) return plan
      ensureLoaded(spark)
      if (index.isEmpty) return plan
      plan.transformDown {
        case sub if !sub.isInstanceOf[LeafNode] && sub.resolved =>
          trySubstitute(sub).getOrElse(sub)
      }
    }

    private def trySubstitute(sub: LogicalPlan): Option[LogicalPlan] = {
      val planText = PlanFingerprint.cleanPlanText(sub.toString)
      // Never rewrite plans that already read cache tables (prevents
      // cache-on-cache re-entrancy; such plans need no substitution).
      if (planText.contains(CacheConfig.current.cacheDatabase + ".")) return None
      if (!index.contains(PlanFingerprint.md5Hex(planText))) return None
      val files = subtreeFiles(sub).getOrElse(return None)
      val sources = Freshness.dirModTimesForFiles(
        files, spark.sparkContext.hadoopConfiguration)
      val (hash, _, metadataFilePath, _) =
        CacheMetadata.tableCacheInfo(sources, planText)
      val tableName = CacheConfig.current.tableNameFromHash(hash)
      if (!CacheIO.exists(metadataFilePath, spark.sparkContext.hadoopConfiguration))
        return None
      if (!spark.catalog.tableExists(tableName)) return None
      val replacement = spark.table(tableName).queryExecution.analyzed
      if (replacement.output.size != sub.output.size) return None
      val compatible = replacement.output.zip(sub.output).forall {
        case (n, o) => n.name == o.name && n.dataType == o.dataType
      }
      if (!compatible) return None
      logInfo(s"graft auto-substitution: subtree served from $tableName")
      // Re-bind the cache relation's fresh attributes to the original
      // subtree's expression IDs so parents resolve unchanged.
      Some(Project(
        replacement.output.zip(sub.output).map { case (n, o) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, replacement))
    }
  }
}
