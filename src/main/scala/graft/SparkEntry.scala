package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.extensions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's own smoke sequence
    * (`integration_test_notebook.py:270-308`) — aggregate lineitem, run it
    * through the persistent cache, return the table-backed result. */
  def entry(spark: SparkSession): DataFrame = {
    val agg = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum("l_extendedprice").as("total"), count(lit(1)).as("n"))
    agg.cacheToDbfs(
      overridePreferSparkCache = true,
      dbfsCacheComplexityThreshold = None,
      dbfsCacheMultiplierThreshold = None)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesExtra.all ++ operators.PipelineQueries.all ++
      QueriesR4.all ++ QueriesR5.all ++ QueriesR7.all ++ QueriesR8.all ++
      QueriesR9.all ++ QueriesR10.all ++ QueriesR11.all ++ QueriesR12.all ++
      QueriesR13.all ++ QueriesR14.all ++ QueriesR15.all ++ QueriesR16.all ++
      QueriesR17.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded sample, LSH/minhash approximations). */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ QueriesExtra.oracles ++
      operators.PipelineQueries.oracles ++ QueriesR4.oracles ++
      QueriesR5.oracles ++ QueriesR7.oracles ++ QueriesR8.oracles ++
      QueriesR9.oracles ++ QueriesR10.oracles ++ QueriesR11.oracles ++
      QueriesR12.oracles ++ QueriesR13.oracles ++ QueriesR14.oracles ++
      QueriesR15.oracles ++ QueriesR16.oracles ++ QueriesR17.oracles
}
