package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, CurationQueries, DataPipelineQueries, EngineQueries, PipelineQueries, PlatformQueries, SemanticQueries, StreamingQueries, ValidationQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's core transaction: synthetic CDC batch staged,
    * deduped by the cascade, merged into `orders` (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q17_cdc_merge(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++
      DataPipelineQueries.queries ++ ValidationQueries.queries ++
      StreamingQueries.queries ++ CurationQueries.queries ++
      SemanticQueries.queries ++ AnalyticsQueries.queries ++
      EngineQueries.queries ++ PlatformQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++
      DataPipelineQueries.oracles ++ ValidationQueries.oracles ++
      StreamingQueries.oracles ++ CurationQueries.oracles ++
      SemanticQueries.oracles ++ AnalyticsQueries.oracles ++
      EngineQueries.oracles ++ PlatformQueries.oracles
}
