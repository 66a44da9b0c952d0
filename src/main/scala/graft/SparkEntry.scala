package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.{AactQueries, DocumentQueries, EmbeddingQueries, EventQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator to a DataFrame
  * program over the star-schema snapshot dir; `oracleSql` pairs each with
  * ANSI SQL the driver runs in DuckDB over the same parquet files.
  * Aliases must match on both sides (comparator sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q06StarFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++
      DocumentQueries.queries ++ EmbeddingQueries.queries ++
      PipelineQueries.queries ++ AactQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every declared query currently ships one
    * (ContractSpec enforces it); a genuinely non-SQL-expressible query
    * would be added to ContractSpec's explicit `oracleExempt` set —
    * with a justification — and the driver then records a weaker
    * rows-only check for it. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ EventQueries.oracle ++
      DocumentQueries.oracle ++ EmbeddingQueries.oracle ++
      PipelineQueries.oracle ++ AactQueries.oracle
}
