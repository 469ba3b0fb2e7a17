package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EventQueries, PageQueries, RelationalQueries, RetentionQueries, SimQueries, TextQueries, WebQueries}

/** Driver contract: the engine's query surface with per-query DuckDB
  * oracles. See SURVEY.md §2 for the operator inventory each query covers.
  */
object SparkEntry {

  /** Flagship: pages -> points -> 15min -> hourly continuous-aggregate
    * rollup on the sf0.001 fixture (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    PageQueries.queries("q_pages_1h")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ PageQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ SimQueries.queries ++ RetentionQueries.queries ++
      WebQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit only for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    EventQueries.oracleSql ++ PageQueries.oracleSql ++ RelationalQueries.oracleSql ++
      TextQueries.oracleSql ++ SimQueries.oracleSql ++ RetentionQueries.oracleSql ++
      WebQueries.oracleSql
}
