package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of engine queries plus their DuckDB oracle twins.
  *
  * Each module contributes:
  *   - `queries`: key -> (spark, sfDir) => DataFrame. Every key is one
  *     operator row from SURVEY.md §2. Results must be deterministic:
  *     total ORDER BY (with tiebreaker) before any LIMIT, doubles
  *     rounded where summation order could differ across engines.
  *   - `oracles`: key -> ANSI SQL runnable by DuckDB against the same
  *     parquet tables. Keys absent here get the driver's weaker
  *     rows-only check (non-SQL-expressible ops: ML, sketches, LSH).
  *
  * Column names MUST match between the Spark result and the oracle SQL
  * (the driver sorts columns by name before hashing).
  */
trait QueryModule {
  type Query = (SparkSession, String) => DataFrame
  def queries: Map[String, Query]
  def oracles: Map[String, String]
}
