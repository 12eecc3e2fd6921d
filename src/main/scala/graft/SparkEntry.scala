package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's queries + oracle SQL. Each key is
  * one operator row from SURVEY.md §2; modules own the implementations.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Aggregates,
    operators.SetOps,
    operators.Joins,
    operators.Windows,
    operators.Stats,
    operators.Mining,
    operators.TimeSeries,
    operators.Frontier,
    sources.Csv,
    sources.Jsonl,
    sources.Orc,
    sources.Layouts,
    functions.Scalars,
    functions.Text,
    functions.Curation,
    functions.Selection,
    functions.Graph,
    functions.Vectors,
    functions.Retrieval,
    functions.Dedup,
    ml.Clustering,
    ml.FlightPipeline,
    streaming.EventWindows,
    multimodal.Multimodal,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The TPC-H-Q3-shape star join is the engine's headline
    * plan: pushed filters at all three scans, pruned dim broadcast,
    * fact-fact shuffle join, TakeOrdered top-K (10 rows at sf0.001).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (ML/LSH/sketches/streaming
    * shapes with no deterministic ANSI twin) get the driver's weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
