package graft

/** Driver-contract guards: the correctness gate only checks queries
  * that declare an oracle, so a forgotten `oracles` entry silently
  * downgrades a query to a rows-only check. This spec makes the
  * no-oracle set EXPLICIT — adding a query without an oracle fails
  * here until it is either given one or consciously allowlisted.
  */
class ContractSpec extends SparkSpec {

  /** Every key here has a reason an ANSI-SQL twin cannot exist. */
  private val noOracleJustified: Map[String, String] = Map(
    "q_approx_distinct" -> "HLL sketch internals differ across engines (exact twin + error-bound spec)",
    "q_approx_percentiles" -> "GK-sketch internals differ across engines (exact twin q_percentiles + error-bound spec)",
    "q_flight_pipeline" -> "KMeans labels are not SQL-expressible",
    "q_hll_merge" -> "DataSketches HLL internals are engine-specific (exact twin + lossless-union parity spec)",
    "q_kmeans_predict" -> "KMeans is not SQL-expressible (stability spec)",
    "q_kmeans_scaled" -> "KMeans is not SQL-expressible",
    "q_multimodal_decode" -> "stub codec kernel is not SQL (determinism spec)",
    "q_pca_project" -> "SVD is not SQL-expressible (orthonormality + variance spec)")

  test("every query has an oracle or a documented no-oracle justification") {
    val keys = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(keys),
      s"orphan oracles without queries: ${oracles -- keys}")
    assert((keys -- oracles) === noOracleJustified.keySet,
      s"unjustified no-oracle keys: ${keys -- oracles -- noOracleJustified.keySet}; " +
        s"stale allowlist entries: ${noOracleJustified.keySet -- (keys -- oracles)}")
  }

  test("entry() smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query keys are unique across modules (no silent map collisions)") {
    // SparkEntry.queries is a Map built with flatMap — a duplicate key
    // in two modules would silently shadow one implementation.
    val perModule = Seq(
      operators.Relational, operators.Aggregates, operators.SetOps,
      operators.Joins, operators.Windows, operators.Stats,
      operators.Mining, operators.TimeSeries, operators.Frontier,
      sources.Csv, sources.Jsonl,
      sources.Orc, sources.Layouts,
      functions.Scalars,
      functions.Text, functions.Curation, functions.Selection,
      functions.Graph, functions.Vectors, functions.Retrieval,
      functions.Dedup, ml.Clustering,
      ml.FlightPipeline, streaming.EventWindows, multimodal.Multimodal)
      .flatMap(_.queries.keys)
    val dups = perModule.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: $dups")
    assert(perModule.size === SparkEntry.queries.size)
  }
}
