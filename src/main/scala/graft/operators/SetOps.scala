package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** [EXT] Set operations (SURVEY §2.7): UNION ALL (the natural way to
  * run the reference's conciliated 2019+2023 tables through one
  * pipeline), INTERSECT and EXCEPT (both distinct set semantics in
  * Spark and ANSI SQL — planned as aggregate/left-anti under AQE, no
  * driver-side materialization at any scale).
  */
object SetOps extends QueryModule {

  override def queries: Map[String, Query] = Map(
    // union of two differently-sourced projections conciliated to one
    // schema — the 2019+2023 two-table pattern.
    "q_union" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir)
        .select($"c_custkey".as("id"), $"c_name".as("name"), lit("customer").as("src"))
      val supp = Tables.supplier(s, dir)
        .select($"s_suppkey".as("id"), $"s_name".as("name"), lit("supplier").as("src"))
      cust.unionByName(supp).orderBy($"src", $"id")
    }),

    "q_intersect" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir).select($"c_nationkey".as("nk"))
        .intersect(Tables.supplier(s, dir).select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    }),

    // customers who placed 'F' orders but never 'O' orders (both
    // branches nonempty, difference nonempty).
    "q_except" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.filter($"o_orderstatus" === "F").select($"o_custkey".as("ck"))
        .except(o.filter($"o_orderstatus" === "O").select($"o_custkey".as("ck")))
        .orderBy($"ck")
    }),

    // [EXT] Schema evolution across ingestion batches — the CDC
    // reality at 100 TB: a new pipeline version ADDS a column
    // (quality score here) and history cannot be rewritten.
    // `unionByName(allowMissingColumns = true)` aligns columns by
    // NAME — a positional union would silently bind the new column
    // into whatever position matched — and null-fills the drifted
    // column on the historical side; both slices stay scan→project,
    // no shuffle until the final aggregate. The aggregate proves the
    // alignment: the drifted column is non-null on exactly the
    // incoming-batch rows, and its sum is unchanged by the union.
    // The history/new boundary is the shared Tables.docBatchIdx
    // definition (unparseable sources ride with the incoming batch,
    // same contract as q_agg_incremental).
    "q_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .withColumn("batch_idx",
          coalesce(Tables.docBatchIdx($"source"), lit(Tables.HistoryBatches)))
      val hist = docs.filter($"batch_idx" < Tables.HistoryBatches)
        .select($"doc_id", $"lang")
      val incoming = docs.filter($"batch_idx" >= Tables.HistoryBatches)
        .select($"doc_id", $"lang",
          ($"n_chars".cast("double") / 100.0).as("quality"))
      hist.unionByName(incoming, allowMissingColumns = true)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          count($"quality").as("n_with_quality"),
          round(sum(coalesce($"quality", lit(0.0))), 4).as("sum_quality"))
        .orderBy($"lang")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_union" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier
        |ORDER BY src, id""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY ck""".stripMargin,
    // The oracle is the direct statement of what name-aligned union +
    // null-fill must produce: every doc counted once, the drifted
    // column populated on exactly the incoming batch.
    "q_schema_evolution" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN b >= ${Tables.HistoryBatches}
         |    AND n_chars IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_with_quality,
         |  ROUND(SUM(CASE WHEN b >= ${Tables.HistoryBatches}
         |    AND n_chars IS NOT NULL THEN n_chars / 100.0 ELSE 0 END), 4)
         |    AS sum_quality
         |FROM (SELECT lang, n_chars,
         |        COALESCE(${Tables.docBatchIdxSql("source")},
         |                 ${Tables.HistoryBatches}) AS b
         |      FROM documents)
         |GROUP BY lang
         |ORDER BY lang NULLS FIRST""".stripMargin,
  )
}
