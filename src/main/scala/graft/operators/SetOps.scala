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
  )
}
