package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** [EXT] Join surface (SURVEY §2.4). The reference has no `join` call —
  * its only join-shaped op is driver-side collect + `isin`
  * (`Code/flight_analysis.py:219-220`), which is a broadcast left-semi
  * join done by hand. Here every variant is declared and Catalyst/AQE
  * owns the strategy:
  *   - dims (part/customer/supplier) are `broadcast()` hinted — no
  *     shuffle of the fact side at any scale;
  *   - fact-to-fact (lineitem ⋈ orders) is left unhinted so AQE picks
  *     sort-merge with skew handling at real scale;
  *   - the range join composes a broadcast nested-loop join with a
  *     BETWEEN predicate — the only correct strategy Spark has for
  *     interval containment without a custom operator.
  */
object Joins extends QueryModule {

  override def queries: Map[String, Query] = Map(
    // Broadcast hash inner join: fact ⋈ small dim on partkey.
    "q_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey", "inner")
        .groupBy($"p_brand")
        .agg(round(sum($"l_quantity"), 4).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy($"p_brand")
    }),

    // Shuffle (sort-merge) equi-join: two large tables on orderkey.
    "q_join_smj" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_extendedprice"), 4).as("sum_price"))
        .orderBy($"o_orderpriority")
    }),

    // Left outer: customers keep their row even with zero orders;
    // count(o_orderkey) ignores the null-extended rows.
    "q_join_left" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")
    }),

    // Left semi — the scale-correct replacement for the reference's
    // collect + isin idiom (`Code/flight_analysis.py:219-220`).
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = Tables.orders(s, dir).filter($"o_totalprice" > 250000)
      Tables.customer(s, dir)
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Left anti: customers with no very-large order (every customer
    // has *some* order in the testdata, so anti-join against the
    // filtered side to keep the result non-trivial).
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = Tables.orders(s, dir).filter($"o_totalprice" > 400000)
      Tables.customer(s, dir)
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Theta/range join: part sizes into literal buckets (broadcast
    // nested loop + BETWEEN).
    "q_join_range" -> ((s, dir) => {
      import s.implicits._
      val buckets = Seq((1, 1, 10), (2, 11, 20), (3, 21, 35), (4, 36, 50))
        .toDF("b_id", "lo", "hi")
      Tables.part(s, dir)
        .join(broadcast(buckets), $"p_size".between($"lo", $"hi"))
        .select($"p_partkey", $"b_id")
        .orderBy($"p_partkey", $"b_id")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT p_brand, ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_smj" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  ROUND(SUM(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_range" ->
      """SELECT p_partkey, b_id
        |FROM part JOIN (VALUES (1, 1, 10), (2, 11, 20), (3, 21, 35), (4, 36, 50))
        |  AS b(b_id, lo, hi) ON p_size BETWEEN lo AND hi
        |ORDER BY p_partkey, b_id""".stripMargin,
  )
}
