package graft.operators

import graft.{Pins, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Operational analytics (SURVEY §2.15) — dominance frontiers
  * (skyline), sweep-line peak concurrency, and exact integer
  * apportionment: the "which points matter / how loaded / who gets
  * how many" operators of resource planning over big facts.
  *
  * Scale shapes: the skyline's prefix-max and the sweep-line's
  * running sum both need a GLOBAL order — both run as chunked scans
  * (range partition → per-chunk aggregate → chunks-sized meta window
  * → broadcast offsets), the [[PrefixScan]] structure, generalized
  * here to max; apportionment's remainder ranking runs over the
  * |categories|-row aggregate only.
  */
object Frontier extends QueryModule {

  /** Interval length each event "holds" in the concurrency model. */
  val HoldMinutes = 30

  /** Apportionment budget (total allocated units). */
  val AllocBudget = 1000

  /** Exclusive running MAX of `value` over the global order `sort` —
    * the [[PrefixScan.scan]] structure with max in place of sum
    * (steps: range-partition into chunks, per-chunk max, exclusive
    * chunk-prefix max over the chunks-sized meta table, broadcast
    * back, within-chunk running max). Adds `max_before` (null for the
    * global first rows). Like PrefixScan, `sort` must be a total
    * order, and the range pin goes through the caller's [[Pins]]
    * scope so the query's own first materialization releases it
    * (`Pins.releaseOnMaterialize` on the final frame).
    */
  private def prefixMax(df: DataFrame, sort: Seq[Column],
      value: Column, pins: Pins): DataFrame = {
    val ranged = pins(df
      .repartitionByRange(sort: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", value))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val meta = ranged.groupBy(col("_pid"))
      .agg(max(col("_v")).as("_c"))
      .withColumn("_off", max(col("_c")).over(wOff))
      .select(col("_pid"), col("_off"))
    val wChunk = Window.partitionBy(col("_pid")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls, so a null chunk-offset (first chunk) or
    // a null within-chunk prefix (first row of a chunk) degrades to
    // the other side; both null → null = "no predecessor".
    ranged.join(broadcast(meta), Seq("_pid"))
      .withColumn("max_before",
        greatest(max(col("_v")).over(wChunk), col("_off")))
      .drop("_pid", "_v", "_off")
  }

  override def queries: Map[String, Query] = Map(
    // 2-D skyline (Pareto frontier) of orders: the (cheapest, most
    // recent) tradeoff — a point survives iff no other order is both
    // ≤ price and ≥ date with one strict. Over DISTINCT (price, date)
    // pairs sorted by (price ASC, date DESC), a pair is dominated
    // exactly when some predecessor carries a strictly larger date —
    // one exclusive prefix-max pass, the sort-based skyline algorithm
    // (Börzsönyi et al. '01), chunked so the global order never lands
    // on one task. Output: frontier points with their order counts.
    "q_skyline" -> ((s, dir) => {
      import s.implicits._
      // o_orderdate reads as TIMESTAMP_NTZ; the session pins UTC, so
      // the cast to session-zone TIMESTAMP (what unix_micros needs)
      // is value-preserving — the Tables.events convention.
      val pts = Tables.orders(s, dir)
        .groupBy($"o_totalprice".as("price"),
          $"o_orderdate".cast("timestamp").as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val pins = new Pins
      pins.releaseOnMaterialize(
        prefixMax(pts, Seq($"price".asc, $"d".desc), unix_micros($"d"), pins)
          .filter($"max_before".isNull || unix_micros($"d") > $"max_before")
          .select($"price", $"d", $"n_orders")
          .orderBy($"price", $"d"))
    }),

    // Sweep-line peak concurrency: every event holds a resource for
    // HoldMinutes; the peak is the max of the running sum over the
    // ±1 endpoint stream (ends sort before starts at the same
    // instant — intervals are half-open [t, t+hold)). The running
    // sum is a PrefixScan over the endpoint stream; the argmax is a
    // 1-row TakeOrdered with an earliest-time tiebreak.
    "q_concurrency" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val ends = ev.select(
        (unix_micros($"ts") + HoldMinutes * 60000000L).as("t"),
        lit(-1L).as("delta"), $"event_id")
      val pts = ev.select(unix_micros($"ts").as("t"), lit(1L).as("delta"),
          $"event_id")
        .union(ends)
      val pins = new Pins
      pins.releaseOnMaterialize(
        PrefixScan.scan(pts.withColumn("g", lit(0)), Seq("g"),
            Seq($"t".asc, $"delta".asc, $"event_id".asc), $"delta", pins = pins)
          .withColumn("running", $"cum_before" + $"delta")
          .orderBy($"running".desc, $"t".asc, $"delta".asc, $"event_id".asc)
          .limit(1)
          .select($"running".as("peak"),
            timestamp_micros($"t").as("peak_ts"),
            ($"grp_total" + lit(0L)).as("net_end")))
    }),

    // Largest-remainder apportionment (Hamilton method): allocate
    // AllocBudget units across brands proportional to part counts,
    // floor shares first, remaining units to the largest fractional
    // remainders (brand ASC tiebreak) — Σ alloc = budget EXACTLY,
    // all in integer arithmetic (B·n div N / mod N), the
    // quota-rounding primitive behind sampling-budget splits and
    // shard sizing. Every windowed stage runs over the
    // |categories|-row aggregate.
    "q_allocation" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables.part(s, dir)
        .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum($"n").as("nn"))
      val based = counts.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"($AllocBudget * n) div nn"))
        .withColumn("rem", expr(s"($AllocBudget * n) % nn"))
      val spent = based.agg(sum($"base").as("used")).select($"used")
      val w = Window.orderBy($"rem".desc, $"p_brand".asc)
      based.crossJoin(broadcast(spent))
        .withColumn("rk", row_number().over(w))
        .select($"p_brand", $"n",
          ($"base" + when($"rk" <= lit(AllocBudget.toLong) - $"used", 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy($"p_brand")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT o_totalprice AS price, o_orderdate AS d,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |scan AS (
        |  SELECT price, d, n_orders,
        |    MAX(epoch_us(d)) OVER (ORDER BY price ASC, d DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mb
        |  FROM pts)
        |SELECT price, d, n_orders FROM scan
        |WHERE mb IS NULL OR epoch_us(d) > mb
        |ORDER BY price, d""".stripMargin,
    "q_concurrency" ->
      s"""WITH pts AS (
         |  SELECT epoch_us(ts) AS t, 1 AS delta, event_id FROM events
         |  UNION ALL
         |  SELECT epoch_us(ts) + ${HoldMinutes.toLong * 60000000L}, -1, event_id
         |  FROM events),
         |scan AS (
         |  SELECT t, delta,
         |    SUM(delta) OVER (ORDER BY t ASC, delta ASC, event_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
         |    CAST(SUM(delta) OVER () AS BIGINT) AS net_end,
         |    event_id
         |  FROM pts)
         |SELECT CAST(running AS BIGINT) AS peak,
         |  make_timestamp(t) AS peak_ts, net_end
         |FROM scan
         |ORDER BY running DESC, t ASC, delta ASC, event_id ASC
         |LIMIT 1""".stripMargin,
    "q_allocation" ->
      s"""WITH counts AS (
         |  SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM counts),
         |based AS (
         |  SELECT p_brand, n,
         |    ($AllocBudget * n) // nn AS base,
         |    ($AllocBudget * n) % nn AS rem
         |  FROM counts CROSS JOIN tot),
         |spent AS (SELECT CAST(SUM(base) AS BIGINT) AS used FROM based),
         |ranked AS (
         |  SELECT p_brand, n, base,
         |    ROW_NUMBER() OVER (ORDER BY rem DESC, p_brand ASC) AS rk
         |  FROM based)
         |SELECT p_brand, n,
         |  CAST(base + CASE WHEN rk <= $AllocBudget - used
         |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM ranked CROSS JOIN spent
         |ORDER BY p_brand""".stripMargin,
  )
}
