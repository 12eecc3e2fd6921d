package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Window functions (SURVEY §2.5). The reference approximates
  * "top reasons per cluster" with a global sort + limit
  * (`Code/flight_analysis.py:147-152`); `rank() OVER (PARTITION BY …)`
  * is the correct per-group implementation of that intent. One
  * hash-partition exchange per distinct partitioning key; rows within
  * a partition sort locally — no global sort at any scale.
  */
object Windows extends QueryModule {

  override def queries: Map[String, Query] = Map(
    // Per-group rank with deterministic tiebreak; keep top-3 per group
    // — the reference's per-cluster top-reasons done right.
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, dir)
        .withColumn("rk", rank().over(w))
        .filter($"rk" <= 3)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice", $"rk")
        .orderBy($"o_orderpriority", $"rk", $"o_orderkey")
    }),

    // Latest row per key — the "current version of each record"
    // pattern every CDC/snapshot/training-data pipeline needs:
    // row_number() = 1 over (key, ts desc). Catalyst rewrites the
    // rank-filter into WindowGroupLimit, so each shuffle partition
    // keeps ONE row per key before the window sort — the shuffle moves
    // the full table but per-key state is O(1) at any scale.
    "q_window_latest" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .orderBy($"o_custkey")
    }),

    // SCD2 interval derivation — turn a change-event stream into
    // [valid_from, valid_to) versioned rows (the slowly-changing-
    // dimension shape every warehouse load needs): valid_to is the
    // NEXT change's timestamp via lead(), null marks the current
    // version. One window pass per key, no self-join.
    "q_scd2_intervals" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey",
          $"o_orderdate".as("valid_from"),
          lead($"o_orderdate", 1).over(w).as("valid_to"),
          (lead($"o_orderdate", 1).over(w).isNull).as("is_current"))
        .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
    }),

    // Running sum per customer over order history.
    "q_window_runsum" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("run_total", round(sum($"o_totalprice").over(w), 4))
        .select($"o_custkey", $"o_orderkey", $"run_total")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // lag/lead per user over the event stream.
    "q_window_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .select($"user_id", $"event_id", $"value", $"prev_value", $"next_type")
        .orderBy($"user_id", $"event_id")
    }),

    // Gaps & islands: runs of CONSECUTIVE order days per customer —
    // the classic row_number difference trick: within a customer,
    // consecutive days share (day - row_number) as a constant group
    // key, so islands fall out of one window pass + one groupBy (no
    // self-join, no iteration). Distinct days first: same-day repeat
    // orders would break the consecutiveness arithmetic.
    //
    // ONE exchange end-to-end (PlanSpec-pinned): an explicit
    // repartition on o_custkey satisfies every downstream required
    // distribution — the (custkey, day) distinct, the custkey window,
    // and the (custkey, grp) island aggregate all cluster on key sets
    // that CONTAIN the partitioning key, so none re-shuffles. A bare
    // .distinct() instead partitioned on (custkey, day) first and the
    // window re-exchanged on custkey: the table crossed the wire
    // twice (round-5 verdict).
    "q_window_islands" -> ((s, dir) => {
      import s.implicits._
      val days = Tables.orders(s, dir)
        .select($"o_custkey", to_date($"o_orderdate").as("day"))
        .repartition($"o_custkey")
        .dropDuplicates("o_custkey", "day")
      val w = Window.partitionBy($"o_custkey").orderBy($"day")
      days
        .withColumn("grp", date_sub($"day", row_number().over(w)))
        .groupBy($"o_custkey", $"grp")
        .agg(min($"day").as("start_day"), count(lit(1)).as("island_days"))
        .filter($"island_days" >= 2)
        // rendered as a string: a DATE column round-trips as python
        // `object` in the driver's pandas compare while DuckDB yields
        // datetime64 — a schema-mismatch risk even with equal values
        .select($"o_custkey",
          date_format($"start_day", "yyyy-MM-dd").as("island_start"),
          $"island_days")
        .orderBy($"o_custkey", $"island_start")
    }),

    // Time-RANGE window frame: per user, rolling 1-hour sum of event
    // values. A range frame bounds the window by ORDER-BY VALUE, not
    // row count — the frame automatically includes every row within
    // the trailing hour regardless of event density (rowsBetween would
    // fix the row count and be wrong under bursts). Ordering is epoch
    // MICROS on both engines: second-resolution unix_timestamp would
    // silently merge sub-second neighbors into one frame boundary.
    "q_window_range_frame" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000 * 1000, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("hour_sum", round(sum($"value").over(w), 4))
        .select($"user_id", $"event_id", $"hour_sum")
        .orderBy($"user_id", $"event_id")
    }),

    // Distribution window functions: quartile bucketing, percent_rank,
    // cume_dist per group — unique orderkey tiebreak keeps every rank
    // deterministic. Computed by the range-chunked formulation below:
    // a plain window here would put each of the FIVE priority groups
    // on one task, the scale-killer shape for a full-distribution
    // window over a low-cardinality key (q_window_rank survives that
    // via WindowGroupLimit pruning; a distribution needs EVERY row
    // ranked, so the fix has to be structural).
    "q_window_ntile" -> ((s, dir) =>
      distributionScaled(Tables.orders(s, dir))),

    // [EXT] Time-series gap fill — resample each user's event stream
    // to a dense daily grid and forward-fill missing days (the
    // last-observation-carried-forward shape every metrics/feature
    // pipeline needs before training on regular-interval series).
    // Plan shape: daily partial-aggregated sums (one shuffle on
    // (user, day)), per-user span as a tiny aggregate, the calendar
    // densified by a `sequence` GENERATOR (rows are produced inside
    // the user's partition — no driver-side date loop, no cross join
    // against a calendar table), then one left join back and a
    // per-user ignore-nulls `last` window. Everything partitions on
    // user_id; the grid is |users|·|days| rows, never a global
    // product. Daily sums round at 4dp before the fill (sum order
    // differs across engines — the q_tfidf contract), so the carried
    // value is bit-identical to the value it copies.
    "q_gap_fill" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .filter($"user_id" < GapFillUsers)
        .groupBy($"user_id", to_date($"ts").as("d"))
        .agg(round(sum($"value"), 4).as("v"))
      val cal = daily.groupBy($"user_id")
        .agg(min($"d").as("mn"), max($"d").as("mx"))
        .select($"user_id",
          explode(sequence($"mn", $"mx", expr("interval 1 day"))).as("d"))
      val w = Window.partitionBy($"user_id").orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // The day ships as midnight TIMESTAMP, not DATE: parquet date32
      // round-trips through the driver's pandas compare as python
      // `date` objects (dtype `object`) while the DuckDB side arrives
      // datetime64 — a guaranteed schema-drift row for identical
      // values. Same convention as every o_orderdate output.
      cal.join(daily, Seq("user_id", "d"), "left")
        .select($"user_id", $"d".cast("timestamp").as("d"),
          last($"v", ignoreNulls = true).over(w).as("v_filled"),
          $"v".isNull.as("was_gap"))
        .orderBy($"user_id", $"d")
    }),

    // [EXT r12] Last-touch attribution: credit each purchase to the
    // user's most recent non-purchase event within the attribution
    // window, 'direct' when none. ONE ignore-nulls last() window per
    // user over (ts, event_id) — per-user state, arbitrarily
    // parallel, no self-join of the event stream against itself (the
    // naive per-purchase subquery is quadratic in a hot user's
    // events). The two last() columns null out exactly the same rows,
    // so they read the ts and type of the SAME touch row — no struct
    // needed, and both engines support the ignore-nulls form. Lag
    // stays in exact integer micros (decimal(38,0) sum — micros ×
    // purchases passes a long at scale); order pinned NULLS LAST
    // (the q_markov_transitions contract).
    "q_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", unix_micros($"ts").as("tm"),
          $"event_type")
      val w = Window.partitionBy($"user_id")
        .orderBy($"tm".asc_nulls_last, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when($"event_type" =!= "purchase", $"tm")
      ev
        .withColumn("prev_tm", last(touch, ignoreNulls = true).over(w))
        .withColumn("prev_type", last(
          when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .withColumn("channel",
          when($"prev_tm".isNull || $"tm" - $"prev_tm" > AttribWindowMicros,
            lit("direct")).otherwise($"prev_type"))
        .withColumn("lag_us",
          when($"channel" =!= "direct", $"tm" - $"prev_tm"))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum($"lag_us".cast("decimal(38,0)")).as("s_us"),
          count($"lag_us").as("n_touched"))
        .select($"channel", $"n_purchases",
          when($"n_touched" > 0,
            round($"s_us".cast("double") / 60e6 / $"n_touched", 4))
            .as("avg_lag_min"))
        .orderBy($"channel")
    }),
  )

  /** Attribution lookback window (7 days, in event-time micros). */
  val AttribWindowMicros: Long = 7L * 24 * 3600 * 1000000L

  /** Gap-fill user slice bound — keeps the densified grid a stable,
    * scale-independent size for the oracle while exercising the full
    * generator + fill plan (a production run drops the filter).
    */
  val GapFillUsers = 40

  /** The distribution triple of `q_window_ntile` — ntile(4),
    * percent_rank, cume_dist per group — with NO per-group
    * single-task step, so it scales with cluster size however few
    * groups there are. The chunked scan is [[PrefixScan.scan]] with
    * weight 1: global rank i = exclusive count of predecessors + 1,
    * group size n = the group's total count.
    *
    * With the unique-orderkey tiebreak there are no rank ties, so the
    * distribution triple is pure integer arithmetic on (i, n):
    * Spark's ntile deals bucket sizes ⌈n/k⌉ to the first n mod k
    * buckets and ⌊n/k⌋ to the rest; percent_rank = (i−1)/(n−1);
    * cume_dist = i/n. AggJoinWindowSpec pins row-identical parity
    * against [[distributionWindowed]], including the n<k / n=k /
    * n≡k±1 group-size edges, and the result is partition-count
    * invariant by construction: chunk ids cancel out of (i, n).
    */
  private[graft] def distributionScaled(
      orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import orders.sparkSession.implicits._
    val pins = new graft.Pins
    pins.releaseOnMaterialize(
    PrefixScan.scan(
        orders.select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
        group = Seq("o_orderpriority"),
        sort = Seq($"o_totalprice".asc, $"o_orderkey".asc),
        weight = lit(1L),
        pins = pins)
      .withColumn("i", $"cum_before" + 1)
      .withColumn("n", $"grp_total")
      .select($"o_orderpriority", $"o_orderkey",
        PrefixScan.ntileOf($"i", $"n", 4).as("quartile"),
        when($"n" > 1, round(($"i" - 1).cast("double") / ($"n" - 1), 4))
          .otherwise(lit(0.0)).as("pct_rank"),
        round($"i".cast("double") / $"n", 4).as("cume"))
      .orderBy($"o_orderpriority", $"o_orderkey"))
  }

  /** The single-window formulation — every group on one task; retained
    * as the independent reference implementation AggJoinWindowSpec
    * checks [[distributionScaled]] against.
    */
  private[graft] def distributionWindowed(
      orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import orders.sparkSession.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    orders
      .select($"o_orderpriority", $"o_orderkey",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  override def oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(RANK() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk, o_orderkey""".stripMargin,
    "q_window_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |  LEAD(o_orderdate, 1) OVER w AS valid_to,
        |  (LEAD(o_orderdate, 1) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "q_window_runsum" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT user_id, event_id, value,
        |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_window_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey, day,
        |    day - CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY day) AS INT) AS grp
        |  FROM days)
        |SELECT o_custkey,
        |  strftime(MIN(day), '%Y-%m-%d') AS island_start,
        |  COUNT(*) AS island_days
        |FROM g GROUP BY o_custkey, grp
        |HAVING COUNT(*) >= 2
        |ORDER BY o_custkey, island_start""".stripMargin,
    "q_window_range_frame" ->
      """SELECT user_id, event_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS hour_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 4) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_gap_fill" ->
      s"""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS d, ROUND(SUM(value), 4) AS v
         |  FROM events WHERE user_id < $GapFillUsers
         |  GROUP BY user_id, CAST(ts AS DATE)),
         |cal AS (
         |  SELECT user_id,
         |    CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
         |  FROM (SELECT user_id, MIN(d) AS mn, MAX(d) AS mx
         |        FROM daily GROUP BY user_id)),
         |j AS (
         |  SELECT cal.user_id, cal.d, daily.v
         |  FROM cal LEFT JOIN daily USING (user_id, d))
         |SELECT user_id, CAST(d AS TIMESTAMP) AS d,
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
         |  v IS NULL AS was_gap
         |FROM j ORDER BY user_id, d""".stripMargin,
    "q_attribution" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tm, event_type
         |  FROM events),
         |touched AS (
         |  SELECT event_id, user_id, tm, event_type,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN tm END
         |      IGNORE NULLS) OVER w AS prev_tm,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
         |      IGNORE NULLS) OVER w AS prev_type
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY tm NULLS LAST, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |attr AS (
         |  SELECT CASE WHEN prev_tm IS NULL
         |      OR tm - prev_tm > ${AttribWindowMicros} THEN 'direct'
         |      ELSE prev_type END AS channel,
         |    CASE WHEN prev_tm IS NOT NULL
         |      AND tm - prev_tm <= ${AttribWindowMicros}
         |      THEN tm - prev_tm END AS lag_us
         |  FROM touched WHERE event_type = 'purchase')
         |SELECT channel, COUNT(*) AS n_purchases,
         |  CASE WHEN COUNT(lag_us) > 0 THEN
         |    ROUND(CAST(SUM(CAST(lag_us AS HUGEINT)) AS DOUBLE)
         |      / 60e6 / COUNT(lag_us), 4) END AS avg_lag_min
         |FROM attr GROUP BY channel ORDER BY channel""".stripMargin,
  )
}
