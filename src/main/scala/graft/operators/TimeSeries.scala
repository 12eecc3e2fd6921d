package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Time-series & drift statistics (SURVEY §2.14) — batch-drift
  * detection between corpus halves (PSI), periodicity measurement
  * (lagged autocorrelation), and level-shift detection (CUSUM
  * changepoint): the monitoring statistics a pipeline computes per
  * ingest batch before admitting it to training.
  *
  * Scale shapes: per-bin/per-day aggregates come first, so every
  * cumulative or comparison stage runs over a DOMAIN-BOUNDED table
  * (value bins, calendar days) whose size is fixed by the statistic's
  * domain, never the row count; cross-series arithmetic is exact
  * integer/decimal (cents, counts) with doubles only in final ratios
  * — the q_gini discipline.
  */
object TimeSeries extends QueryModule {

  /** PSI value-bin width and cap: bins of 25 capped at index 12 keep
    * the p99 of the generated value distribution inside the binned
    * range at every SF.
    */
  val PsiBinWidth = 25.0
  val PsiMaxBin = 12

  /** Autocorrelation lag in days (weekly seasonality probe). */
  val AutocorrLagDays = 7

  override def queries: Map[String, Query] = Map(
    // Population stability index between the month's first half and
    // second half (the reference batch vs the candidate batch of a
    // drift gate): fixed-width value bins, per-bin shares, contrib =
    // (p_cur − p_ref)·ln(p_cur/p_ref) ≥ 0. Bins empty on either side
    // are excluded (the standard practice; an epsilon floor would
    // make the statistic depend on an arbitrary constant). One
    // groupBy on a ≤13-value key; totals are a 1-row broadcast.
    "q_psi" -> ((s, dir) => {
      import s.implicits._
      val binned = Tables.events(s, dir)
        .select(least(floor($"value" / PsiBinWidth), lit(PsiMaxBin))
            .cast("int").as("bin"),
          (dayofmonth($"ts") <= 15).as("ref"))
      val counts = binned.groupBy($"bin")
        .agg(sum(when($"ref", 1L).otherwise(0L)).as("r"),
          sum(when($"ref", 0L).otherwise(1L)).as("c"))
      val tot = counts.agg(sum($"r").as("nr"), sum($"c").as("nc"))
      counts.filter($"r" > 0 && $"c" > 0)
        .crossJoin(broadcast(tot))
        .withColumn("pr", $"r".cast("double") / $"nr")
        .withColumn("pc", $"c".cast("double") / $"nc")
        .select($"bin",
          round($"pr", 6).as("p_ref"),
          round($"pc", 6).as("p_cur"),
          round(($"pc" - $"pr") * log($"pc" / $"pr"), 6).as("contrib"))
        .orderBy($"bin")
    }),

    // Lag-7 autocorrelation of daily order revenue (the weekly-
    // seasonality statistic): daily totals in exact integer cents,
    // self-join day d ↔ d+7, Pearson r from the five exact sums —
    // Σxy/Σx²/Σy² in decimal(38,0) (a day's cents reach ~1e9, so the
    // products overflow a long), doubles only in the closed-form
    // ratio. The join is day-keyed: |days| rows however many orders.
    "q_autocorr" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.orders(s, dir)
        .groupBy(to_date($"o_orderdate").as("d"))
        .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
      val pairs = daily.select($"d", $"cents".as("x"))
        .join(daily.select(date_sub($"d", AutocorrLagDays).as("d"),
          $"cents".as("y")), Seq("d"))
      pairs.agg(
          count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
          sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
          sum($"y".cast("decimal(38,0)") * $"y").as("syy"))
        .select(lit(AutocorrLagDays).as("lag_days"), $"n".as("n_pairs"),
          round(($"n".cast("double") * $"sxy".cast("double")
              - $"sx".cast("double") * $"sy".cast("double"))
            / sqrt(($"n".cast("double") * $"sxx".cast("double")
                - $"sx".cast("double") * $"sx".cast("double"))
              * ($"n".cast("double") * $"syy".cast("double")
                - $"sy".cast("double") * $"sy".cast("double"))), 6).as("r"))
    }),

    // CUSUM changepoint over daily event counts: the day t maximizing
    // |Σ_{i≤t} nᵢ − t·N/D| (deviation of the prefix from the global
    // mean line). Scaled by D to stay in exact integer arithmetic:
    // C_t = D·S_t − t·N. The cumulative runs over the per-day
    // aggregate — bounded by the calendar, not the event count — and
    // the argmax is a 1-row TakeOrdered with an earliest-day tiebreak.
    "q_changepoint" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
      val tot = daily.agg(sum($"n").as("nn"), count(lit(1)).as("dd"))
      val w = Window.partitionBy(lit(0)).orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("s", sum($"n").over(w))
        .withColumn("t", row_number().over(
          Window.partitionBy(lit(0)).orderBy($"d")))
        .crossJoin(broadcast(tot))
        .withColumn("dev", abs($"dd" * $"s" - $"t" * $"nn"))
        .orderBy($"dev".desc, $"d".asc)
        .limit(1)
        .select($"d".cast("timestamp").as("cp_day"),
          round($"dev".cast("double") / $"dd", 4).as("max_dev"),
          $"dd".as("n_days"), $"nn".as("n_events"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_psi" ->
      s"""WITH binned AS (
         |  SELECT CAST(LEAST(FLOOR(value / $PsiBinWidth), $PsiMaxBin) AS INT) AS bin,
         |    CAST(day(ts) <= 15 AS BOOLEAN) AS ref
         |  FROM events),
         |counts AS (
         |  SELECT bin,
         |    SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS r,
         |    SUM(CASE WHEN ref THEN 0 ELSE 1 END) AS c
         |  FROM binned GROUP BY bin),
         |tot AS (SELECT SUM(r) AS nr, SUM(c) AS nc FROM counts)
         |SELECT bin,
         |  ROUND(CAST(r AS DOUBLE) / nr, 6) AS p_ref,
         |  ROUND(CAST(c AS DOUBLE) / nc, 6) AS p_cur,
         |  ROUND((CAST(c AS DOUBLE) / nc - CAST(r AS DOUBLE) / nr)
         |    * LN((CAST(c AS DOUBLE) / nc) / (CAST(r AS DOUBLE) / nr)), 6)
         |    AS contrib
         |FROM counts CROSS JOIN tot
         |WHERE r > 0 AND c > 0
         |ORDER BY bin""".stripMargin,
    "q_autocorr" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |pairs AS (
         |  SELECT a.cents AS x, b.cents AS y
         |  FROM daily a JOIN daily b ON b.d = a.d + INTERVAL $AutocorrLagDays DAY),
         |agg AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy
         |  FROM pairs)
         |SELECT $AutocorrLagDays AS lag_days, n AS n_pairs,
         |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
         |FROM agg""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |  COUNT(*) AS dd FROM daily),
        |cum AS (
        |  SELECT d,
        |    SUM(n) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
        |    ROW_NUMBER() OVER (ORDER BY d) AS t
        |  FROM daily)
        |SELECT CAST(d AS TIMESTAMP) AS cp_day,
        |  ROUND(CAST(ABS(dd * s - t * nn) AS DOUBLE) / dd, 4) AS max_dev,
        |  dd AS n_days, nn AS n_events
        |FROM cum CROSS JOIN tot
        |ORDER BY ABS(dd * s - t * nn) DESC, d ASC
        |LIMIT 1""".stripMargin,
  )
}
