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

  /** EWMA smoothing factor. EXACTLY 1/2 on purpose: every weight
    * α(1−α)ᵏ is a power of two, so pow() is exact in IEEE doubles in
    * BOTH engines — a 0.2/0.8 pair would make the whole chart depend
    * on two libms agreeing about pow(0.8, k) in the last ulp.
    */
  val EwmaAlpha = 0.5

  /** Control-chart width in population standard deviations. */
  val EwmaSigmas = 3.0

  /** Per-(event_type, day) counts as (event_type, x = epoch day,
    * y = count) — the daily series BOTH q_theil_sen and q_xcorr
    * derive their pairwise/lagged statistics from. One definition so
    * the two consumers (whose DuckDB twins share the same CTE shape)
    * cannot drift; each caller pins the result because it reads it
    * 2–3 times per materialization and the lineage is the row-scale
    * events scan.
    */
  private def dailyByType(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
      .select($"event_type", unix_date($"d").cast("long").as("x"),
        $"n".as("y"))
  }

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

    // [EXT r12] Per-segment OLS trend: slope + intercept of daily
    // revenue against the epoch-day axis for every order priority —
    // the "is this source growing or decaying" statistic behind
    // mixture re-weighting. The q_autocorr discipline: daily totals
    // in exact integer cents, the five regression sums in
    // decimal(38,0) (Σx·y reaches day(2e4)·cents(1e9)·days — past a
    // long at scale), closed-form slope/intercept in doubles only at
    // the end, intercept computed FROM the 6-dp-rounded slope so both
    // engines divide identical inputs. Per segment the regression
    // reads a |days|-row aggregate — calendar-bounded, never
    // row-count-bounded.
    "q_trend_fit" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.orders(s, dir)
        .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
        .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
        .select($"o_orderpriority", unix_date($"d").cast("long").as("x"),
          $"cents".as("y"))
      daily.groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
          sum($"x".cast("decimal(38,0)") * $"x").as("sxx"))
        .withColumn("slope",
          round(($"n".cast("double") * $"sxy".cast("double")
              - $"sx".cast("double") * $"sy".cast("double"))
            / ($"n".cast("double") * $"sxx".cast("double")
              - $"sx".cast("double") * $"sx".cast("double")), 6))
        .select($"o_orderpriority", $"n".as("n_days"), $"slope",
          round(($"sy".cast("double") - $"slope" * $"sx".cast("double"))
            / $"n", 4).as("intercept"))
        .orderBy($"o_orderpriority")
    }),

    // [EXT r12] EWMA control chart over daily event counts — the
    // level-tracking anomaly monitor next to q_changepoint's
    // level-shift detector. The recursion s_t = αx_t + (1−α)s_{t−1}
    // unrolls to the weighted sum s_t = Σᵢ w(t,i)·xᵢ, computed as a
    // self-join over the per-day aggregate: |days|² pairs, bounded by
    // the CALENDAR squared (the deliberate bounded-meta product — the
    // q_join_range argument), never by event volume. α = 1/2 keeps
    // every weight an exact power of two (see [[EwmaAlpha]]); the
    // flag compares 4-dp-rounded deviation against the 4-dp-rounded
    // control limit (the q_anomaly_zscore rounded-boundary contract),
    // with σ from exact integer count sums.
    "q_ewma_control" -> ((s, dir) => graft.Pins.scoped { pins =>
      import s.implicits._
      // `daily` is read THREE times per materialization — both sides
      // of the |days|² self-join plus the sig aggregate — and its
      // lineage is the row-scale events scan; the pin (released at
      // the result's first materialization) makes that scan run once.
      val daily = pins(Tables.events(s, dir)
        .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
        .withColumn("t", row_number().over(
          Window.partitionBy(lit(0)).orderBy($"d"))))
      val sig = daily.agg(
        count(lit(1)).as("nd"), sum($"n").as("sn"),
        sum($"n".cast("decimal(38,0)") * $"n").as("snn"))
      val w = when($"a.t" === 1, pow(lit(1) - EwmaAlpha, $"b.t" - 1))
        .otherwise(lit(EwmaAlpha) * pow(lit(1) - EwmaAlpha, $"b.t" - $"a.t"))
      val ewma = daily.as("a")
        .join(daily.as("b"), $"a.t" <= $"b.t")
        .groupBy($"b.d".as("d"), $"b.n".as("n"), $"b.t".as("t"))
        .agg(round(sum(w * $"a.n"), 6).as("ewma"))
      ewma
        .withColumn("prev", lag($"ewma", 1).over(
          Window.partitionBy(lit(0)).orderBy($"t")))
        .crossJoin(broadcast(sig))
        .withColumn("limit3s", round(lit(EwmaSigmas) * sqrt(
          ($"snn".cast("double") - $"sn".cast("double") * $"sn" / $"nd")
            / $"nd"), 4))
        .select($"d".cast("timestamp").as("day"), $"n".as("n_events"),
          $"ewma",
          coalesce(round(abs($"n" - $"prev"), 4) > $"limit3s", lit(false))
            .as("flag"))
        .orderBy($"day")
    }),

    // [EXT r12] Day-of-week seasonality profile with a χ² uniformity
    // statistic — the periodicity screen before weekly-seasonal
    // features are trusted. One groupBy on a 7-value key; shares and
    // χ² contributions from exact integer counts, the expected count
    // n/7 in doubles only at the end. Engine parity note: Spark's
    // dayofweek is 1=Sunday..7, DuckDB's 0=Sunday..6 — the oracle
    // adds 1 (the SURVEY §2.8 offset).
    "q_dow_profile" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables.events(s, dir)
        .groupBy(dayofweek($"ts").as("dow")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum($"n").as("nn"))
      counts.crossJoin(broadcast(tot))
        .withColumn("e", $"nn".cast("double") / 7)
        .select($"dow", $"n",
          round($"n".cast("double") / $"nn", 6).as("share"),
          round(($"n" - $"e") * ($"n" - $"e") / $"e", 4).as("chi2_contrib"))
        .orderBy($"dow")
    }),

    // [EXT r12] Additive day-of-week seasonal adjustment of the daily
    // event series: adjusted_t = n_t − mean(same DOW) + mean(all) —
    // the de-seasonalized series a changepoint/anomaly monitor should
    // run on when weekly periodicity is real (q_dow_profile is the
    // screen that says it is). Both means are exact-integer-sum /
    // count divisions over the |days|-row aggregate; the DOW window
    // partitions a calendar-bounded table 7 ways. Engine parity: the
    // oracle shifts DuckDB's 0-based dayofweek (§2.8).
    "q_seasonal_adjust" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
        .withColumn("dow", dayofweek($"d"))
      val g = daily.agg(avg($"n").as("g"))
      daily
        .withColumn("seasonal",
          avg($"n").over(Window.partitionBy($"dow")))
        .crossJoin(broadcast(g))
        .select($"d".cast("timestamp").as("day"), $"n".as("n_events"),
          $"dow",
          round($"seasonal", 4).as("seasonal"),
          round($"n" - $"seasonal" + $"g", 4).as("adjusted"))
        .orderBy($"day")
    }),

    // [EXT r12] User-lifetime survival curve: S(k) = fraction of
    // users whose observed activity span (last − first event day)
    // reaches at least k days — the Kaplan–Meier-shaped churn curve
    // (no censoring model: the fixture window is closed, so the span
    // IS the lifetime). One per-user min/max aggregate, then the
    // histogram + descending-CCDF window over the AGE-domain-bounded
    // table (≤ calendar days rows) — the q_degree_dist shape on the
    // time axis. Exact integers until the one share division.
    "q_survival" -> ((s, dir) => {
      import s.implicits._
      val ages = Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(datediff(max(to_date($"ts")), min(to_date($"ts"))).as("age"))
      val hist = ages.groupBy($"age").agg(count(lit(1)).as("n_users"))
      val tot = hist.agg(sum($"n_users").as("nn"))
      val wTail = Window.partitionBy(lit(0)).orderBy($"age".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("surviving", sum($"n_users").over(wTail))
        .crossJoin(broadcast(tot))
        .select($"age".as("age_days"), $"n_users", $"surviving",
          round($"surviving".cast("double") / $"nn", 6).as("survival"))
        .orderBy($"age_days")
    }),

    // [EXT r13] Theil–Sen robust trend per event type: the slope is
    // the MEDIAN of all pairwise slopes (yⱼ−yᵢ)/(xⱼ−xᵢ) over the
    // daily-count series — the estimator that shrugs off the outlier
    // days that drag q_trend_fit's OLS line (29.3% breakdown point,
    // Sen 1968). The pair join is |days|²-bounded PER TYPE (the
    // q_ewma_control bounded-meta product — calendar², never event
    // volume), and the median select runs a row_number over that same
    // bounded table. Each slope is ONE IEEE division of exact
    // integers (identical in both engines); the median averages the
    // one or two middle slopes by position, so ties in slope value
    // cannot change the selected VALUES; rounding only at the end.
    "q_theil_sen" -> ((s, dir) => graft.Pins.scoped { pins =>
      import s.implicits._
      // Read three times per materialization — both sides of the
      // pair self-join plus the nDays aggregate — so pinned (the
      // q_ewma_control discipline — exchange reuse is a planner
      // optimization, not a contract).
      val daily = pins(dailyByType(s, dir))
      val slopes = daily.as("a")
        .join(daily.as("b"),
          $"a.event_type" === $"b.event_type" && $"a.x" < $"b.x")
        .select($"a.event_type".as("event_type"),
          (($"b.y" - $"a.y").cast("double") / ($"b.x" - $"a.x")).as("slope"))
      val byType = Window.partitionBy($"event_type")
      val nDays = daily.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
      slopes
        .withColumn("m", count(lit(1)).over(byType))
        .withColumn("rn", row_number().over(byType.orderBy($"slope")))
        // Column `/` is DOUBLE division — floor() recovers the integer
        // median positions ⌊(m+1)/2⌋ and ⌊m/2⌋+1 (equal when m is odd).
        .filter($"rn" === floor(($"m" + 1) / 2) ||
          $"rn" === floor($"m" / 2) + 1)
        .groupBy($"event_type")
        .agg(max($"m").as("n_pairs"), round(avg($"slope"), 6).as("ts_slope"))
        .join(broadcast(nDays), Seq("event_type"))
        .select($"event_type", $"n_days", $"n_pairs", $"ts_slope")
        .orderBy($"event_type")
    }),

    // [EXT r13] Lead–lag cross-correlation: for every ORDERED pair of
    // event types, the lag k ∈ [0, XcorrMaxLag] maximizing the
    // Pearson correlation between series A's day-t count and series
    // B's day-(t+k) count — "does A lead B, and by how much", the
    // cross-series companion of q_autocorr's self-lag. The probe side
    // replicates the |days|·|types| daily table over XcorrMaxLag+1
    // lags (a broadcast of a 1-column literal frame), the join is a
    // shifted-day equi-join of two bounded aggregates, and the five
    // Pearson sums accumulate in decimal(38,0) (the q_trend_fit
    // guard). The argmax compares 6-dp-ROUNDED r (the q_argmax
    // rounded-boundary contract) with NULLS LAST pinned on both
    // engines (a zero-variance overlap nulls r via the NULLIF guard
    // instead of erroring).
    "q_xcorr" -> ((s, dir) => graft.Pins.scoped { pins =>
      import s.implicits._
      // Feeds both the lag-replicated probe side and the shifted-day
      // join side — pinned so the events scan behind it runs once.
      val daily = pins(dailyByType(s, dir))
      val lags = (0 to XcorrMaxLag).toDF("lag")
      val probe = daily
        .select($"event_type".as("ta"), $"x", $"y".as("ya"))
        .crossJoin(broadcast(lags))
        .withColumn("xb", $"x" + $"lag")
      val corr = probe
        .join(daily.select($"event_type".as("tb"), $"x".as("xb"),
          $"y".as("yb")), Seq("xb"))
        .filter($"ta" =!= $"tb")
        .groupBy($"ta", $"tb", $"lag")
        .agg(count(lit(1)).as("n"),
          sum($"ya").as("sa"), sum($"yb").as("sb"),
          sum($"ya".cast("decimal(38,0)") * $"yb").as("sab"),
          sum($"ya".cast("decimal(38,0)") * $"ya").as("saa"),
          sum($"yb".cast("decimal(38,0)") * $"yb").as("sbb"))
        .withColumn("r", round(
          ($"n".cast("double") * $"sab".cast("double")
            - $"sa".cast("double") * $"sb".cast("double"))
          / nullif(sqrt(
              ($"n".cast("double") * $"saa".cast("double")
                - $"sa".cast("double") * $"sa".cast("double"))
              * ($"n".cast("double") * $"sbb".cast("double")
                - $"sb".cast("double") * $"sb".cast("double"))),
            lit(0.0)), 6))
      corr
        .withColumn("rk", row_number().over(
          Window.partitionBy($"ta", $"tb")
            .orderBy(abs($"r").desc_nulls_last, $"lag".asc)))
        .filter($"rk" === 1)
        .select($"ta", $"tb", $"lag".as("best_lag"), $"n".as("n_days"), $"r")
        .orderBy($"ta", $"tb")
    }),
  )

  /** Maximum lead–lag offset probed by q_xcorr, in days (one week —
    * the same horizon as [[AutocorrLagDays]]).
    */
  val XcorrMaxLag = 7

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
    "q_trend_fit" ->
      """WITH daily AS (
        |  SELECT o_orderpriority,
        |    CAST(DATEDIFF('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS y
        |  FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)),
        |agg AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM daily GROUP BY o_orderpriority),
        |sl AS (
        |  SELECT o_orderpriority, n, sx, sy,
        |    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
        |  FROM agg)
        |SELECT o_orderpriority, n AS n_days, slope,
        |  ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |    / n, 4) AS intercept
        |FROM sl ORDER BY o_orderpriority""".stripMargin,
    "q_ewma_control" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events
        |  GROUP BY 1),
        |seq AS (
        |  SELECT d, n, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily),
        |sig AS (
        |  SELECT COUNT(*) AS nd, CAST(SUM(n) AS BIGINT) AS sn,
        |    SUM(CAST(n AS HUGEINT) * n) AS snn
        |  FROM daily),
        |ew AS (
        |  SELECT b.d, b.n, b.t,
        |    ROUND(SUM(CASE WHEN a.t = 1 THEN POWER(0.5, b.t - 1)
        |      ELSE 0.5 * POWER(0.5, b.t - a.t) END * a.n), 6) AS ewma
        |  FROM seq a JOIN seq b ON a.t <= b.t
        |  GROUP BY b.d, b.n, b.t),
        |lg AS (
        |  SELECT d, n, ewma, LAG(ewma, 1) OVER (ORDER BY t) AS prev
        |  FROM ew)
        |SELECT CAST(d AS TIMESTAMP) AS day, n AS n_events, ewma,
        |  COALESCE(ROUND(ABS(n - prev), 4) >
        |    ROUND(3.0 * SQRT((CAST(snn AS DOUBLE)
        |      - CAST(sn AS DOUBLE) * sn / nd) / nd), 4), FALSE) AS flag
        |FROM lg CROSS JOIN sig
        |ORDER BY day""".stripMargin,
    "q_dow_profile" ->
      """WITH counts AS (
        |  SELECT CAST(DAYOFWEEK(ts) + 1 AS INT) AS dow, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM counts)
        |SELECT dow, n,
        |  ROUND(CAST(n AS DOUBLE) / nn, 6) AS share,
        |  ROUND((n - nn / 7.0) * (n - nn / 7.0) / (nn / 7.0), 4)
        |    AS chi2_contrib
        |FROM counts CROSS JOIN tot
        |ORDER BY dow""".stripMargin,
    "q_seasonal_adjust" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events
        |  GROUP BY 1),
        |dowed AS (
        |  SELECT d, n, CAST(DAYOFWEEK(d) + 1 AS INT) AS dow FROM daily),
        |g AS (SELECT AVG(n) AS g FROM daily)
        |SELECT CAST(d AS TIMESTAMP) AS day, n AS n_events, dow,
        |  ROUND(AVG(n) OVER (PARTITION BY dow), 4) AS seasonal,
        |  ROUND(n - AVG(n) OVER (PARTITION BY dow) + g, 4) AS adjusted
        |FROM dowed CROSS JOIN g
        |ORDER BY day""".stripMargin,
    "q_survival" ->
      """WITH ages AS (
        |  SELECT user_id,
        |    CAST(DATEDIFF('day', MIN(CAST(ts AS DATE)),
        |      MAX(CAST(ts AS DATE))) AS INT) AS age
        |  FROM events GROUP BY user_id),
        |hist AS (
        |  SELECT age, COUNT(*) AS n_users FROM ages GROUP BY age),
        |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nn FROM hist)
        |SELECT age AS age_days, n_users,
        |  CAST(SUM(n_users) OVER (ORDER BY age DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS surviving,
        |  ROUND(CAST(SUM(n_users) OVER (ORDER BY age DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / nn, 6) AS survival
        |FROM hist CROSS JOIN tot
        |ORDER BY age_days""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    COUNT(*) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |nd AS (SELECT event_type, COUNT(*) AS n_days FROM daily
        |       GROUP BY event_type),
        |slopes AS (
        |  SELECT a.event_type, CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |ranked AS (
        |  SELECT event_type, slope,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn
        |  FROM slopes),
        |med AS (
        |  SELECT event_type, MAX(m) AS n_pairs,
        |    ROUND(AVG(slope), 6) AS ts_slope
        |  FROM ranked
        |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        |  GROUP BY event_type)
        |SELECT med.event_type, nd.n_days, med.n_pairs, med.ts_slope
        |FROM med JOIN nd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_xcorr" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS x,
         |    COUNT(*) AS y
         |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
         |lags AS (SELECT unnest(range($XcorrMaxLag + 1)) AS lag),
         |corr AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
         |    COUNT(*) AS n,
         |    CAST(SUM(a.y) AS BIGINT) AS sa, CAST(SUM(b.y) AS BIGINT) AS sb,
         |    SUM(CAST(a.y AS HUGEINT) * b.y) AS sab,
         |    SUM(CAST(a.y AS HUGEINT) * a.y) AS saa,
         |    SUM(CAST(b.y AS HUGEINT) * b.y) AS sbb
         |  FROM daily a CROSS JOIN lags l
         |  JOIN daily b ON b.x = a.x + l.lag AND a.event_type <> b.event_type
         |  GROUP BY 1, 2, 3),
         |rr AS (
         |  SELECT ta, tb, lag, n,
         |    ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
         |        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
         |      / NULLIF(SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
         |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
         |        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
         |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 0.0), 6)
         |      AS r
         |  FROM corr),
         |pick AS (
         |  SELECT ta, tb, lag, n, r,
         |    ROW_NUMBER() OVER (PARTITION BY ta, tb
         |      ORDER BY ABS(r) DESC NULLS LAST, lag ASC) AS rk
         |  FROM rr)
         |SELECT ta, tb, CAST(lag AS INT) AS best_lag, n AS n_days, r
         |FROM pick WHERE rk = 1 ORDER BY ta, tb""".stripMargin,
  )
}
