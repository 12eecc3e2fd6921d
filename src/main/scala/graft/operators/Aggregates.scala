package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Accumulator for [[GeoMean]]: running Σln(x) and count. */
case class GeoMeanBuf(sumLn: Double, n: Long)

/** Geometric mean as a typed `Aggregator` — the §2.10 UDAF surface.
  * Partial aggregation works like any built-in (reduce per partition,
  * merge partials), so the shuffle moves one (Σln, n) pair per group.
  * Honest tradeoff, and why this is the repo's ONLY custom aggregate:
  * a registered Aggregator plans as ObjectHashAggregate over JVM
  * objects — outside whole-stage codegen — so built-ins beat it
  * whenever they can express the logic (here `exp(avg(ln(x)))` is the
  * built-in twin and the oracle); reach for an Aggregator only for
  * state no built-in composition can carry.
  */
object GeoMean extends org.apache.spark.sql.expressions.Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf =
    GeoMeanBuf(b.sumLn + math.log(x), b.n + 1)
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.sumLn + b.sumLn, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) 0.0 else math.exp(b.sumLn / b.n)
  override def bufferEncoder: org.apache.spark.sql.Encoder[GeoMeanBuf] =
    org.apache.spark.sql.Encoders.product[GeoMeanBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}

/** Aggregation breadth: single/multi-key hash group-counts (the
  * reference's `groupBy(...).count()` at `Code/flight_analysis.py:147-148,
  * 197-202`), plus [EXT] TPC-H-Q1-shape summary aggregates, exact and
  * approximate distinct counts, and rollup — all planned as partial
  * (map-side) + final `HashAggregateExec` around one hash-partition
  * exchange, so the shuffle moves pre-aggregated groups, not rows.
  *
  * Double sums are rounded to 4 decimals in both engines: FP summation
  * order differs between Spark partitions and DuckDB, so unrounded
  * sums are not comparable (SURVEY §5 determinism rules).
  */
object Aggregates extends QueryModule {

  override def queries: Map[String, Query] = Map(
    // Two-key group-count with multi-key descending sort
    // (`Code/flight_analysis.py:147-152`).
    "q_group2_count" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"o_orderstatus".asc, $"o_orderpriority".asc)
    }),

    // [EXT] TPC-H Q1-shape pricing summary: sum/avg/min/max/count.
    "q_agg_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_quantity" <= 49)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 4).as("sum_qty"),
          round(sum($"l_extendedprice"), 4).as("sum_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // [EXT] exact distinct cardinalities (expand-based multi-distinct).
    "q_count_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_returnflag").as("n_flags"))
    }),

    // [EXT] approximate distinct via HLL++ — sketch internals differ
    // from DuckDB's, so no hash oracle (rows-only check); the exact
    // twin q_count_distinct carries the oracle, and a spec bounds the
    // relative error at 5% (rsd=0.02 sizes the sketch for that bound
    // with margin; the 0.05 default missed it on small cardinalities).
    "q_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).agg(
        approx_count_distinct($"l_partkey", rsd = 0.02).as("approx_parts"),
        approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx_orders"))
    }),

    // [EXT] MERGEABLE distinct state — the incremental form of
    // COUNT(DISTINCT) that q_agg_incremental's contract names:
    // additive counts merge by +, distinct state merges by sketch
    // union. One DataSketches-HLL sketch per source plays the stored
    // per-batch state (at 100 TB: a binary column in the state table,
    // refreshed per batch); the corpus-wide distinct count is the
    // UNION of those sketches — no history rescan, and the union is
    // associative/commutative so batches merge in any order. No
    // oracle (sketch internals are engine-specific — same contract as
    // q_approx_distinct); AggJoinWindowSpec proves union-of-partials
    // ≡ direct single-pass sketch EXACTLY and pins the estimate to
    // the true distinct count on the fixture cardinality. lgConfigK
    // is 14, not the default 12, deliberately: the union gadget
    // promotes out of exact set-mode earlier than a single sketch
    // does (at lgK=12 a 500-item union already estimated 491), and
    // 2^14 registers keep the union exact through the fixture range
    // while costing 16 KB per sketch — at real cardinalities the
    // estimate is ±0.8% rse, the documented trade.
    "q_hll_merge" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"source")
        .agg(hll_sketch_agg($"doc_id", lit(14)).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_distinct_docs"))
    }),

    // [EXT] rollup: per-(flag,status), per-flag subtotals, grand total.
    // Subtotal rows carry NULL group keys → sort NULLS FIRST on both
    // engines (Spark asc default is nulls-first; DuckDB's is not).
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 4).as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // [EXT] cube: every grouping-set combination. Subtotal NULLs are
    // labeled 'ALL' (the group keys are never null in the data), which
    // keeps the output deterministic-sortable without engine-specific
    // GROUPING() functions.
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum($"o_totalprice"), 4).as("sum_price"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"cnt", $"sum_price")
        .orderBy($"status", $"priority")
    }),

    // [EXT] arbitrary grouping sets — the general form rollup/cube are
    // sugar for: an asymmetric set list ((flag,status), (status), ())
    // that neither rollup nor cube produces. One shuffle computes all
    // three granularities (Catalyst expands the sets into a single
    // Expand + hash aggregate, not one pass per set). Subtotal NULLs
    // are labeled 'ALL' as in q_cube, keeping the oracle free of
    // engine-specific GROUPING() forms.
    "q_grouping_sets" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_linestatus"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 4).as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("flag"),
          coalesce($"l_linestatus", lit("ALL")).as("status"),
          $"cnt", $"sum_qty")
        .orderBy($"flag", $"status")
    }),

    // [EXT] ordered funnel: users who viewed, then clicked AFTER their
    // first view, then purchased AFTER that first qualifying click.
    // Each stage is a per-user min-timestamp aggregate joined to the
    // previous stage — the stage tables shrink monotonically, every
    // join is on the user key (one co-partitioned exchange chain), and
    // nothing is ever ordered globally. The event-sequencing question
    // every product/conversion pipeline asks, without a sessionize +
    // sort pass.
    "q_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      // viewed/clicked each feed TWO consumers (the next stage's join
      // and their own count) — pinned so the stage aggregate runs once,
      // not once per consumer (self-join re-execution trap), with the
      // query's own first materialization releasing the scope.
      graft.Pins.scoped { pins =>
        val viewed = pins(ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("v_ts")))
        val clicked = pins(ev.filter($"event_type" === "click")
          .join(viewed, Seq("user_id"))
          .filter($"ts" >= $"v_ts")
          .groupBy($"user_id").agg(min($"ts").as("c_ts")))
        val purchased = ev.filter($"event_type" === "purchase")
          .join(clicked, Seq("user_id"))
          .filter($"ts" >= $"c_ts")
          .groupBy($"user_id").agg(min($"ts").as("p_ts"))
        viewed.agg(count(lit(1)).as("n_viewed"))
          .crossJoin(broadcast(clicked.agg(count(lit(1)).as("n_clicked"))))
          .crossJoin(broadcast(purchased.agg(count(lit(1)).as("n_purchased"))))
      }
    }),

    // [EXT] retention cohorts: customers grouped by first-order month,
    // counted as active in each later month — the classic cohort
    // retention matrix. First-order month is one per-key aggregate,
    // joined back on the customer key, then a two-key distinct count;
    // shuffles move (custkey) and (cohort, month, custkey) — never
    // order rows, never a self-join of the fact table.
    "q_retention_cohorts" -> ((s, dir) => {
      import s.implicits._
      // month rendered as ISO string — parquet DATE arrives in pandas
      // as python date objects while DuckDB emits datetime64; the
      // string form keeps the driver compare type-stable (same
      // convention as q_date_arith). Pinned: `o` feeds both the
      // first-month aggregate and the probe side of the join — without
      // the pin the orders scan + month formatting run twice; the
      // query's own first materialization releases the scope.
      graft.Pins.scoped { pins =>
        val o = pins(Tables.orders(s, dir)
          .select($"o_custkey",
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("order_month")))
        val firstMonth = o.groupBy($"o_custkey")
          .agg(min($"order_month").as("cohort_month"))
        o.join(firstMonth, Seq("o_custkey"))
          .groupBy($"cohort_month", $"order_month")
          .agg(countDistinct($"o_custkey").as("n_customers"))
          .withColumn("month_index",
            (($"order_month".substr(1, 4).cast("int") * 12 +
              $"order_month".substr(6, 2).cast("int")) -
             ($"cohort_month".substr(1, 4).cast("int") * 12 +
              $"cohort_month".substr(6, 2).cast("int"))).as("month_index"))
          .orderBy($"cohort_month", $"order_month")
      }
    }),

    // [EXT r12] Cohort lifetime value: cumulative revenue per customer
    // by cohort month and months-since-cohort — the LTV triangle next
    // to q_retention_cohorts' retention triangle. Revenue stays exact
    // integer cents through the cumulative window (which runs over
    // the cohort×age grid, bounded by the calendar squared, never
    // order volume) and the per-customer LTV is an INTEGER division
    // of exact cents — a double dollars-per-customer here landed on
    // a .00005 representational boundary where Spark's round()
    // (decimal rendering, HALF_UP) and DuckDB's (binary double)
    // disagree by one ulp; integer cents make the column a pure
    // function of the data in both engines. The month string
    // arithmetic is shared verbatim with the retention query so the
    // two triangles can never disagree on indexing.
    "q_cohort_ltv" -> ((s, dir) => {
      import s.implicits._
      graft.Pins.scoped { pins =>
        val o = pins(Tables.orders(s, dir)
          .select($"o_custkey",
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM")
              .as("order_month"),
            round($"o_totalprice" * 100).cast("long").as("cents")))
        val firstMonth = o.groupBy($"o_custkey")
          .agg(min($"order_month").as("cohort_month"))
        val sizes = firstMonth.groupBy($"cohort_month")
          .agg(count(lit(1)).as("n_customers"))
        val rev = o.join(firstMonth, Seq("o_custkey"))
          .withColumn("month_index",
            ($"order_month".substr(1, 4).cast("int") * 12 +
              $"order_month".substr(6, 2).cast("int")) -
            ($"cohort_month".substr(1, 4).cast("int") * 12 +
              $"cohort_month".substr(6, 2).cast("int")))
          .groupBy($"cohort_month", $"month_index")
          .agg(sum($"cents").as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"cohort_month").orderBy($"month_index")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        rev
          .withColumn("cum", sum($"c").over(w))
          .join(broadcast(sizes), Seq("cohort_month"))
          .select($"cohort_month", $"month_index", $"n_customers",
            expr("cum div n_customers").as("ltv_cents_per_customer"))
          .orderBy($"cohort_month", $"month_index")
      }
    }),

    // [EXT] argmax/argmin aggregates — "which row holds the extreme",
    // as a single map-side-combined aggregate instead of the window
    // (rn = 1) formulation (q_window_latest): no per-group sort, agg
    // state is one (value, arg) pair per group. The ordering value is
    // a (price, orderkey) STRUCT — Spark compares structs
    // lexicographically, so tied extremes resolve to the max/min
    // orderkey deterministically on ANY data, independent of partition
    // arrival order (round-4 ADVICE: bare max_by was only tie-free by
    // fixture luck). DuckDB's arg_max cannot order by a ROW, so the
    // oracle is the equivalent tiebroken window form.
    "q_argmax" -> ((s, dir) => {
      import s.implicits._
      val ord = struct($"o_totalprice", $"o_orderkey")
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          max_by($"o_orderkey", ord).as("top_orderkey"),
          max_by($"o_custkey", ord).as("top_custkey"),
          max($"o_totalprice").as("top_price"),
          min_by($"o_orderkey", ord).as("bottom_orderkey"))
        .orderBy($"o_orderpriority")
    }),

    // [EXT] HAVING — filter on aggregate outputs: customers with more
    // than 12 orders. In the DataFrame API this is just a filter above
    // the agg; Catalyst keeps it after the final HashAggregate, so the
    // predicate sees finished groups and nothing extra shuffles.
    "q_having" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 4).as("total_spend"))
        .filter($"n_orders" > 12)
        .orderBy($"o_custkey")
    }),

    // [EXT] share-of-total — each group's fraction of the corpus-wide
    // sum. The tempting formulation `sum(x).over(Window.partitionBy())`
    // funnels EVERY row through one partition (an unpartitioned window
    // is a single-reducer global sort) — the scale-correct shape is a
    // one-row aggregate broadcast-cross-joined into the per-group
    // results: two map-side-combined aggregates, zero single-partition
    // stages, same answer.
    "q_share_of_total" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val total = li.agg(sum($"l_extendedprice").as("grand_total"))
      li.groupBy($"l_returnflag")
        .agg(sum($"l_extendedprice").as("flag_total"))
        .crossJoin(broadcast(total))
        .select($"l_returnflag",
          round($"flag_total", 4).as("flag_total"),
          round($"flag_total" / $"grand_total", 6).as("share"))
        .orderBy($"l_returnflag")
    }),

    // [EXT] IQR outlier clipping — the standard numeric-cleaning step
    // before stats/training: rows outside [p25 - 1.5·IQR, p75 + 1.5·IQR]
    // are dropped. The quantiles are ONE tiny aggregate broadcast into
    // the filter (scalar cross-join, no driver pre-pass, no second
    // scan ordering anything); exact percentile keeps the oracle, at
    // 100 TB swap in approx_percentile (same plan shape — the
    // q_approx_percentiles pattern).
    "q_outlier_clip" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      // Quantiles rounded to cents BEFORE the bounds arithmetic:
      // Spark percentile() and DuckDB quantile_cont are both type-7
      // interpolation but can differ in the last ulp, and a row landing
      // exactly on an unrounded clip bound could flip membership
      // between engines (round-4 ADVICE). From cent-rounded inputs both
      // engines compute bit-identical doubles for the BETWEEN bounds.
      // Both quantiles from ONE percentile buffer (array form) — two
      // scalar calls would each keep a full copy of every price.
      val q = o.agg(expr("percentile(o_totalprice, array(0.25, 0.75))").as("qs"))
        .select(round(element_at($"qs", 1), 2).as("p25"),
          round(element_at($"qs", 2), 2).as("p75"))
      val iqr = $"p75" - $"p25"
      o.crossJoin(broadcast(q))
        .filter($"o_totalprice".between($"p25" - iqr * 1.5, $"p75" + iqr * 1.5))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_kept"),
          round(avg($"o_totalprice"), 4).as("avg_price"))
        .orderBy($"o_orderstatus")
    }),

    // [EXT] pivot: long→wide with an EXPLICIT value list — without it
    // Spark collects the distinct pivot values to the driver first (an
    // extra job and a scale hazard). Count cells are coalesced to 0 so
    // absent combinations are distinguishable from nulls.
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("f_cnt"),
          coalesce($"O", lit(0L)).as("o_cnt"),
          coalesce($"P", lit(0L)).as("p_cnt"))
        .orderBy($"o_orderpriority")
    }),

    // [EXT] skew-safe salted aggregation: pre-aggregate on
    // (key, salt) so one hot key spreads over 16 reducers, then
    // combine partials per key. Same result as the direct groupBy —
    // the oracle is the plain GROUP BY — but the shuffle is bounded
    // per reducer even when 99% of rows share one key. l_quantity is
    // integral, so the two-stage double sum is exact.
    "q_salted_agg" -> ((s, dir) => {
      import s.implicits._
      val partials = Tables.lineitem(s, dir)
        .withColumn("_salt", pmod(xxhash64($"l_orderkey"), lit(16)))
        .groupBy($"l_returnflag", $"_salt")
        .agg(sum($"l_quantity").as("psum"), count(lit(1)).as("pcnt"))
      partials.groupBy($"l_returnflag")
        .agg(round(sum($"psum"), 4).as("sum_qty"), sum($"pcnt").as("cnt"))
        .orderBy($"l_returnflag")
    }),

    // [EXT] shuffle-key skew profile — the diagnostic you run BEFORE
    // choosing a join/agg strategy (salt? AQE skew split? broadcast?):
    // the per-key row-count distribution of the prospective shuffle
    // key, as one summary row. Two-level aggregate: per-key counts
    // (map-side combined — the shuffle moves partials, not rows), then
    // scalar stats over the |keys|-row count table. Exact percentiles
    // anchor correctness at test scale; at 100 TB the count table is
    // still |keys| rows (fine) but the single-pass exact percentile
    // sort would be the cost — approx_percentile is the documented
    // production twin (q_approx_percentiles' tradeoff). skew_factor =
    // max/avg is the number the salting decision reads: ≈1 uniform,
    // ≫1 a hot key.
    "q_skew_profile" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_keys"),
          min($"c").as("min_c"),
          max($"c").as("max_c"),
          round(avg($"c"), 4).as("avg_c"),
          // one buffer for all three quantiles (the q_percentiles
          // pattern) — the |keys|-row count table is the largest
          // thing this global agg holds
          percentile($"c",
            array(lit(0.5), lit(0.9), lit(0.99))).as("ps"),
          round(max($"c") / avg($"c"), 4).as("skew_factor"))
        .select($"n_keys", $"min_c", $"max_c", $"avg_c",
          round(element_at($"ps", 1), 4).as("p50"),
          round(element_at($"ps", 2), 4).as("p90"),
          round(element_at($"ps", 3), 4).as("p99"),
          $"skew_factor")
    }),

    // [EXT] exact percentiles (linear interpolation, matching
    // ANSI/DuckDB quantile_cont) per group. At 100 TB prefer
    // approx_percentile (below); the exact operator is the
    // correctness anchor.
    "q_percentiles" -> ((s, dir) => {
      import s.implicits._
      // One percentile buffer per column, not per quantile: the array
      // form computes all three quantity quantiles from a single
      // sorted value buffer — three scalar percentile() calls would
      // each keep (and sort) their own copy of every group's values.
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          percentile($"l_quantity",
            array(lit(0.25), lit(0.5), lit(0.75))).as("qs"),
          round(percentile($"l_extendedprice", lit(0.5)), 4).as("median_price"))
        .select($"l_returnflag",
          round(element_at($"qs", 1), 4).as("p25"),
          round(element_at($"qs", 2), 4).as("p50"),
          round(element_at($"qs", 3), 4).as("p75"),
          $"median_price")
        .orderBy($"l_returnflag")
    }),

    // [EXT] ordered group concatenation (LISTAGG/string_agg):
    // collect_list → array_sort → array_join keeps the result
    // deterministic regardless of partition arrival order (an
    // unordered listagg is not oracle-comparable). Agg state is
    // bounded by group CONTENT size — fine for enum-like values,
    // a scale hazard for unbounded strings (then prefer top-K or
    // sketches).
    "q_group_concat" -> ((s, dir) => {
      import s.implicits._
      Tables.nation(s, dir)
        .groupBy($"n_regionkey")
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"))
        .orderBy($"n_regionkey")
    }),

    // [EXT] numeric histogram via closed-form binning (floor
    // arithmetic, not width_bucket — identical across engines): the
    // shuffle moves (bin, partial count), i.e. O(bins), regardless of
    // input size.
    "q_histogram" -> ((s, dir) => {
      import s.implicits._
      val lo = 900.0
      val hi = 105000.0
      val bins = 20
      Tables.orders(s, dir)
        .select(greatest(least(
          floor(($"o_totalprice" - lo) / ((hi - lo) / bins)).cast("int"),
          lit(bins - 1)), lit(0)).as("bin"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"bin")
    }),

    // [EXT] second-moment statistics per group: sample stddev,
    // covariance, Pearson correlation — single-pass partial+final
    // aggregation of (n, Σx, Σy, Σxy, Σx², Σy²) moments.
    "q_corr_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 4).as("cov_qty_price"),
          round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"))
        .orderBy($"l_returnflag")
    }),

    // [EXT] incremental aggregate-state merge — maintain corpus
    // statistics under continuous ingestion WITHOUT rescanning
    // history: per-key partial aggregates from the historical slice
    // (at 100 TB a stored state table, not a rescan — same contract as
    // q_dedup_incremental's fingerprint set) full-outer-merged with
    // the new batch's partials by adding the additive state
    // (counts/sums; avg derives from them, distinct-like state needs
    // mergeable sketches — the q_approx_distinct HLL family). The
    // oracle is the DIRECT full-corpus GROUP BY, so the compare itself
    // proves merge-of-partials ≡ aggregate-of-everything.
    "q_agg_incremental" -> ((s, dir) => {
      import s.implicits._
      // Pinned: the hist and batch sides otherwise each rescan and
      // re-tokenize the corpus (the filter is on a computed batch_idx,
      // so it cannot prune the scan — the twice-read-subtree trap).
      // The batch boundary is the ONE shared definition in
      // Tables.docBatchIdx, not a local copy of q_dedup_incremental's.
      // An unparseable source yields a NULL batch index, which plain
      // comparison would exclude from BOTH slices (failing < and >=)
      // while the full-corpus oracle counts it — so unclassifiable
      // rows ride with the incoming batch (they belong to no stored
      // historical partial by construction). Every row lands in
      // exactly one slice on ANY data, which the merge ≡ recompute
      // contract requires.
      graft.Pins.scoped { pins =>
        val docs = pins(Tables.documents(s, dir)
          .withColumn("batch_idx",
            coalesce(Tables.docBatchIdx($"source"), lit(Tables.HistoryBatches)))
          .select($"lang", $"batch_idx",
            graft.functions.Text.tokenCount($"text").as("n_tok")))
        def partials(slice: org.apache.spark.sql.DataFrame) =
          slice.groupBy($"lang").agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tok").cast("long").as("n_tokens"))
        val hist = partials(docs.filter($"batch_idx" < Tables.HistoryBatches))
        val batch = partials(docs.filter($"batch_idx" >= Tables.HistoryBatches))
        // Null-safe key: with plain equality a NULL-lang group would
        // split into two rows instead of merging (latent — the fixtures
        // carry no NULL lang — but the merge ≡ recompute claim must
        // hold on any data).
        hist.as("h").join(batch.as("b"), $"h.lang" <=> $"b.lang", "full_outer")
          .select(coalesce($"h.lang", $"b.lang").as("lang"),
            (coalesce($"h.n_docs", lit(0L)) + coalesce($"b.n_docs", lit(0L))).as("n_docs"),
            (coalesce($"h.n_tokens", lit(0L)) + coalesce($"b.n_tokens", lit(0L))).as("n_tokens"))
          .orderBy($"lang")
      }
    }),

    // [EXT] UDAF surface (§2.10): per-group geometric mean via the
    // typed Aggregator above. The oracle is the built-in composition
    // exp(avg(ln(x))) — mathematically identical, and the form to
    // prefer in production (see [[GeoMean]]'s codegen caveat); prices
    // are strictly positive so ln is total.
    "q_udaf_geomean" -> ((s, dir) => {
      import s.implicits._
      s.udf.register("geomean", udaf(GeoMean))
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(round(expr("geomean(l_extendedprice)"), 4).as("geo_price"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    }),

    // [EXT] higher central moments — skewness and excess kurtosis per
    // group via Spark's ONE-PASS moment aggregates (numerically stable
    // central-moment accumulation, partial+final merge like any hash
    // agg — the single-pass property is what matters at 100 TB, where
    // a two-pass mean-then-moments formulation would scan twice).
    // Spark's definitions are the population forms (m3/m2^1.5,
    // m4/m2²−3); DuckDB's built-ins apply sample corrections, so the
    // oracle derives the population forms from a two-pass central CTE
    // on l_quantity (small integral values — no cancellation).
    "q_moments" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(skewness($"l_quantity"), 4).as("skew"),
          round(kurtosis($"l_quantity"), 4).as("kurt"))
        .orderBy($"l_returnflag")
    }),

    // [EXT] per-group z-score anomaly detection: events whose value
    // sits more than 2.5 population standard deviations from their
    // type's mean. The per-type stats are one map-side-combined
    // aggregate (group count = event types, tiny) broadcast back onto
    // the stream — two scans, zero single-partition stages, no window.
    // The stats are rounded to 6 dp BEFORE the z arithmetic so both
    // engines compute identical doubles at the |z| > 2.5 boundary
    // (same cent-rounding discipline as q_outlier_clip; Spark and
    // DuckDB moment aggregates can differ in the last ulp).
    "q_anomaly_zscore" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val stats = ev.groupBy($"event_type")
        .agg(round(avg($"value"), 6).as("mu"),
          round(stddev_pop($"value"), 6).as("sigma"))
      // sigma > 0 guards the degenerate constant-valued group: Spark's
      // non-ANSI Divide returns NULL for x/0 (rows silently vanish in
      // the filter) while DuckDB returns ±inf (rows flagged) — the one
      // input where the engines would disagree. A zero-variance group
      // has no outliers by definition, so excluding it is also the
      // right semantics, stated identically in both engines.
      ev.join(broadcast(stats), Seq("event_type"))
        .filter($"sigma" > 0)
        .withColumn("z", ($"value" - $"mu") / $"sigma")
        .filter(abs($"z") > 2.5)
        .select($"event_id", $"event_type", $"value", round($"z", 4).as("z"))
        .orderBy($"event_id")
    }),

    // [EXT] deterministic per-group mode: the most frequent order
    // priority per status, lowest-value tiebreak. Count then
    // rank-within-group — the rn=1 window runs over the GROUPED counts
    // (|statuses × priorities| rows), not the base table, and Spark
    // rewrites it to Partial+Final WindowGroupLimit, so nothing
    // resembling the input size ever sorts.
    "q_mode" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables.orders(s, dir)
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderstatus").orderBy($"cnt".desc, $"o_orderpriority".asc)
      counts.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_orderstatus", $"o_orderpriority".as("mode_priority"), $"cnt")
        .orderBy($"o_orderstatus")
    }),

    // [EXT] approximate percentiles — the 100 TB scale path for
    // q_percentiles: GK-sketch state is O(1/accuracy) per group and
    // merges associatively (exact percentile buffers every value per
    // group). accuracy=10000 bounds rank error at n/10000. No oracle —
    // sketch internals are engine-specific, same contract as the HLL
    // pattern: the exact query is the anchor, a spec bounds the error.
    "q_approx_percentiles" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          // one GK sketch serves all three quantity quantiles (the
          // q_percentiles buffer pattern; here it also means one
          // sketch update per value instead of three)
          approx_percentile($"l_quantity",
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"),
          round(approx_percentile($"l_extendedprice", lit(0.5), lit(10000)), 4).as("median_price"))
        .select($"l_returnflag",
          round(element_at($"qs", 1), 4).as("p25"),
          round(element_at($"qs", 2), 4).as("p50"),
          round(element_at($"qs", 3), 4).as("p75"),
          $"median_price")
        .orderBy($"l_returnflag")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_group2_count" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY cnt DESC, o_orderstatus, o_orderpriority""".stripMargin,
    "q_agg_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 4) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 4) AS sum_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS cnt
        |FROM lineitem WHERE l_quantity <= 49
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_count_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem""".stripMargin,
    "q_argmax" ->
      """WITH top AS (
        |  SELECT o_orderpriority, o_orderkey AS top_orderkey,
        |         o_custkey AS top_custkey, o_totalprice AS top_price
        |  FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) = 1),
        |bot AS (
        |  SELECT o_orderpriority, o_orderkey AS bottom_orderkey
        |  FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) = 1)
        |SELECT t.o_orderpriority, top_orderkey, top_custkey, top_price,
        |       bottom_orderkey
        |FROM top t JOIN bot b ON t.o_orderpriority = b.o_orderpriority
        |ORDER BY t.o_orderpriority""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 4) AS total_spend
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) > 12
        |ORDER BY o_custkey""".stripMargin,
    "q_share_of_total" ->
      """WITH t AS (SELECT SUM(l_extendedprice) AS grand_total FROM lineitem)
        |SELECT l_returnflag,
        |  ROUND(SUM(l_extendedprice), 4) AS flag_total,
        |  ROUND(SUM(l_extendedprice) / grand_total, 6) AS share
        |FROM lineitem, t
        |GROUP BY l_returnflag, grand_total
        |ORDER BY l_returnflag""".stripMargin,
    "q_outlier_clip" ->
      """WITH q AS (
        |  SELECT ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |         ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75
        |  FROM orders)
        |SELECT o_orderstatus, COUNT(*) AS n_kept,
        |  ROUND(AVG(o_totalprice), 4) AS avg_price
        |FROM orders, q
        |WHERE o_totalprice BETWEEN p25 - 1.5 * (p75 - p25)
        |                       AND p75 + 1.5 * (p75 - p25)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_funnel" ->
      """WITH viewed AS (
        |  SELECT user_id, MIN(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |clicked AS (
        |  SELECT e.user_id, MIN(e.ts) AS c_ts
        |  FROM events e JOIN viewed v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
        |  GROUP BY e.user_id),
        |purchased AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN clicked c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |  GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM viewed) AS n_viewed,
        |  (SELECT COUNT(*) FROM clicked) AS n_clicked,
        |  (SELECT COUNT(*) FROM purchased) AS n_purchased""".stripMargin,
    "q_retention_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey, strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month
        |  FROM orders),
        |fm AS (
        |  SELECT o_custkey, MIN(order_month) AS cohort_month
        |  FROM o GROUP BY o_custkey)
        |SELECT cohort_month, order_month,
        |  COUNT(DISTINCT o.o_custkey) AS n_customers,
        |  CAST((CAST(order_month[1:4] AS INT) * 12 + CAST(order_month[6:7] AS INT))
        |     - (CAST(cohort_month[1:4] AS INT) * 12 + CAST(cohort_month[6:7] AS INT))
        |    AS INT) AS month_index
        |FROM o JOIN fm ON o.o_custkey = fm.o_custkey
        |GROUP BY cohort_month, order_month
        |ORDER BY cohort_month, order_month""".stripMargin,
    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
        |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |fm AS (
        |  SELECT o_custkey, MIN(order_month) AS cohort_month
        |  FROM o GROUP BY o_custkey),
        |sizes AS (
        |  SELECT cohort_month, COUNT(*) AS n_customers
        |  FROM fm GROUP BY cohort_month),
        |rev AS (
        |  SELECT cohort_month,
        |    CAST((CAST(order_month[1:4] AS INT) * 12 + CAST(order_month[6:7] AS INT))
        |       - (CAST(cohort_month[1:4] AS INT) * 12 + CAST(cohort_month[6:7] AS INT))
        |      AS INT) AS month_index,
        |    CAST(SUM(cents) AS BIGINT) AS c
        |  FROM o JOIN fm ON o.o_custkey = fm.o_custkey
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_month, month_index,
        |    SUM(c) OVER (PARTITION BY cohort_month ORDER BY month_index
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev)
        |SELECT cohort_month, month_index, n_customers,
        |  CAST(cum // n_customers AS BIGINT) AS ltv_cents_per_customer
        |FROM cum JOIN sizes USING (cohort_month)
        |ORDER BY cohort_month, month_index""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS cnt, ROUND(SUM(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  ROUND(SUM(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 4) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, ROUND(SUM(l_quantity), 4) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_group_concat" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(GREATEST(LEAST(FLOOR((o_totalprice - 900.0) / ((105000.0 - 900.0) / 20)), 19), 0) AS INT) AS bin,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin,
    "q_corr_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_incremental" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split_regex(text, '${graft.functions.Text.Ws}+'),
        |    t -> length(t) > 0))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin,
    "q_udaf_geomean" ->
      """SELECT l_returnflag,
        |  ROUND(exp(AVG(ln(l_extendedprice))), 4) AS geo_price,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_moments" ->
      """WITH mu AS (
        |  SELECT l_returnflag, AVG(l_quantity) AS m
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l.l_returnflag,
        |    AVG(POW(l_quantity - m, 2)) AS m2,
        |    AVG(POW(l_quantity - m, 3)) AS m3,
        |    AVG(POW(l_quantity - m, 4)) AS m4
        |  FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        |  GROUP BY l.l_returnflag)
        |SELECT l_returnflag,
        |  ROUND(m3 / POW(m2, 1.5), 4) AS skew,
        |  ROUND(m4 / (m2 * m2) - 3.0, 4) AS kurt
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH s AS (
        |  SELECT event_type, ROUND(AVG(value), 6) AS mu,
        |         ROUND(stddev_pop(value), 6) AS sigma
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |  ROUND((value - mu) / sigma, 4) AS z
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE sigma > 0 AND abs((value - mu) / sigma) > 2.5
        |ORDER BY event_id""".stripMargin,
    "q_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority
        |  QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY cnt DESC, o_orderpriority ASC) = 1)
        |ORDER BY o_orderstatus""".stripMargin,
    "q_skew_profile" ->
      """WITH c AS (
        |  SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)
        |SELECT COUNT(*) AS n_keys, MIN(c) AS min_c, MAX(c) AS max_c,
        |  ROUND(AVG(c), 4) AS avg_c,
        |  ROUND(quantile_cont(c, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(c, 0.9), 4) AS p90,
        |  ROUND(quantile_cont(c, 0.99), 4) AS p99,
        |  ROUND(MAX(c) / AVG(c), 4) AS skew_factor
        |FROM c""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
