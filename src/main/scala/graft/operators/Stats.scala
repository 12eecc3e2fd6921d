package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Distribution & experiment statistics (SURVEY §2.13) — the
  * "measure the data before you train on it" layer: concentration
  * (Gini), two-sample drift (KS), digit-distribution fraud checks
  * (Benford), robust per-group scaling (median/MAD), A/B conversion
  * testing (two-proportion z), time-decayed engagement, and
  * event-transition matrices. The reference's analytics stop at
  * cluster profiling (`Code/flight_analysis.py:147-152`); these are
  * the distribution-shift / experimentation statistics a production
  * pipeline runs next to it.
  *
  * Scale discipline shared by the module: every statistic reduces to
  * (a) integer counts shuffled by a bounded key, (b) a [[PrefixScan]]
  * rank when a GLOBAL order is required (never a single-task global
  * window over raw rows), or (c) a window over a DOMAIN-BOUNDED
  * aggregate (distinct 2-dp values, 9 digits, 25 type-pairs) whose
  * size is fixed by the value domain, not the data volume.
  */
object Stats extends QueryModule {

  /** Top-K users kept by the decay score (bounds the oracle diff). */
  val DecayTopK = 50

  /** Purchase value above which a user counts as converted — sits at
    * the ~45-50% per-user conversion quantile at every generated SF,
    * so neither variant's rate saturates to 0 or 1.
    */
  val AbConvValue = 150.0

  /** Bootstrap replica count for the CI of the mean. */
  val BootstrapReplicas = 32

  /** Replicas drawn per md5 digest: the 128-bit digest yields four
    * DISJOINT 28-bit lanes (hex chars [7i, 7i+7)), so B replicas cost
    * B/4 digests per row instead of B — the digest work, not the
    * aggregate, is the operator's dominant per-row term (measured:
    * the aggregate-shape rework alone left the sf0.1 time unchanged).
    * Disjoint bit ranges of one digest are independent uniforms;
    * replica b reads lane b mod 4 of digest `bs:<b div 4>:<key>`, so
    * replica 0 is bit-identical to the pre-lane scheme and the spec's
    * digest-chain replay pins both a lane-0 and a lane-3 replica.
    */
  val BootstrapLanes = 4

  /** The two order-priority segments Welch's t contrasts. */
  val WelchA = "1-URGENT"
  val WelchB = "5-LOW"

  /** Poisson(1) inverse-CDF thresholds on the 2²⁸ fixed-point scale:
    * a 28-bit md5 uniform u draws weight k for the first threshold it
    * falls under (0..5, else 6 — P(>6) ≈ 8·10⁻⁵). Computed ONCE here
    * and interpolated as integer literals into BOTH the Spark
    * expression and the DuckDB twin, so the resample weights are
    * exact integer comparisons — no RNG, no libm boundary — and the
    * whole bootstrap is a pure function of the data (the
    * q_priority_sample discipline).
    */
  val PoissonThresholds28: Seq[Long] = {
    val pdf = (0 to 5).map(k =>
      math.exp(-1.0) / (1 to k).map(_.toDouble).product)
    pdf.scanLeft(0.0)(_ + _).tail.map(c => (c * (1L << 28)).toLong)
  }

  override def queries: Map[String, Query] = Map(
    // Gini coefficient of per-customer revenue — the concentration
    // statistic behind "how head-heavy is this corpus/source". Needs a
    // GLOBAL ascending rank; a bare row_number() window would put the
    // whole table on one task, so the rank is a PrefixScan (range-
    // partitioned chunks + a chunks-sized meta window). Revenue is
    // fixed to integer cents first so every sum is exact integer
    // arithmetic (the rank-weighted sum goes through decimal(38,0):
    // Σ i·xᵢ overflows a long at ~1e9 rows × 1e7 cents); doubles
    // appear only in the final ratio. G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n.
    "q_gini" -> ((s, dir) => {
      import s.implicits._
      val rev = Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("g", lit(0))
      val pins = new graft.Pins
      pins.releaseOnMaterialize(
      PrefixScan.scan(rev, Seq("g"), Seq($"cents".asc, $"o_custkey".asc), lit(1L),
          pins = pins)
        .agg(
          sum(($"cum_before" + 1).cast("decimal(38,0)") * $"cents").as("s_ix"),
          sum($"cents").as("s_x"),
          max($"grp_total").as("n"))
        .select(
          round(lit(2.0) * $"s_ix".cast("double")
              / ($"n".cast("double") * $"s_x".cast("double"))
            - ($"n" + lit(1.0)) / $"n", 6).as("gini"),
          $"n".as("n_customers")))
    }),

    // Two-sample Kolmogorov–Smirnov: D = max |F₁(x) − F₂(x)| between
    // the click and view value distributions (the drift test between a
    // new batch and the corpus it joins). Per-value counts aggregate
    // first — the cumulative window then runs over the DISTINCT-value
    // table, whose size is bounded by the 2-dp value domain (a few
    // thousand rows at any data scale), the same bounded-meta-window
    // argument as PrefixScan's step 3.
    //
    // NULL contract: rows with NULL value are excluded EXPLICITLY —
    // a NULL carries no position on the real line, so it contributes
    // no distribution mass to either CDF. Without the filter the two
    // engines would diverge on where NULL sorts in the cumulative
    // window (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST),
    // shifting k1/k2 and hence D — parity would hinge on fixture
    // cleanliness instead of a stated contract.
    "q_ks_test" -> ((s, dir) => {
      import s.implicits._
      val byV = Tables.events(s, dir)
        .filter($"event_type".isin("click", "view") && $"value".isNotNull)
        .select($"value", ($"event_type" === "click").as("is1"))
        .groupBy($"value")
        .agg(sum(when($"is1", 1L).otherwise(0L)).as("c1"),
          sum(when($"is1", 0L).otherwise(1L)).as("c2"))
      val w = Window.partitionBy(lit(0)).orderBy($"value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = byV.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      byV.select($"value", sum($"c1").over(w).as("k1"), sum($"c2").over(w).as("k2"))
        .crossJoin(broadcast(tot))
        .agg(
          max(abs($"k1".cast("double") / $"n1" - $"k2".cast("double") / $"n2")).as("d"),
          max($"n1").as("n1"), max($"n2").as("n2"))
        .select(
          round($"d", 6).as("d_stat"),
          round(sqrt($"n1".cast("double") * $"n2".cast("double")
            / ($"n1" + $"n2").cast("double")) * $"d", 6).as("ks_stat"),
          $"n1", $"n2")
    }),

    // Benford first-digit profile of order totals — the classic
    // generated-vs-organic distribution check (fraud/synthetic-data
    // screening). One groupBy on a 9-value key; the share window runs
    // over the 9-row aggregate. Expected mass is log10(1 + 1/d).
    "q_benford" -> ((s, dir) => {
      import s.implicits._
      val digits = Tables.orders(s, dir)
        .filter($"o_totalprice" > 0)
        .select(floor($"o_totalprice"
          / pow(lit(10.0), floor(log10($"o_totalprice")))).cast("int").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n"))
      digits
        .withColumn("total", sum($"n").over(Window.partitionBy(lit(0))))
        .select($"digit", $"n",
          round($"n".cast("double") / $"total", 6).as("obs_p"),
          round(log10(lit(1.0) + lit(1.0) / $"digit"), 6).as("benford_p"))
        .orderBy($"digit")
    }),

    // Robust per-group scaling parameters: exact median and MAD of
    // account balances per market segment, plus the count of robust
    // outliers (|x − med| > 3·1.4826·MAD ≈ 3σ under normality). Two
    // exact-percentile aggregation passes with the tiny per-segment
    // parameter tables broadcast back — the median-of-deviations is
    // inherently two-phase; no global sort, no per-group single task
    // (percentile is an aggregate, not a window).
    "q_robust_scale" -> ((s, dir) => {
      import s.implicits._
      val bal = Tables.customer(s, dir).select($"c_mktsegment", $"c_acctbal")
      val med = bal.groupBy($"c_mktsegment")
        .agg(expr("percentile(c_acctbal, 0.5)").as("med"))
      val dev = bal.join(broadcast(med), "c_mktsegment")
        .withColumn("ad", abs($"c_acctbal" - $"med"))
      val mad = dev.groupBy($"c_mktsegment")
        .agg(expr("percentile(ad, 0.5)").as("mad"))
      dev.join(broadcast(mad), "c_mktsegment")
        .groupBy($"c_mktsegment")
        .agg(round(max($"med"), 4).as("med"),
          round(max($"mad"), 4).as("mad"),
          sum(when($"ad" > lit(3.0) * lit(1.4826) * $"mad", 1L).otherwise(0L))
            .as("n_outliers"),
          count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    }),

    // Two-proportion z-test on a deterministic 50/50 user split:
    // variant = user_id mod 2 (a production assignment salts a hash;
    // the modulus keeps the fixture a pure function of the data),
    // conversion = "ever made a high-value purchase" (> the
    // [[AbConvValue]] cut — every user trips a bare any-purchase
    // predicate at every SF, which degenerates p̂(1−p̂) to 0 and the
    // z denominator with it). Per-user reduction shuffles on user_id
    // once; the variant contrast is a single global aggregate.
    // z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b)), pooled p̂.
    "q_ab_lift" -> ((s, dir) => {
      import s.implicits._
      val conv = Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase" && $"value" > AbConvValue, 1L)
          .otherwise(0L)).as("cv"))
        .withColumn("v", pmod($"user_id", lit(2)))
      conv.agg(
          sum(when($"v" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"v" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"v" === 0, $"cv").otherwise(0L)).as("conv_a"),
          sum(when($"v" === 1, $"cv").otherwise(0L)).as("conv_b"))
        .withColumn("pa", $"conv_a".cast("double") / $"n_a")
        .withColumn("pb", $"conv_b".cast("double") / $"n_b")
        .withColumn("pp", ($"conv_a" + $"conv_b").cast("double") / ($"n_a" + $"n_b"))
        .select($"n_a", $"n_b", $"conv_a", $"conv_b",
          round($"pa", 6).as("rate_a"),
          round($"pb", 6).as("rate_b"),
          round($"pb" / $"pa" - 1.0, 6).as("lift"),
          round(($"pb" - $"pa")
            / sqrt($"pp" * (lit(1.0) - $"pp")
              * (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")), 4).as("z"))
    }),

    // Exponentially time-decayed engagement score per user (τ = 7
    // days): Σ exp((tᵢ − t_ref)/τ) with t_ref = the corpus max —
    // the freshness-weighted activity statistic behind recency-aware
    // sampling weights. The reference timestamp is a 1-row broadcast;
    // the score is one per-user aggregate. Sum order varies across
    // partitionings, so the score rounds at 4 dp (the q_tfidf
    // contract) before the top-K order.
    "q_decay_score" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir)
      val ref = e.agg(max($"ts").as("ref_ts"))
      e.crossJoin(broadcast(ref))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum(exp((unix_micros($"ts") - unix_micros($"ref_ts")).cast("double")
            / lit(604800e6))), 4).as("score"))
        .orderBy($"score".desc, $"user_id".asc)
        .limit(DecayTopK)
    }),

    // First-order Markov transition matrix over per-user event
    // sequences: P(next | prev) for every observed type pair. One
    // lead() window partitioned by user (per-user state, arbitrarily
    // parallel), one pair count whose key domain is |types|² = 25,
    // and a share window over that bounded aggregate.
    //
    // The sequence order is pinned NULLS LAST explicitly: Spark's
    // ASC default is NULLS FIRST, DuckDB's is NULLS LAST, so an
    // event with a NULL timestamp would land at opposite ends of its
    // user's sequence and flip transition pairs between engines.
    // Pinning (rather than filtering) keeps such events in the
    // chain — a missing timestamp still separates its neighbors —
    // with a deterministic cross-engine position.
    "q_markov_transitions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc_nulls_last, $"event_id".asc)
      val cnt = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .select($"event_type".as("prev_type"), $"next_type")
        .groupBy($"prev_type", $"next_type").agg(count(lit(1)).as("n"))
      cnt
        .withColumn("tot", sum($"n").over(Window.partitionBy($"prev_type")))
        .select($"prev_type", $"next_type", $"n",
          round($"n".cast("double") / $"tot", 6).as("p"))
        .orderBy($"prev_type", $"next_type")
    }),

    // [EXT r12] Mann–Whitney U (Wilcoxon rank-sum) between the click
    // and view value samples — the rank-based companion to q_ks_test
    // (robust to outliers, detects location shift). Midranks over the
    // DISTINCT-value table (bounded by the 2-dp domain) in DOUBLED
    // integer arithmetic so ties never produce a .5: midrank·2 =
    // 2·(rank before) + t + 1, R1·2 = Σ c1·midrank2 in decimal(38,0),
    // U1·2 = R1·2 − n1(n1+1). The tie-corrected normal approximation
    // σ² = (n1n2/12)((N+1) − Σ(t³−t)/(N(N−1))) goes to doubles only
    // in the closed form. NULL values excluded explicitly (the
    // q_ks_test contract).
    "q_mann_whitney" -> ((s, dir) => {
      import s.implicits._
      val byV = Tables.events(s, dir)
        .filter($"event_type".isin("click", "view") && $"value".isNotNull)
        .groupBy($"value")
        .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
          sum(when($"event_type" === "click", 0L).otherwise(1L)).as("c2"))
        .withColumn("t", $"c1" + $"c2")
      val w = Window.partitionBy(lit(0)).orderBy($"value")
        .rowsBetween(Window.unboundedPreceding, -1)
      byV
        .withColumn("mr2", lit(2) * coalesce(sum($"t").over(w), lit(0L))
          + $"t" + 1)
        .agg(
          sum($"c1").as("n1"), sum($"c2").as("n2"),
          sum(($"c1".cast("decimal(38,0)") * $"mr2")).as("r1x2"),
          sum(($"t".cast("decimal(38,0)") * $"t" * $"t" - $"t")).as("ties"))
        .withColumn("nn", $"n1" + $"n2")
        .withColumn("u1x2",
          $"r1x2" - ($"n1".cast("decimal(38,0)") * ($"n1" + 1)))
        .withColumn("var",
          $"n1".cast("double") * $"n2" / 12.0
            * (($"nn" + 1).cast("double")
              - $"ties".cast("double")
                / ($"nn".cast("double") * ($"nn" - 1))))
        .select($"n1", $"n2",
          ($"u1x2".cast("double") / 2).as("u1"),
          round(($"u1x2".cast("double") - $"n1".cast("double") * $"n2")
            / (lit(2.0) * sqrt($"var")), 6).as("z"))
    }),

    // [EXT r12] Poisson-bootstrap confidence interval of the mean
    // order value — the resampling CI a pipeline attaches to any
    // per-batch statistic. The classic n-out-of-n resample needs a
    // global coordinated draw; the Poisson(1) approximation gives
    // each (row, replica) an INDEPENDENT weight — the standard
    // distributed bootstrap — with the weight drawn by exact integer
    // comparison of a 28-bit md5 lane against the fixed-point
    // [[PoissonThresholds28]] (pure function of the data; oracle
    // replays the digest chain, four lanes per digest — see
    // [[BootstrapLanes]]). Plan: per-row weight columns into ONE
    // map-combined 2·B-accumulator global aggregate (no rows×B
    // intermediate), the percentile over the B-row replica means
    // (type-7, both engines). Exact integer cents throughout;
    // doubles only in each replica's final mean.
    "q_bootstrap_ci" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
        .select($"o_orderkey",
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val point = o.agg(count(lit(1)).as("n_orders"),
        sum($"cents".cast("decimal(38,0)")).as("sc"))
      val ci = bootstrapMeans(s, dir).agg(
        expr("percentile(m, array(0.025, 0.975))").as("q"))
      point.crossJoin(broadcast(ci))
        .select($"n_orders", lit(BootstrapReplicas).as("b_replicas"),
          round($"sc".cast("double") / $"n_orders" / 100, 4).as("point_mean"),
          round(element_at($"q", 1), 4).as("ci_lo"),
          round(element_at($"q", 2), 4).as("ci_hi"))
    }),

    // [EXT r12] Welch's unequal-variance t-test between the urgent
    // and low-priority order-value samples — the two-sample mean test
    // next to q_ab_lift's proportion test and q_mann_whitney's rank
    // test. ONE conditional-sum aggregate produces both samples'
    // (n, Σc, Σc²) in exact integers (cents; squares in
    // decimal(38,0)); means, variances, t, and the Welch–
    // Satterthwaite df close in doubles from those six exact sums —
    // per-group state is six numbers however many orders.
    "q_welch_t" -> ((s, dir) => {
      import s.implicits._
      val seg = Tables.orders(s, dir)
        .filter($"o_orderpriority".isin(WelchA, WelchB))
        .select(($"o_orderpriority" === WelchA).as("a"),
          round($"o_totalprice" * 100).cast("long").as("c"))
      seg.agg(
          sum(when($"a", 1L).otherwise(0L)).as("n1"),
          sum(when($"a", $"c").otherwise(0L)).as("s1"),
          sum(when($"a", $"c".cast("decimal(38,0)") * $"c").otherwise(0))
            .as("q1"),
          sum(when($"a", 0L).otherwise(1L)).as("n2"),
          sum(when($"a", 0L).otherwise($"c")).as("s2"),
          sum(when($"a", lit(0)).otherwise($"c".cast("decimal(38,0)") * $"c"))
            .as("q2"))
        .withColumn("v1", ($"q1".cast("double")
          - $"s1".cast("double") * $"s1" / $"n1") / ($"n1" - 1))
        .withColumn("v2", ($"q2".cast("double")
          - $"s2".cast("double") * $"s2" / $"n2") / ($"n2" - 1))
        .withColumn("se2", $"v1" / $"n1" + $"v2" / $"n2")
        .select($"n1", $"n2",
          round($"s1".cast("double") / $"n1" / 100, 4).as("mean1"),
          round($"s2".cast("double") / $"n2" / 100, 4).as("mean2"),
          round(($"s1".cast("double") / $"n1" - $"s2".cast("double") / $"n2")
            / sqrt($"se2"), 6).as("t"),
          round($"se2" * $"se2"
            / (($"v1" / $"n1") * ($"v1" / $"n1") / ($"n1" - 1)
              + ($"v2" / $"n2") * ($"v2" / $"n2") / ($"n2" - 1)), 2)
            .as("df"))
    }),

    // [EXT r12] Herfindahl–Hirschman concentration of supplier
    // revenue per nation — "is this market dominated by one
    // supplier", the concentration screen next to q_gini's
    // inequality. HHI = Σ shareᵢ² = Σcᵢ² / (Σcᵢ)², so both sums stay
    // exact integers per nation (cents; squares in decimal(38,0))
    // and ONE double division closes the statistic — no per-supplier
    // share materialized. Plan: fact⋈dim broadcast, two nested
    // bounded aggregates (supplier-, then nation-keyed), dim name
    // joined at the end.
    "q_hhi" -> ((s, dir) => {
      import s.implicits._
      val bySupp = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_nationkey", $"s_suppkey")
        .agg(round(sum($"l_extendedprice") * 100).cast("long").as("cents"))
      bySupp
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum($"cents".cast("decimal(38,0)")).as("sc"),
          sum($"cents".cast("decimal(38,0)") * $"cents").as("sc2"))
        .join(broadcast(Tables.nation(s, dir)),
          $"s_nationkey" === $"n_nationkey")
        .select($"n_name", $"n_suppliers",
          round($"sc2".cast("double")
            / ($"sc".cast("double") * $"sc".cast("double")), 6).as("hhi"))
        .orderBy($"n_name")
    }),

    // [EXT r13] CUPED variance-reduced experiment readout (Deng et
    // al., WSDM 2013): the pre-period purchase spend of each user is
    // the covariate X, the experiment-period spend the metric Y, and
    // the adjusted metric Y − θ(X − X̄) with θ = cov(X,Y)/var(X)
    // removes the variance X explains — the de-noising every mature
    // A/B platform applies before the q_ab_lift z-test. The variant
    // split is q_ab_lift's deterministic user_id mod 2; the
    // pre/post boundary is q_psi's mid-month day. EVERYTHING derives
    // from one per-user cents aggregate and ONE global sum row —
    // the adjusted group means are mean(Y_v) − θ(mean(X_v) − X̄),
    // so no per-row adjusted column is ever materialized, and the
    // variance reduction is exactly ρ²(X,Y) — both from the same
    // eleven exact sums (cents in long, cross-products in
    // decimal(38,0), the q_trend_fit guard). θ rounds at 6 dp
    // BEFORE the adjusted means are formed (the q_trend_fit
    // intercept-from-rounded-slope rule) so both engines subtract
    // identical inputs; NULLIF guards the zero-variance corner.
    "q_cuped" -> ((s, dir) => {
      import s.implicits._
      val cents = round($"value" * 100).cast("long")
      val perUser = Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(
          sum(when($"event_type" === "purchase" && dayofmonth($"ts") <= 15,
            cents).otherwise(0L)).as("x"),
          sum(when($"event_type" === "purchase" && dayofmonth($"ts") > 15,
            cents).otherwise(0L)).as("y"))
        .withColumn("v", pmod($"user_id", lit(2)))
      perUser.agg(
          count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
          sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
          sum($"y".cast("decimal(38,0)") * $"y").as("syy"),
          sum(when($"v" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"v" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"v" === 0, $"x").otherwise(0L)).as("sxa"),
          sum(when($"v" === 1, $"x").otherwise(0L)).as("sxb"),
          sum(when($"v" === 0, $"y").otherwise(0L)).as("sya"),
          sum(when($"v" === 1, $"y").otherwise(0L)).as("syb"))
        .withColumn("theta", round(
          ($"n".cast("double") * $"sxy".cast("double")
            - $"sx".cast("double") * $"sy".cast("double"))
          / nullif($"n".cast("double") * $"sxx".cast("double")
            - $"sx".cast("double") * $"sx".cast("double"), lit(0.0)), 6))
        .withColumn("mx", $"sx".cast("double") / $"n")
        .withColumn("adj_a", ($"sya".cast("double") / $"n_a"
          - $"theta" * ($"sxa".cast("double") / $"n_a" - $"mx")) / 100)
        .withColumn("adj_b", ($"syb".cast("double") / $"n_b"
          - $"theta" * ($"sxb".cast("double") / $"n_b" - $"mx")) / 100)
        .select($"n_a", $"n_b", $"theta",
          round($"syb".cast("double") / $"n_b" / 100
            - $"sya".cast("double") / $"n_a" / 100, 4).as("raw_diff"),
          round($"adj_b" - $"adj_a", 4).as("adj_diff"),
          round(($"n".cast("double") * $"sxy".cast("double")
              - $"sx".cast("double") * $"sy".cast("double"))
            * ($"n".cast("double") * $"sxy".cast("double")
              - $"sx".cast("double") * $"sy".cast("double"))
            / nullif(($"n".cast("double") * $"sxx".cast("double")
                - $"sx".cast("double") * $"sx".cast("double"))
              * ($"n".cast("double") * $"syy".cast("double")
                - $"sy".cast("double") * $"sy".cast("double")), lit(0.0)), 6)
            .as("var_reduction"))
    }),
  )

  /** The per-replica bootstrap means `(b, m)` — split out so the spec
    * can replay one replica's digest chain in the driver against the
    * distributed draw.
    *
    * Shape (reworked per the round-12 verdict): the former
    * rows × B explode fed ONE map-combined B-group aggregate — data-
    * proportional ×B row traffic through the aggregate (the round's
    * only 3.0× scaling ratio), and each exploded row paid its own md5.
    * Each row now computes B/[[BootstrapLanes]] digests, splits each
    * into four disjoint 28-bit lanes (replica b = lane b mod 4 of
    * digest `bs:<b div 4>:<key>` — hex chars [(b mod 4)·7, +7) parsed
    * base-16, the exact construction the DuckDB twin spells with
    * substr(md5(..))), and folds the whole table into a SINGLE global
    * aggregate with 2·B accumulators (Σwᵢ·cents as decimal(38,0),
    * Σwᵢ as long — exact integers, order-free). No rows×B
    * intermediate exists at any point and the digest count per row
    * dropped B → B/4; the replica means then unfold from the one-row
    * result into the same (b, m) B-row frame, and the percentile over
    * them is the SAME Spark aggregate as before (bit-identical to the
    * twin's quantile_cont). At 10× data the aggregate grows with
    * rows, not rows×B.
    */
  private[graft] def bootstrapMeans(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    def weight(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      PoissonThresholds28.zipWithIndex
        .foldRight(lit(6L): org.apache.spark.sql.Column) {
          case ((thr, k), acc) => when(u < thr, k.toLong).otherwise(acc)
        }
    // The draw projection is CPU-heavy per ROW (B/4 digests + B
    // threshold folds) over a byte-compact columnar scan — scan
    // partitioning follows bytes (maxPartitionBytes), so without an
    // explicit spread the whole corpus's draw work can land on a
    // handful of tasks (at sf0.1 the orders scan is ONE 2.7 MB split:
    // measured 3.2 s single-core vs ~0.3 s spread). One round-robin
    // shuffle of the two-column input buys full-cluster parallelism
    // for the dominant stage; the result is an order-free integer
    // sum, so the redistribution cannot change it.
    val o = Tables.orders(s, dir)
      .select($"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .repartition(s.sessionState.conf.numShufflePartitions)
    // One projection per stage — lane arrays (one codegen'd digest
    // each, no hex-string round trip: graft.plans.Md5Lanes), then
    // lane extraction, then the threshold fold — so CollapseProject
    // keeps each non-cheap expression single-evaluation however many
    // downstream references it has.
    val withH = (0 until BootstrapReplicas / BootstrapLanes).foldLeft(o) {
      (df, j) =>
        df.withColumn(s"h$j",
          call_function(graft.plans.Md5Prefix.LanesFunctionName,
            concat(lit(s"bs:$j:"), $"o_orderkey".cast("string")),
            lit(7), lit(BootstrapLanes)))
    }
    val withU = (0 until BootstrapReplicas).foldLeft(withH) { (df, b) =>
      df.withColumn(s"u$b",
        element_at(col(s"h${b / BootstrapLanes}"), b % BootstrapLanes + 1))
    }
    val withW = (0 until BootstrapReplicas).foldLeft(withU) { (df, b) =>
      df.withColumn(s"w$b", weight(col(s"u$b")))
    }
    val accs = (0 until BootstrapReplicas).flatMap { b =>
      Seq(sum((col(s"w$b") * $"cents").cast("decimal(38,0)")).as(s"s$b"),
        sum(col(s"w$b")).as(s"n$b"))
    }
    withW.agg(accs.head, accs.tail: _*)
      .select(posexplode(array((0 until BootstrapReplicas).map(b =>
        col(s"s$b").cast("double") / col(s"n$b") / 100): _*)))
      .toDF("b", "m")
  }

  override def oracles: Map[String, String] = Map(
    "q_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |rk AS (
        |  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
        |  FROM rev)
        |SELECT
        |  ROUND(2.0 * CAST(SUM(CAST(i AS HUGEINT) * cents) AS DOUBLE)
        |      / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
        |    - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
        |  COUNT(*) AS n_customers
        |FROM rk""".stripMargin,
    "q_ks_test" ->
      """WITH byv AS (
        |  SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |  GROUP BY value),
        |cum AS (
        |  SELECT
        |    SUM(c1) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k1,
        |    SUM(c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k2
        |  FROM byv),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |  CAST(SUM(c2) AS BIGINT) AS n2 FROM byv),
        |d AS (
        |  SELECT MAX(ABS(CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)) AS d,
        |    MAX(n1) AS n1, MAX(n2) AS n2
        |  FROM cum, tot)
        |SELECT ROUND(d, 6) AS d_stat,
        |  ROUND(SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / CAST(n1 + n2 AS DOUBLE)) * d, 6) AS ks_stat,
        |  n1, n2
        |FROM d""".stripMargin,
    "q_benford" ->
      """WITH digits AS (
        |  SELECT CAST(FLOOR(o_totalprice
        |      / POWER(10.0, FLOOR(LOG10(o_totalprice)))) AS INT) AS digit,
        |    COUNT(*) AS n
        |  FROM orders WHERE o_totalprice > 0
        |  GROUP BY 1)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS obs_p,
        |  ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_p
        |FROM digits ORDER BY digit""".stripMargin,
    "q_robust_scale" ->
      """WITH med AS (
        |  SELECT c_mktsegment, MEDIAN(c_acctbal) AS med
        |  FROM customer GROUP BY c_mktsegment),
        |dev AS (
        |  SELECT c.c_mktsegment, m.med, ABS(c.c_acctbal - m.med) AS ad
        |  FROM customer c JOIN med m USING (c_mktsegment)),
        |mad AS (
        |  SELECT c_mktsegment, MEDIAN(ad) AS mad
        |  FROM dev GROUP BY c_mktsegment)
        |SELECT d.c_mktsegment,
        |  ROUND(MAX(d.med), 4) AS med,
        |  ROUND(MAX(m.mad), 4) AS mad,
        |  CAST(SUM(CASE WHEN d.ad > 3.0 * 1.4826 * m.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  COUNT(*) AS n
        |FROM dev d JOIN mad m USING (c_mktsegment)
        |GROUP BY d.c_mktsegment ORDER BY d.c_mktsegment""".stripMargin,
    "q_ab_lift" ->
      s"""WITH conv AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' AND value > $AbConvValue
        |      THEN 1 ELSE 0 END) AS cv,
        |    user_id % 2 AS v
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN v = 0 THEN cv ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN v = 1 THEN cv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM conv),
        |p AS (
        |  SELECT n_a, n_b, conv_a, conv_b,
        |    CAST(conv_a AS DOUBLE) / n_a AS pa,
        |    CAST(conv_b AS DOUBLE) / n_b AS pb,
        |    CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp
        |  FROM agg)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  ROUND(pa, 6) AS rate_a,
        |  ROUND(pb, 6) AS rate_b,
        |  ROUND(pb / pa - 1.0, 6) AS lift,
        |  ROUND((pb - pa)
        |    / SQRT(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)), 4) AS z
        |FROM p""".stripMargin,
    "q_decay_score" ->
      s"""WITH ref AS (SELECT MAX(ts) AS ref_ts FROM events)
         |SELECT user_id, COUNT(*) AS n_events,
         |  ROUND(SUM(EXP(CAST(epoch_us(ts) - epoch_us(ref_ts) AS DOUBLE)
         |    / 604800000000.0)), 4) AS score
         |FROM events, ref
         |GROUP BY user_id
         |ORDER BY score DESC, user_id ASC LIMIT $DecayTopK""".stripMargin,
    "q_markov_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS prev_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts NULLS LAST, event_id) AS next_type
        |  FROM events),
        |cnt AS (
        |  SELECT prev_type, next_type, COUNT(*) AS n
        |  FROM nxt WHERE next_type IS NOT NULL
        |  GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n,
        |  ROUND(CAST(n AS DOUBLE)
        |    / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM cnt ORDER BY prev_type, next_type""".stripMargin,
    "q_mann_whitney" ->
      """WITH byv AS (
        |  SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |  GROUP BY value),
        |mr AS (
        |  SELECT c1, c2, c1 + c2 AS t,
        |    2 * COALESCE(SUM(c1 + c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (c1 + c2) + 1 AS mr2
        |  FROM byv),
        |agg AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    SUM(CAST(c1 AS HUGEINT) * mr2) AS r1x2,
        |    SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
        |  FROM mr),
        |der AS (
        |  SELECT n1, n2, n1 + n2 AS nn,
        |    r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2,
        |    ties
        |  FROM agg)
        |SELECT n1, n2,
        |  CAST(u1x2 AS DOUBLE) / 2 AS u1,
        |  ROUND((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)
        |    / (2.0 * SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
        |      * (CAST(nn + 1 AS DOUBLE)
        |        - CAST(ties AS DOUBLE)
        |          / (CAST(nn AS DOUBLE) * (nn - 1))))), 6) AS z
        |FROM der""".stripMargin,
    "q_bootstrap_ci" -> {
      val thrCase = PoissonThresholds28.zipWithIndex
        .map { case (thr, k) => s"WHEN u < $thr THEN $k" }
        .mkString("CASE ", " ", " ELSE 6 END")
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
         |  FROM orders),
         |reps AS (SELECT unnest(range(0, $BootstrapReplicas)) AS b),
         |drawn AS (
         |  SELECT b, cents,
         |    CAST(('0x' || substr(md5('bs:' || CAST(b // $BootstrapLanes AS VARCHAR) || ':'
         |      || CAST(o_orderkey AS VARCHAR)), (b % $BootstrapLanes) * 7 + 1, 7)) AS BIGINT) AS u
         |  FROM o CROSS JOIN reps),
         |means AS (
         |  SELECT CAST(SUM(CAST($thrCase AS HUGEINT) * cents) AS DOUBLE)
         |      / SUM($thrCase) / 100 AS m
         |  FROM drawn GROUP BY b),
         |ci AS (
         |  SELECT quantile_cont(m, 0.025) AS lo,
         |    quantile_cont(m, 0.975) AS hi
         |  FROM means),
         |point AS (
         |  SELECT COUNT(*) AS n_orders,
         |    SUM(CAST(cents AS HUGEINT)) AS sc
         |  FROM o)
         |SELECT n_orders, $BootstrapReplicas AS b_replicas,
         |  ROUND(CAST(sc AS DOUBLE) / n_orders / 100, 4) AS point_mean,
         |  ROUND(lo, 4) AS ci_lo, ROUND(hi, 4) AS ci_hi
         |FROM point CROSS JOIN ci""".stripMargin
    },
    "q_welch_t" ->
      s"""WITH seg AS (
         |  SELECT o_orderpriority = '$WelchA' AS a,
         |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
         |  FROM orders
         |  WHERE o_orderpriority IN ('$WelchA', '$WelchB')),
         |agg AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN a THEN c ELSE 0 END) AS BIGINT) AS s1,
         |    SUM(CASE WHEN a THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q1,
         |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN a THEN 0 ELSE c END) AS BIGINT) AS s2,
         |    SUM(CASE WHEN a THEN 0 ELSE CAST(c AS HUGEINT) * c END) AS q2
         |  FROM seg),
         |v AS (
         |  SELECT n1, n2, s1, s2,
         |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
         |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2
         |  FROM agg),
         |se AS (SELECT *, v1 / n1 + v2 / n2 AS se2 FROM v)
         |SELECT n1, n2,
         |  ROUND(CAST(s1 AS DOUBLE) / n1 / 100, 4) AS mean1,
         |  ROUND(CAST(s2 AS DOUBLE) / n2 / 100, 4) AS mean2,
         |  ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         |    / SQRT(se2), 6) AS t,
         |  ROUND(se2 * se2
         |    / ((v1 / n1) * (v1 / n1) / (n1 - 1)
         |      + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS df
         |FROM se""".stripMargin,
    "q_hhi" ->
      """WITH bysupp AS (
        |  SELECT s_nationkey, s_suppkey,
        |    CAST(ROUND(SUM(l_extendedprice) * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey, s_suppkey),
        |bynat AS (
        |  SELECT s_nationkey, COUNT(*) AS n_suppliers,
        |    SUM(CAST(cents AS HUGEINT)) AS sc,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS sc2
        |  FROM bysupp GROUP BY s_nationkey)
        |SELECT n_name, n_suppliers,
        |  ROUND(CAST(sc2 AS DOUBLE)
        |    / (CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)), 6) AS hhi
        |FROM bynat JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "q_cuped" ->
      """WITH peruser AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase' AND day(ts) <= 15
        |      THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) AS x,
        |    SUM(CASE WHEN event_type = 'purchase' AND day(ts) > 15
        |      THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) AS y,
        |    user_id % 2 AS v
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN v = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa,
        |    CAST(SUM(CASE WHEN v = 1 THEN x ELSE 0 END) AS BIGINT) AS sxb,
        |    CAST(SUM(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
        |    CAST(SUM(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT) AS syb
        |  FROM peruser),
        |th AS (
        |  SELECT *,
        |    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6)
        |      AS theta,
        |    CAST(sx AS DOUBLE) / n AS mx
        |  FROM agg),
        |adj AS (
        |  SELECT *,
        |    (CAST(sya AS DOUBLE) / n_a
        |      - theta * (CAST(sxa AS DOUBLE) / n_a - mx)) / 100 AS adj_a,
        |    (CAST(syb AS DOUBLE) / n_b
        |      - theta * (CAST(sxb AS DOUBLE) / n_b - mx)) / 100 AS adj_b
        |  FROM th)
        |SELECT n_a, n_b, theta,
        |  ROUND(CAST(syb AS DOUBLE) / n_b / 100
        |    - CAST(sya AS DOUBLE) / n_a / 100, 4) AS raw_diff,
        |  ROUND(adj_b - adj_a, 4) AS adj_diff,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6)
        |    AS var_reduction
        |FROM adj""".stripMargin,
  )
}
