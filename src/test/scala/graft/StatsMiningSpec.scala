package graft

import graft.operators.{Mining, Stats}
import org.apache.spark.sql.functions._

/** Property checks for the distribution-statistics and mining
  * operators beyond what the DuckDB oracle replays: driver-side
  * recomputation of Gini/KS/z from first principles on the sf0.001
  * fixture, probability-mass closure, and blocking/threshold
  * invariants.
  */
class StatsMiningSpec extends SparkSpec {

  test("q_gini matches a driver-side sorted-rank recomputation") {
    import spark.implicits._
    val row = run("q_gini").collect().head
    val (gini, n) = (row.getAs[Double]("gini"), row.getAs[Long]("n_customers"))
    val cents = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val nn = cents.length.toLong
    val sIx = cents.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val sX = cents.map(BigInt(_)).sum
    val expect = BigDecimal(
      2.0 * sIx.toDouble / (nn.toDouble * sX.toDouble) - (nn + 1.0) / nn)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(n === nn)
    assert(gini === expect, s"gini $gini != recomputed $expect")
    assert(gini > 0.0 && gini < 1.0)
  }

  test("q_ks_test matches a driver-side empirical-CDF recomputation") {
    import spark.implicits._
    val row = run("q_ks_test").collect().head
    val vals = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view"))
      .select($"value", $"event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    val s1 = vals.filter(_._2 == "click").map(_._1).sorted
    val s2 = vals.filter(_._2 == "view").map(_._1).sorted
    val grid = (s1 ++ s2).distinct.sorted
    val d = grid.map { x =>
      math.abs(s1.count(_ <= x).toDouble / s1.length
        - s2.count(_ <= x).toDouble / s2.length)
    }.max
    assert(row.getAs[Long]("n1") === s1.length.toLong)
    assert(row.getAs[Long]("n2") === s2.length.toLong)
    assert(math.abs(row.getAs[Double]("d_stat") - d) < 5e-7,
      s"d_stat ${row.getAs[Double]("d_stat")} != recomputed $d")
  }

  test("q_benford digit mass closes to 1 and covers 1..9") {
    val rows = run("q_benford").collect()
    val digits = rows.map(_.getAs[Int]("digit")).toSeq
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(digits == digits.sorted)
    val mass = rows.map(_.getAs[Double]("obs_p")).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"obs_p mass $mass")
    val bmass = rows.map(_.getAs[Double]("benford_p")).sum
    // Benford masses for PRESENT digits only — compare against the
    // closed form for exactly those digits.
    val expected = digits.map(d => math.log10(1.0 + 1.0 / d)).sum
    assert(math.abs(bmass - expected) < 1e-4)
  }

  test("q_robust_scale medians match driver-side exact medians") {
    import spark.implicits._
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val bySeg = Tables.customer(spark, sf)
      .select($"c_mktsegment", $"c_acctbal").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    run("q_robust_scale").collect().foreach { r =>
      val seg = r.getString(0)
      val med = median(bySeg(seg))
      val mad = median(bySeg(seg).map(x => math.abs(x - med)))
      assert(r.getAs[Double]("med") ===
        BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("mad") ===
        BigDecimal(mad).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val out = bySeg(seg).count(x => math.abs(x - med) > 3.0 * 1.4826 * mad)
      assert(r.getAs[Long]("n_outliers") === out.toLong)
    }
  }

  test("q_ab_lift counts tile the user base and z matches recomputation") {
    import spark.implicits._
    val r = run("q_ab_lift").collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(na + nb === users)
    val (ca, cb) = (r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b"))
    assert(ca <= na && cb <= nb && ca > 0 && cb > 0,
      s"degenerate split ($ca/$na, $cb/$nb) — AbConvValue needs re-tuning")
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pp = (ca + cb).toDouble / (na + nb)
    val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
  }

  test("q_decay_score scores are in (0, n_events] and sorted desc") {
    val rows = run("q_decay_score").collect()
    assert(rows.nonEmpty && rows.length <= Stats.DecayTopK)
    rows.foreach { r =>
      val (n, sc) = (r.getAs[Long]("n_events"), r.getAs[Double]("score"))
      assert(sc > 0.0 && sc <= n.toDouble + 1e-9,
        s"user ${r.getAs[Long]("user_id")}: score $sc outside (0, $n]")
    }
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("q_markov_transitions rows per prev sum to 1 and pair count is conserved") {
    import spark.implicits._
    val rows = run("q_markov_transitions").collect()
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val mass = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$prev transition mass $mass")
    }
    val pairTotal = rows.map(_.getAs[Long]("n")).sum
    val expected = Tables.events(spark, sf)
      .groupBy($"user_id").agg((count(lit(1)) - 1).as("m"))
      .agg(sum($"m")).collect().head.getLong(0)
    assert(pairTotal === expected,
      s"pairs $pairTotal != Σ(per-user events − 1) = $expected")
  }

  test("q_assoc_rules thresholds and ratio identities hold") {
    val rows = run("q_assoc_rules").collect()
    assert(rows.nonEmpty && rows.length <= Mining.RulesTopK)
    rows.foreach { r =>
      val nab = r.getAs[Long]("n_ab")
      assert(nab >= Mining.MinPairSupport.toLong)
      val (sup, conf, lift) = (r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift"))
      assert(sup > 0.0 && sup <= 1.0)
      assert(conf > 0.0 && conf <= 1.0)
      // lift = confidence / P(consequent) ≥ confidence when the
      // consequent is not universal; all three round from the same
      // integer counts, so lift ≥ support always.
      assert(lift >= sup - 1e-6)
    }
    val lifts = rows.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("q_rare_collapse conserves rows and collapses exactly the sub-threshold brands") {
    import spark.implicits._
    val rows = run("q_rare_collapse").collect()
    val total = Tables.part(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    val counts = Tables.part(spark, sf).groupBy($"p_brand").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rare = counts.filter { case (_, c) => c * Mining.RareDenom < total }.keySet
    val other = rows.find(_.getString(0) == "OTHER")
    if (rare.nonEmpty) {
      assert(other.isDefined)
      assert(other.get.getAs[Long]("n_brands") === rare.size.toLong)
      assert(other.get.getAs[Long]("n") === rare.toSeq.map(counts).sum)
    } else assert(other.isEmpty)
    rows.filter(_.getString(0) != "OTHER").foreach { r =>
      assert(!rare.contains(r.getString(0)))
      assert(r.getAs[Long]("n_brands") === 1L)
    }
  }

  test("q_fuzzy_block_join pairs share a block and respect the distance cut") {
    val rows = run("q_fuzzy_block_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (blk, n1, n2, d) = (r.getString(0), r.getString(1),
        r.getString(2), r.getAs[Int]("dist"))
      assert(n1 < n2)
      assert(n1.split(" ").last == blk && n2.split(" ").last == blk)
      assert(d >= 1 && d <= Mining.FuzzyMaxDist)
    }
  }

  test("fuzzy blocking: band split bounds candidates on a one-dominant-word fixture, with exact recall") {
    // Adversarial ER-shape gate (round-12 verdict item 5): with ONE
    // dominant final word, single-key blocking degenerates to the hot
    // block's m·(m−1)/2 pairs; the length-band conjunct must cut the
    // candidate set to Σ over (word, band) of the banded crossings —
    // enforced here by exact count, not asserted in comments — while
    // keeping every true near-pair (superset, exactly once).
    import spark.implicits._
    val W = Mining.FuzzyBandWidth
    // 90 distinct names, ALL ending in the same word, lengths spread
    // across ~8 bands (prefix run length i % 30).
    val names = (1 to 90).map(i => ("x" * (i % 30)) + s"n$i alpha")
    assert(names.distinct.size === names.size)
    val got = Mining.fuzzyCandidates(names.toDF("p_name")).collect()
      .map(r => (r.getAs[String]("n1"), r.getAs[String]("n2")))
    // Exactly once: three probe-side band emissions carry DISTINCT
    // bands, so no (n1, n2) pair can meet on two keys.
    assert(got.length === got.distinct.length,
      "banded blocking must emit each candidate pair exactly once")
    // Exact expected set: unordered pairs sharing the final word with
    // |band difference| ≤ 1 (bands adjacent or equal).
    def band(n: String) = n.length / W
    val expect = (for {
      a <- names; b <- names
      if a < b && math.abs(band(a) - band(b)) <= 1
    } yield (a, b)).toSet
    assert(got.toSet === expect,
      "candidate set must be exactly the banded crossings")
    // The bound that matters at 100 TB: the hot block's all-pairs
    // count collapses under the band split (here to roughly the
    // per-band neighborhoods — a >2× cut even on 90 names).
    val allPairs = names.size * (names.size - 1) / 2
    assert(got.length * 2 < allPairs,
      s"band split must cut the dominant block: ${got.length} vs $allPairs")
    // Recall: dist ≤ FuzzyMaxDist ⟹ |len diff| ≤ FuzzyMaxDist ≤ W ⟹
    // same or adjacent band — every true near-pair is a candidate.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val near = for {
      a <- names; b <- names
      if a < b && lev(a, b) <= Mining.FuzzyMaxDist
    } yield (a, b)
    assert(near.nonEmpty, "fixture must contain true near-pairs")
    val gotSet = got.toSet
    near.foreach { p =>
      assert(gotSet.contains(p), s"near-pair $p missing from candidates")
    }
  }

  test("q_null_audit matches direct per-column statistics") {
    import spark.implicits._
    val rows = run("q_null_audit").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("event_type", "props", "user_id", "value"))
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    Seq("event_type", "user_id", "value", "props").foreach { c =>
      val r = rows(c)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("n_null") === ev.filter(col(c).isNull).count())
      assert(r.getAs[Long]("n_distinct") ===
        ev.select(col(c)).na.drop().distinct().count())
    }
  }

  test("q_psi contributions are non-negative and shares stay sub-unit") {
    val rows = run("q_psi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // (p_cur − p_ref)·ln(p_cur/p_ref) ≥ 0 identically; rounding can
      // leave a −0.0-adjacent value, hence the epsilon.
      assert(r.getAs[Double]("contrib") >= -1e-9)
      assert(r.getAs[Double]("p_ref") > 0.0 && r.getAs[Double]("p_ref") <= 1.0)
      assert(r.getAs[Double]("p_cur") > 0.0 && r.getAs[Double]("p_cur") <= 1.0)
    }
    assert(rows.map(_.getAs[Double]("p_ref")).sum <= 1.0 + 1e-6)
  }

  test("q_autocorr is a valid correlation over the lagged day pairs") {
    import spark.implicits._
    val r = run("q_autocorr").collect().head
    assert(r.getAs[Int]("lag_days") === operators.TimeSeries.AutocorrLagDays)
    val cc = r.getAs[Double]("r")
    assert(cc >= -1.0 && cc <= 1.0, s"autocorr $cc outside [-1,1]")
    val days = Tables.orders(spark, sf)
      .select(to_date($"o_orderdate").as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate).toSet
    val expectPairs = days.count(d =>
      days.contains(d.plusDays(operators.TimeSeries.AutocorrLagDays)))
    assert(r.getAs[Long]("n_pairs") === expectPairs.toLong)
  }

  test("q_changepoint matches a driver-side CUSUM argmax") {
    import spark.implicits._
    val r = run("q_changepoint").collect().head
    val daily = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getDate(0).toLocalDate, x.getLong(1)))
      .sortBy(_._1)
    val dd = daily.length.toLong
    val nn = daily.map(_._2).sum
    var s = 0L
    val devs = daily.zipWithIndex.map { case ((d, n), i) =>
      s += n; (d, math.abs(dd * s - (i + 1) * nn))
    }
    val best = devs.maxBy(t => (t._2, -t._1.toEpochDay))
    assert(r.getAs[java.sql.Timestamp]("cp_day").toLocalDateTime.toLocalDate
      === best._1)
    assert(r.getAs[Long]("n_days") === dd)
    assert(r.getAs[Long]("n_events") === nn)
    assert(math.abs(r.getAs[Double]("max_dev") - best._2.toDouble / dd) < 1e-3)
  }

  test("q_target_encode pulls every category toward the global mean") {
    import spark.implicits._
    val g = Tables.part(spark, sf)
      .agg(sum($"p_retailprice"), count(lit(1))).collect().head
    val mu = g.getDouble(0) / g.getLong(1)
    val raw = Tables.part(spark, sf).groupBy($"p_brand")
      .agg(sum($"p_retailprice").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1) / r.getLong(2))).toMap
    run("q_target_encode").collect().foreach { r =>
      val (brand, enc) = (r.getString(0), r.getAs[Double]("enc"))
      // Smoothing is a convex pull toward μ: enc sits between the raw
      // category mean and the global mean (inclusive, 4-dp rounding).
      val m = raw(brand)
      assert(enc >= math.min(m, mu) - 1e-3 && enc <= math.max(m, mu) + 1e-3,
        s"$brand: enc $enc outside [${math.min(m, mu)}, ${math.max(m, mu)}]")
    }
  }

  test("q_quantile_bins tiles the value range with near-equal masses") {
    val rows = run("q_quantile_bins").collect()
    val bins = rows.map(_.getAs[Int]("bin")).toSeq
    assert(bins == (0 to 9))
    val counts = rows.map(_.getAs[Long]("n"))
    val total = counts.sum
    // Equal-frequency up to interpolation ties: each decile within
    // ±20% of total/10 on the small fixture.
    counts.foreach(c => assert(math.abs(c - total / 10.0) <= total / 50.0,
      s"bin mass $c vs ${total / 10.0}"))
    // Bins must not overlap: each bin's hi ≤ the next bin's lo.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9)
    }
  }

  test("q_count_min estimates dominate exact counts (one-sided guarantee)") {
    val rows = run("q_count_min").collect()
    assert(rows.length === Mining.CmsTopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"key ${r.getAs[Long]("l_partkey")}: CMS under-counted")
      assert(r.getAs[Long]("overcount")
        === r.getAs[Long]("n_est") - r.getAs[Long]("n_exact"))
    }
    val exacts = rows.map(_.getAs[Long]("n_exact")).toSeq
    assert(exacts == exacts.sorted.reverse)
  }

  test("q_skyline matches brute-force dominance over the distinct points") {
    import spark.implicits._
    val pts = Tables.orders(spark, sf)
      .groupBy($"o_totalprice", $"o_orderdate".cast("timestamp"))
      .count().collect()
      .map(r => (r.getDouble(0), r.getTimestamp(1).getTime))
    def dominated(p: (Double, Long)) = pts.exists { q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2)
    }
    val expect = pts.filterNot(dominated)
      .map(p => (p._1, p._2)).sortBy(identity).toSeq
    val got = run("q_skyline").collect()
      .map(r => (r.getDouble(0), r.getTimestamp(1).getTime)).sortBy(identity).toSeq
    assert(got === expect)
  }

  test("q_concurrency matches a driver-side sweep-line") {
    import spark.implicits._
    val holdUs = operators.Frontier.HoldMinutes.toLong * 60000000L
    val evs = Tables.events(spark, sf)
      .select(unix_micros($"ts"), $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val endpoints = (evs.map(e => (e._1, 1L, e._2))
      ++ evs.map(e => (e._1 + holdUs, -1L, e._2)))
      .sortBy { case (t, d, id) => (t, d, id) }
    var running = 0L; var peak = 0L; var peakTs = 0L
    endpoints.foreach { case (t, d, _) =>
      running += d
      if (running > peak) { peak = running; peakTs = t }
    }
    val r = run("q_concurrency").collect().head
    assert(r.getAs[Long]("peak") === peak)
    assert(r.getAs[java.sql.Timestamp]("peak_ts").getTime * 1000L
      + r.getAs[java.sql.Timestamp]("peak_ts").getNanos / 1000 % 1000 === peakTs)
    assert(r.getAs[Long]("net_end") === 0L)
  }

  test("q_allocation spends the budget exactly with quota-rounded shares") {
    val rows = run("q_allocation").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(rows.map(_.getAs[Long]("alloc")).sum
      === operators.Frontier.AllocBudget.toLong)
    rows.foreach { r =>
      val base = operators.Frontier.AllocBudget * r.getAs[Long]("n") / total
      val alloc = r.getAs[Long]("alloc")
      assert(alloc == base || alloc == base + 1,
        s"${r.getString(0)}: alloc $alloc outside {${base}, ${base + 1}}")
    }
  }

  test("q_chisq_terms scores are non-negative with df over the floor") {
    val rows = run("q_chisq_terms").collect()
    assert(rows.nonEmpty && rows.length <= Mining.ChisqTopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= Mining.ChisqMinDf.toLong)
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
    val scores = rows.map(_.getAs[Double]("chi2")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("q_trend_fit matches a driver-side closed-form OLS per segment") {
    import spark.implicits._
    val daily = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
      .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (p, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._2).sum.toDouble
      val sy = xs.map(_._3).sum.toDouble
      val sxy = xs.map(t => BigInt(t._2) * BigInt(t._3)).sum.toDouble
      val sxx = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
      val slope = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      p -> (xs.length.toLong, slope,
        BigDecimal((sy - slope * sx) / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = run("q_trend_fit").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (p, (n, slope, icept)) =>
      val (gn, gs, gi) = got(p)
      assert(gn === n, p)
      assert(math.abs(gs - slope) < 2e-6, s"$p slope $gs vs $slope")
      assert(math.abs(gi - icept) < 2e-3, s"$p intercept $gi vs $icept")
    }
  }

  test("q_ewma_control ewma equals the sequential recursion (unrolled weights ≡ s=αx+(1−α)s)") {
    import spark.implicits._
    // The query computes s_t as an unrolled weighted SUM over a
    // |days|² self-join; the definition is the sequential recursion.
    // Driver-side replay pins the two equal — the strongest guard on
    // the weight algebra (a wrong exponent matches no fixture).
    val daily = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1)
    val a = graft.operators.TimeSeries.EwmaAlpha
    var s = daily.head._2.toDouble
    val expect = daily.zipWithIndex.map { case ((d, n), i) =>
      if (i > 0) s = a * n + (1 - a) * s
      d -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val rows = run("q_ewma_control").collect()
    assert(rows.length === daily.length)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Timestamp]("day").toLocalDateTime.toLocalDate
      assert(math.abs(r.getAs[Double]("ewma") - expect(d)) < 1e-5,
        s"$d: ${r.getAs[Double]("ewma")} vs ${expect(d)}")
    }
    // At least the first row can never flag (no predecessor).
    assert(!rows.minBy(_.getAs[java.sql.Timestamp]("day").getTime)
      .getAs[Boolean]("flag"))
  }

  test("q_dow_profile covers the week, shares close to 1, chi2 matches recomputation") {
    val rows = run("q_dow_profile").collect()
    assert(rows.map(_.getAs[Int]("dow")).toSeq.sorted === (1 to 7))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    val e = total / 7.0
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(math.abs(r.getAs[Double]("chi2_contrib")
        - BigDecimal((n - e) * (n - e) / e)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-3)
    }
  }

  test("q_mann_whitney matches a driver-side midrank recomputation") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view") && $"value".isNotNull)
      .select($"value", $"event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1) == "click"))
    val byV = vals.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, xs) => (v, xs.count(_._2).toLong,
        xs.count(!_._2).toLong) }
    var before = 0L
    var r1x2 = BigInt(0); var ties = BigInt(0)
    byV.foreach { case (_, c1, c2) =>
      val t = c1 + c2
      r1x2 += BigInt(c1) * (2 * before + t + 1)
      ties += BigInt(t) * t * t - t
      before += t
    }
    val n1 = byV.map(_._2).sum; val n2 = byV.map(_._3).sum; val nn = n1 + n2
    val u1x2 = r1x2 - BigInt(n1) * (n1 + 1)
    val variance = n1.toDouble * n2 / 12.0 *
      ((nn + 1).toDouble - ties.toDouble / (nn.toDouble * (nn - 1)))
    val z = (u1x2.toDouble - n1.toDouble * n2) / (2.0 * math.sqrt(variance))
    val r = run("q_mann_whitney").collect().head
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    assert(math.abs(r.getAs[Double]("u1") - u1x2.toDouble / 2) < 1e-6)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
  }

  test("q_bootstrap_ci: replicas 0 and 3 replay from the md5 lane chain; CI straddles the point") {
    import spark.implicits._
    // Replica b reads 28-bit lane (b mod Lanes) of digest
    // `bs:<b div Lanes>:<key>` — replica 0 is the pre-lane scheme
    // verbatim (lane 0 of digest 0), replica 3 pins the hex-offset
    // extraction (chars [21, 28) of the SAME digest).
    val md = java.security.MessageDigest.getInstance("MD5")
    def u28(key: Long, b: Int): Long = {
      val j = b / Stats.BootstrapLanes
      val lane = b % Stats.BootstrapLanes
      val hex = md.digest(s"bs:$j:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.slice(lane * 7, lane * 7 + 7)
      java.lang.Long.parseLong(hex, 16)
    }
    val thr = Stats.PoissonThresholds28
    val rows = Tables.orders(spark, sf)
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def replay(b: Int): Double = {
      var sw = BigInt(0); var nw = 0L
      rows.foreach { case (k, cents) =>
        val u = u28(k, b)
        val w = thr.indexWhere(u < _) match { case -1 => 6L; case i => i.toLong }
        sw += BigInt(w) * cents; nw += w
      }
      sw.toDouble / nw / 100
    }
    val means = Stats.bootstrapMeans(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Seq(0, 3).foreach { b =>
      val expect = replay(b)
      assert(math.abs(means(b) - expect) < 1e-9,
        s"replica-$b mean ${means(b)} vs driver replay $expect")
    }
    val r = run("q_bootstrap_ci").collect().head
    val (pm, lo, hi) = (r.getAs[Double]("point_mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < hi && lo <= pm && pm <= hi,
      s"CI [$lo, $hi] must straddle the point mean $pm")
    assert(r.getAs[Int]("b_replicas") === Stats.BootstrapReplicas)
  }

  test("q_hhi matches driver-side share-square sums and sits in (1/n, 1]") {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey", $"s_suppkey")
      .agg(round(sum($"l_extendedprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(2)))
    val expect = perSupp.groupBy(_._1).map { case (nk, xs) =>
      val sc = xs.map(x => BigInt(x._2)).sum
      val sc2 = xs.map(x => BigInt(x._2) * x._2).sum
      nk -> (xs.length.toLong,
        BigDecimal(sc2.toDouble / (sc.toDouble * sc.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val nations = Tables.nation(spark, sf).collect()
      .map(r => r.getString(1) -> r.getAs[Number](0).longValue).toMap
    val got = run("q_hhi").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, hhi) = expect(nations(r.getString(0)))
      assert(r.getAs[Long]("n_suppliers") === n, r.getString(0))
      assert(math.abs(r.getAs[Double]("hhi") - hhi) < 1e-5, r.getString(0))
      assert(hhi > 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9)
    }
  }

  test("q_seasonal_adjust conserves the series mean and recomputes per row") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val g = daily.map(_._2).sum.toDouble / daily.length
    val byDow = daily.groupBy(_._1.getDayOfWeek).map { case (k, xs) =>
      k -> xs.map(_._2).sum.toDouble / xs.length
    }
    val rows = run("q_seasonal_adjust").collect()
    assert(rows.length === daily.length)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Timestamp]("day").toLocalDateTime.toLocalDate
      val exp = byDow(d.getDayOfWeek)
      assert(math.abs(r.getAs[Double]("seasonal") - exp) < 1e-3, d)
      assert(math.abs(r.getAs[Double]("adjusted")
        - (r.getAs[Long]("n_events") - exp + g)) < 1e-3, d)
    }
    // The additive adjustment conserves the total (Σ seasonal = Σ n,
    // N·g = Σ n), so the de-seasonalized series has the same mean.
    val adjSum = rows.map(_.getAs[Double]("adjusted")).sum
    assert(math.abs(adjSum - daily.map(_._2).sum.toDouble) < 0.1)
  }

  test("q_welch_t matches a driver-side recomputation over the two segments") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf)
      .filter($"o_orderpriority".isin(Stats.WelchA, Stats.WelchB))
      .select(($"o_orderpriority" === Stats.WelchA),
        round($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    def stats(xs: Array[Long]) = {
      val n = xs.length.toLong
      val s = xs.sum
      val q = xs.map(x => BigInt(x) * x).sum
      val v = (q.toDouble - s.toDouble * s / n) / (n - 1)
      (n, s, v)
    }
    val (n1, s1, v1) = stats(rows.filter(_._1).map(_._2))
    val (n2, s2, v2) = stats(rows.filterNot(_._1).map(_._2))
    val se2 = v1 / n1 + v2 / n2
    val t = (s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(se2)
    val df = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
      + (v2 / n2) * (v2 / n2) / (n2 - 1))
    val r = run("q_welch_t").collect().head
    assert(r.getAs[Long]("n1") === n1 && r.getAs[Long]("n2") === n2)
    assert(math.abs(r.getAs[Double]("mean1") - s1.toDouble / n1 / 100) < 1e-3)
    assert(math.abs(r.getAs[Double]("mean2") - s2.toDouble / n2 / 100) < 1e-3)
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-5)
    assert(math.abs(r.getAs[Double]("df") - df) < 0.02)
    // df must sit between min(n−1) and n1+n2−2 (Welch–Satterthwaite).
    assert(df >= math.min(n1, n2) - 1 && df <= n1 + n2 - 2)
  }

  test("q_sample_audit agrees with the ACTUAL stratified sample it audits") {
    import spark.implicits._
    val sampled = run("q_sample_stratified").collect()
      .groupBy(_.getString(1)).map { case (l, xs) => l -> xs.length.toLong }
    val full = Tables.documents(spark, sf).groupBy($"lang")
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q_sample_audit").collect()
    rows.foreach { r =>
      val lang = r.getString(0)
      assert(r.getAs[Long]("n_full") === full(lang), lang)
      assert(r.getAs[Long]("n_sample") === sampled.getOrElse(lang, 0L),
        s"$lang: audit count must equal the sampler's own output")
      assert(r.getAs[Double]("chi2_contrib") >= 0.0)
    }
  }

  test("q_fk_audit orphan counts equal driver-side key-set differences") {
    import spark.implicits._
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(col(c)).collect().map(_.getLong(0))
    val expected = Map(
      "lineitem->orders" ->
        (keys(Tables.lineitem(spark, sf), "l_orderkey"),
          keys(Tables.orders(spark, sf), "o_orderkey").toSet),
      "lineitem->part" ->
        (keys(Tables.lineitem(spark, sf), "l_partkey"),
          keys(Tables.part(spark, sf), "p_partkey").toSet),
      "lineitem->supplier" ->
        (keys(Tables.lineitem(spark, sf), "l_suppkey"),
          keys(Tables.supplier(spark, sf), "s_suppkey").toSet),
      "orders->customer" ->
        (keys(Tables.orders(spark, sf), "o_custkey"),
          keys(Tables.customer(spark, sf), "c_custkey").toSet))
    val got = run("q_fk_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (rel, (child, parents)) =>
      assert(got(rel) ===
        (child.length.toLong, child.count(k => !parents(k)).toLong), rel)
    }
  }

  test("q_cuped matches a driver-side recomputation from per-user sums") {
    import spark.implicits._
    val row = run("q_cuped").collect().head
    val users = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(
        sum(when(dayofmonth($"ts") <= 15, round($"value" * 100).cast("long"))
          .otherwise(0L)).as("x"),
        sum(when(dayofmonth($"ts") > 15, round($"value" * 100).cast("long"))
          .otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // The query aggregates over ALL users (non-purchasers contribute
    // (0,0) rows); rebuild that frame from the full user domain.
    val allUsers = Tables.events(spark, sf).select($"user_id").distinct()
      .collect().map(_.getLong(0))
    val xy = {
      val m = users.map(t => t._1 -> (t._2, t._3)).toMap
      allUsers.map(u => (u, m.getOrElse(u, (0L, 0L))))
    }
    val n = xy.length.toDouble
    val sx = xy.map(_._2._1).sum.toDouble
    val sy = xy.map(_._2._2).sum.toDouble
    val sxy = xy.map(t => BigInt(t._2._1) * t._2._2).sum.toDouble
    val sxx = xy.map(t => BigInt(t._2._1) * t._2._1).sum.toDouble
    val syy = xy.map(t => BigInt(t._2._2) * t._2._2).sum.toDouble
    val theta = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("theta") === theta)
    val byV = xy.groupBy(_._1 % 2)
    def means(v: Long) = {
      val g = byV(v)
      (g.map(_._2._1).sum.toDouble / g.length,
        g.map(_._2._2).sum.toDouble / g.length, g.length.toLong)
    }
    val (mxa, mya, na) = means(0L); val (mxb, myb, nb) = means(1L)
    assert(row.getAs[Long]("n_a") === na && row.getAs[Long]("n_b") === nb)
    val mx = sx / n
    val adjDiff = BigDecimal(
      (myb - theta * (mxb - mx)) / 100 - (mya - theta * (mxa - mx)) / 100)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("adj_diff") === adjDiff)
    val vr = row.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0, s"ρ² out of [0,1]: $vr")
  }

  test("q_theil_sen matches a driver-side median-of-pairwise-slopes") {
    import spark.implicits._
    val got = run("q_theil_sen").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("ts_slope"))).toMap
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
      .select($"event_type", unix_date($"d").cast("long"), $"n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1))
        .sorted
      val m = slopes.length
      val med = if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + slopes(m / 2)) / 2
      val expect = BigDecimal(med)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(et) === ((m.toLong, expect)), s"event_type $et")
    }
  }

  test("q_xcorr reports the argmax lag over a driver-side Pearson sweep") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
      .select($"event_type", unix_date($"d").cast("long"), $"n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def pearson(a: Map[Long, Long], b: Map[Long, Long], lag: Int): Option[Double] = {
      val pts = a.keys.toSeq.sorted.flatMap(x => b.get(x + lag).map(a(x) -> _))
      val n = pts.length.toDouble
      if (pts.isEmpty) None else {
        val sa = pts.map(_._1).sum.toDouble; val sb = pts.map(_._2).sum.toDouble
        val sab = pts.map(t => t._1 * t._2).sum.toDouble
        val saa = pts.map(t => t._1 * t._1).sum.toDouble
        val sbb = pts.map(t => t._2 * t._2).sum.toDouble
        val den = math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
        if (den == 0.0) None
        else Some(BigDecimal((n * sab - sa * sb) / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val rows = run("q_xcorr").collect()
    assert(rows.length === 20, "5 types → 20 ordered pairs")
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val sweep = (0 to operators.TimeSeries.XcorrMaxLag)
        .map(l => l -> pearson(daily(ta), daily(tb), l))
      val best = sweep.filter(_._2.isDefined)
        .maxBy { case (l, or) => (math.abs(or.get), -l) }
      assert(r.getAs[Int]("best_lag") === best._1, s"$ta->$tb lag")
      assert(r.getAs[Double]("r") === best._2.get, s"$ta->$tb r")
    }
  }

  test("q_er_entities matches a driver-side union-find over the matched pairs") {
    import spark.implicits._
    val parts = Tables.part(spark, sf)
    val ids = parts.groupBy($"p_name").agg(min($"p_partkey").as("nid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = Mining.fuzzyCandidates(parts)
      .filter(levenshtein($"n1", $"n2") <= Mining.FuzzyMaxDist)
      .select($"n1", $"n2").distinct()
      .collect().map(r => ids(r.getString(0)) -> ids(r.getString(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nameOf = ids.map(_.swap)
    val entities = parent.keys.toSeq.map(x => find(x) -> x)
      .groupBy(_._1).view
      .mapValues(ms => (ms.length.toLong, ms.map(m => nameOf(m._2)).min))
      .toMap
    val got = run("q_er_entities").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === entities,
      s"components differ: got ${got.size}, union-find ${entities.size}")
  }
}
