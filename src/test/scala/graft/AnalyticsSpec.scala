package graft

import org.apache.spark.sql.functions._

/** Property checks for the event/corpus analytics operators — the
  * invariants the DuckDB oracle can't express (it would just replay
  * the same computation): chunk coverage, funnel monotonicity, SCD2
  * interval tiling.
  */
class AnalyticsSpec extends SparkSpec {

  test("q_doc_chunks covers every token exactly; no chunk is a subset of its predecessor") {
    import spark.implicits._
    val chunks = run("q_doc_chunks")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", functions.Text.tokenCount($"text").as("n_tok"))
    // Coverage: per doc, the last chunk must reach the final token —
    // chunk i spans [i*40, i*40 + n_chunk_tokens); the max end must
    // equal the doc's token count (or 0 tokens → one empty chunk).
    val ends = chunks
      .groupBy($"doc_id")
      .agg(max($"chunk_id" * 40 + $"n_chunk_tokens").as("covered"),
        count(lit(1)).as("n_chunks"))
      .join(docs, Seq("doc_id"))
      .collect()
    assert(ends.nonEmpty)
    ends.foreach { r =>
      val (covered, nTok) = (r.getAs[Int]("covered"), r.getAs[Int]("n_tok"))
      assert(covered == nTok, s"doc ${r.getAs[Long]("doc_id")}: covered $covered of $nTok tokens")
    }
    // No-subset: every chunk after the first must extend past the
    // previous chunk's end, i.e. have more than overlap=10 tokens.
    val subset = chunks.filter($"chunk_id" > 0 && $"n_chunk_tokens" <= 10).count()
    assert(subset == 0, s"$subset wholly-overlapped tail chunks")
  }

  test("q_funnel stages are monotone and consistent with raw event counts") {
    import spark.implicits._
    val r = run("q_funnel").collect().head
    val (v, c, p) = (r.getAs[Long]("n_viewed"), r.getAs[Long]("n_clicked"),
      r.getAs[Long]("n_purchased"))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0 && p > 0, s"degenerate funnel fixture: ($v, $c, $p)")
    // Stage 1 must equal the plain distinct-viewer count; later stages
    // are strictly ordered subsets so only the bound applies.
    val viewers = Tables.events(spark, sf)
      .filter($"event_type" === "view").select($"user_id").distinct().count()
    assert(v == viewers, s"n_viewed $v != distinct viewers $viewers")
  }

  test("q_scd2_intervals tiles each key's history: no gaps, no overlaps, one current row") {
    import spark.implicits._
    val iv = run("q_scd2_intervals")
    // Exactly one open (current) interval per key.
    val open = iv.groupBy($"o_custkey")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n_open"))
      .filter($"n_open" =!= 1).count()
    assert(open == 0, s"$open keys without exactly one current interval")
    // Each closed interval's valid_to equals the next interval's
    // valid_from (tiling) and is never before its valid_from.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"valid_from".asc, $"o_orderkey".asc)
    val bad = iv
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter(
        ($"valid_to".isNotNull && $"next_from".isNull) ||  // closed row with no successor
        ($"valid_to".isNotNull && $"valid_to" =!= $"next_from") ||
        ($"valid_to".isNotNull && $"valid_to" < $"valid_from"))
      .count()
    assert(bad == 0, s"$bad intervals break the tiling invariant")
  }

  test("q_argmax's struct tiebreak is deterministic under tied extremes") {
    import spark.implicits._
    // Round-4 ADVICE: the bare max_by form was only oracle-comparable
    // because the fixture happened to be tie-free — a data-dependent
    // precondition. The struct-ordered form resolves ties by orderkey
    // on ANY data; prove it on a frame that is ALL ties: both groups
    // share one price across every row, so an untiebroken max_by could
    // return any member, while the struct form must return the
    // max/min orderkey regardless of partition arrival order.
    val tied = Seq(
      ("a", 10L, 5.0), ("a", 11L, 5.0), ("a", 12L, 5.0),
      ("b", 20L, 7.0), ("b", 21L, 7.0))
      .toDF("g", "k", "v").repartition(8)
    val got = tied.groupBy($"g")
      .agg(
        max_by($"k", struct($"v", $"k")).as("top_k"),
        min_by($"k", struct($"v", $"k")).as("bottom_k"))
      .orderBy($"g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 12L, 10L), ("b", 21L, 20L)), got.toString)
  }

  test("q_retention_cohorts: month 0 equals cohort size; active counts never exceed it") {
    import spark.implicits._
    val m = run("q_retention_cohorts")
    // Every cohort has a month_index-0 row (the month of first order).
    val cohorts = m.select($"cohort_month").distinct().count()
    val zeroRows = m.filter($"month_index" === 0).count()
    assert(cohorts == zeroRows, s"$cohorts cohorts but $zeroRows month-0 rows")
    // No later month can have more active customers than month 0.
    val m0 = m.filter($"month_index" === 0)
      .select($"cohort_month", $"n_customers".as("cohort_size"))
    val over = m.join(m0, Seq("cohort_month"))
      .filter($"n_customers" > $"cohort_size").count()
    assert(over == 0, s"$over cohort cells exceed their cohort size")
  }

  test("q_cohort_ltv: monotone per cohort, month-0 everywhere, total closes to corpus revenue") {
    import spark.implicits._
    val m = run("q_cohort_ltv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // Every cohort starts at month 0 and cumulative LTV never falls.
    val byCohort = m.groupBy(_._1)
    byCohort.foreach { case (c, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 === 0, s"cohort $c missing month 0")
      val ltvs = sorted.map(_._4)
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => b >= a },
        s"cohort $c LTV not monotone")
    }
    // Final-month LTV·size summed over cohorts recovers total corpus
    // revenue (up to one floor-division cent per cohort member).
    val finalCents = byCohort.map { case (_, rows) =>
      val last = rows.maxBy(_._2)
      BigInt(last._4) * last._3
    }.sum
    val total = BigInt(Tables.orders(spark, sf)
      .agg(round(sum($"o_totalprice") * 100).cast("long")).collect().head.getLong(0))
    val members = m.filter(_._2 == 0).map(_._3).sum
    assert((total - finalCents) >= 0 && (total - finalCents) <= members,
      s"total $total vs Σ ltv·size $finalCents (slack ${total - finalCents}, members $members)")
  }

  test("q_survival: anchors at 1, non-increasing, counts equal driver-side spans") {
    import spark.implicits._
    val ages = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(datediff(max(to_date($"ts")), min(to_date($"ts"))).as("age"))
      .collect().map(_.getInt(1))
    val expect = ages.groupBy(identity).map { case (a, xs) => a -> xs.length.toLong }
    val rows = run("q_survival").collect()
    assert(rows.map(r => r.getInt(0) -> r.getLong(1)).toMap === expect)
    val sorted = rows.sortBy(_.getInt(0))
    assert(math.abs(sorted.head.getAs[Double]("survival") - 1.0) < 1e-9)
    val s = sorted.map(_.getAs[Double]("survival"))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("q_skew_profile: ordered quantiles, consistent key count, skew factor = max/avg") {
    import spark.implicits._
    val r = run("q_skew_profile").collect()
    assert(r.length == 1)
    val row = r.head
    val (nKeys, minC, maxC) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (avgC, p50, p90, p99, skew) = (row.getDouble(3), row.getDouble(4),
      row.getDouble(5), row.getDouble(6), row.getDouble(7))
    assert(minC <= p50 && p50 <= p90 && p90 <= p99 && p99 <= maxC,
      s"quantiles out of order: $minC $p50 $p90 $p99 $maxC")
    val direct = Tables.lineitem(spark, sf)
      .select($"l_orderkey").distinct().count()
    assert(nKeys == direct, s"n_keys $nKeys != distinct keys $direct")
    // avg_c is itself rounded, so recomputing max/avg from it can
    // drift in the 4th decimal — a loose band still catches a wrong
    // formula (ratio off by a factor) without faking precision.
    assert(math.abs(skew - maxC / avgC) < 0.01,
      s"skew_factor $skew far from ${maxC / avgC}")
    assert(skew >= 1.0, "max/avg can never undercut 1")
  }

  test("q_gap_fill: dense consecutive daily grid; fill carries the latest observation") {
    import spark.implicits._
    val rows = run("q_gap_fill").collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).toInstant.getEpochSecond / 86400,
        r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // Independent daily sums — same engine, same rounding, NO window/
    // generator machinery: what the non-gap rows must reproduce.
    val daily = Tables.events(spark, sf)
      .filter($"user_id" < operators.Windows.GapFillUsers)
      .groupBy($"user_id", to_date($"ts").as("d"))
      .agg(round(sum($"value"), 4).as("v")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay, r.getDouble(2)))
      .map { case (u, d, v) => (u, d) -> v }.toMap
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // Dense: one row per day, consecutive from the user's first to
      // last observed day — the generator left no holes.
      assert(sorted.map(_._2).toSeq ===
        (sorted.head._2 to sorted.last._2).toSeq, s"user $u grid has holes")
      assert(!sorted.head._4, s"user $u starts with a gap row")
      var carried = Double.NaN
      sorted.foreach { case (_, d, v, wasGap) =>
        if (!wasGap) {
          assert(daily((u, d)) == v, s"user $u day $d: $v != daily sum")
          carried = v
        } else {
          assert(!daily.contains((u, d)), s"user $u day $d marked gap but has events")
          assert(v == carried, s"user $u day $d: gap fill $v != carried $carried")
        }
      }
    }
  }
}
