package graft

import org.apache.spark.sql.functions._

class AggJoinWindowSpec extends SparkSpec {

  test("q_agg_summary group count equals sum of cnt") {
    import spark.implicits._
    val rows = run("q_agg_summary").collect()
    assert(rows.length === 6) // 3 returnflags × 2 linestatus
    val total = rows.map(r => r.getAs[Long]("cnt")).sum
    val expected = Tables.lineitem(spark, sf).filter($"l_quantity" <= 49).count()
    assert(total === expected)
  }

  test("q_count_distinct matches dropDuplicates counts") {
    val r = run("q_count_distinct").collect().head
    val li = Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("n_parts") === li.select("l_partkey").distinct().count())
    assert(r.getAs[Long]("n_flags") === 3)
  }

  test("rollup contains group rows, subtotals and grand total") {
    val rows = run("q_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("cnt") === Tables.lineitem(spark, sf).count())
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(subtotals.length === 3)
  }

  test("union count = sum of branch counts; intersect/except partition the key space") {
    val u = run("q_union").count()
    assert(u === Tables.customer(spark, sf).count() + Tables.supplier(spark, sf).count())
    import spark.implicits._
    val interNk = run("q_intersect").collect().map(_.getInt(0)).toSet
    val suppNk = Tables.supplier(spark, sf).select($"s_nationkey").collect().map(_.getInt(0)).toSet
    val custNk = Tables.customer(spark, sf).select($"c_nationkey").collect().map(_.getInt(0)).toSet
    assert(interNk === (custNk intersect suppNk))
  }

  test("semi + anti partition customers exactly") {
    import spark.implicits._
    val semi = run("q_join_semi").collect().map(_.getLong(0)).toSet
    val anti = run("q_join_anti").collect().map(_.getLong(0)).toSet
    val all = Tables.customer(spark, sf).select($"c_custkey").collect().map(_.getLong(0)).toSet
    // semi uses threshold 250k, anti uses 400k: anti ⊇ complement of semi-at-400k.
    assert(semi.subsetOf(all) && anti.subsetOf(all))
    val semi400 = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter($"o_totalprice" > 400000),
        $"c_custkey" === $"o_custkey", "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert((semi400 union anti) === all && (semi400 intersect anti).isEmpty)
  }

  test("q_join_left keeps all customers") {
    assert(run("q_join_left").count() === Tables.customer(spark, sf).count())
  }

  test("q_join_broadcast plan actually broadcasts") {
    val plan = run("q_join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q_filter_topk_count plans as TakeOrderedAndProject (no global sort)") {
    val plan = run("q_filter_topk_count").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("window rank within [1,3] and per-group top keys are the group maxima") {
    import spark.implicits._
    val rows = run("q_window_rank").collect()
    assert(rows.forall(r => r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 3))
    val top = rows.filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val maxByHand = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority").agg(max($"o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(top === maxByHand)
  }

  test("distribution triple: range-chunked formulation ≡ single-window formulation on orders") {
    val scaled = operators.Windows.distributionScaled(Tables.orders(spark, sf))
      .collect().toSeq
    val windowed = operators.Windows.distributionWindowed(Tables.orders(spark, sf))
      .collect().toSeq
    assert(scaled === windowed)
  }

  test("distribution triple parity on adversarial group sizes (n<k, n=k, n≡k±1, skew)") {
    import spark.implicits._
    // Group sizes straddling every ntile edge: 1 (pct_rank=0 branch),
    // 2, 3 (n<k), 4 (n=k), 5 (one oversized bucket), 7, 8, 100 (the
    // skewed group the chunked formulation exists for). Values are
    // md5-derived so chunk boundaries can't align with group edges by
    // construction.
    val sizes = Seq(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5, 6 -> 7, 7 -> 8, 8 -> 100)
    val rows = sizes.flatMap { case (g, n) =>
      (1 to n).map(i => (s"grp_$g", (g * 1000 + i).toLong))
    }
    val fixture = rows.toDF("o_orderpriority", "o_orderkey")
      .withColumn("o_totalprice",
        round(conv(substring(md5($"o_orderkey".cast("string")), 1, 6), 16, 10)
          .cast("double") / 100, 2))
    val scaled = operators.Windows.distributionScaled(fixture).collect().toSeq
    val windowed = operators.Windows.distributionWindowed(fixture).collect().toSeq
    assert(scaled === windowed)
    // And the chunked result must be invariant to the chunk count
    // (= shuffle.partitions, what repartitionByRange targets) — chunk
    // ids have to cancel out of (rank, group total).
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      assert(operators.Windows.distributionScaled(fixture).collect().toSeq === windowed)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("running sum final value per customer equals the customer's total") {
    import spark.implicits._
    val finals = run("q_window_runsum").collect()
      .groupBy(_.getLong(0)).map { case (ck, rs) => ck -> rs.map(_.getDouble(2)).max }
    val byHand = Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(round(sum($"o_totalprice"), 4).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    finals.foreach { case (ck, v) => assert(math.abs(v - byHand(ck)) < 1e-6) }
  }

  test("q_hll_merge: union of per-source sketches equals the direct sketch and the exact count") {
    import spark.implicits._
    val merged = run("q_hll_merge").collect().head.getLong(0)
    // Merge-of-partials ≡ aggregate-of-everything, the same contract
    // q_agg_incremental's oracle proves for additive state — here the
    // state is a sketch, so the proof is the spec.
    val direct = Tables.documents(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg($"doc_id", lit(14))))
      .collect().head.getLong(0)
    assert(merged === direct,
      "sketch union must be lossless vs the single-pass sketch")
    // doc_id cardinality is far below the dense-mode threshold, where
    // the DataSketches HLL is exact, not approximate.
    val exact = Tables.documents(spark, sf).select($"doc_id").distinct().count()
    assert(merged === exact,
      s"sparse-mode HLL should be exact here: est $merged vs true $exact")
  }

  test("q_attribution matches a driver-side last-touch replay") {
    import spark.implicits._
    // tm read as Option (a getLong on a NULL ts silently reads 0 and
    // sorts FIRST, while the query pins NULLS LAST) — the replay's
    // ordering and credit logic must encode the same contract the
    // query states, not depend on the fixture having no null ts.
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_micros($"ts").as("tm"),
        $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
    val win = graft.operators.Windows.AttribWindowMicros
    // Per user, in (ts NULLS LAST, event_id) order, carry the last
    // non-purchase touch; each purchase credits it when inside the
    // window. The carries mirror the query's two ignore-nulls last()
    // columns exactly: prev_tm skips null-ts touches (their touch
    // value is NULL), prev_type does not — and the window predicate
    // follows SQL three-valued logic, so a null-ts purchase with a
    // prior timed touch credits that touch with a NULL lag.
    val credited = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      var lastTm: Option[Long] = None
      var lastType: Option[String] = None
      evs.sortBy(e => (e._3.isEmpty, e._3.getOrElse(0L), e._1)).flatMap {
        case (_, _, tm, tpe) =>
          if (tpe != "purchase") {
            if (tm.isDefined) lastTm = tm
            lastType = Some(tpe)
            None
          } else {
            // when(prev_tm IS NULL OR tm − prev_tm > win, 'direct')
            // .otherwise(prev_type): a NULL tm makes the comparison
            // NULL (not true), falling through to the touch branch.
            val direct = lastTm.isEmpty ||
              (tm.isDefined && tm.get - lastTm.get > win)
            if (direct) Some(("direct", None))
            else Some((lastType.get, tm.map(_ - lastTm.get)))
          }
      }
    }
    val expect = credited.groupBy(_._1).map { case (ch, xs) =>
      val lags = xs.flatMap(_._2)
      ch -> (xs.length.toLong,
        if (lags.isEmpty) None
        else Some(BigDecimal(lags.map(BigInt(_)).sum.toDouble / 60e6 / lags.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = run("q_attribution").collect().map { r =>
      r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap
    assert(got.keySet === expect.keySet)
    assert(got.contains("direct"), "fixture must exercise the direct branch")
    expect.foreach { case (ch, (n, lag)) =>
      assert(got(ch)._1 === n, ch)
      (got(ch)._2, lag) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-3, ch)
        case (a, b) => assert(a === b, ch)
      }
    }
  }
}
