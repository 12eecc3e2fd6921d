package graft

/** Per-round benchmark: every SparkEntry query executed end-to-end.
  *
  * Each query is materialized with a `noop`-format write, not
  * `.count()` — under a count Catalyst prunes unreferenced projections
  * and eliminates final sorts, so expression-heavy queries would be
  * under-measured; the noop sink evaluates every output column of
  * every row and discards the bytes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // The sweep runs at the RECORDED config (GraftSession.RecordedCpus
    // unless SPARK_GRAFT_CPUS overrides) and the warm gate below only
    // accepts a baseline recorded at the SAME config — a bare Bench
    // run can no longer sweep at one local[n] while gating against
    // midpoints recorded at another (the r13–r16 phantom-flag class).
    val cpus = GraftSession.cpusFromEnv
    val spark = GraftSession.local(cpus)
    // The layout queries (q_partition_prune / q_bucket_join /
    // q_compact) memoize a write-once layout; build it untimed so the
    // cold pass measures the query, not the layout materialization.
    // Prime BEFORE warm (r21): prime's multi-job layout build floods
    // the fresh JVM's C2 queue, and a first-position iterative query
    // after it re-paid ~3–6 s of the fresh-chain floor the warm
    // miniatures exist to absorb (SweepProbe, warm→prime order:
    // kcore fresh 12.6 s vs QBench's 9.1–10.2 without prime) — with
    // warm LAST, the miniatures are the final thing the session runs
    // before the first timed query.
    sources.Layouts.prime(spark, sfDir)
    GraftSession.warm(spark)
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Self-join queries persist their signature subtrees; drop the
      // blocks so no run benefits from (or pays for) another's cache.
      // releaseAll (not clearCache) also drops the iterative queries'
      // checkpoint blocks, which live outside the SQL cache manager —
      // without it the sweep accumulates one materialized result per
      // iterative query in the shared block-manager budget (round-10's
      // sweep-context q_pagerank amplification).
      Storage.releaseAll(spark)
      elapsed
    }
    // FIXED-WORK calibration probe (r20 verdict item 1b): the same
    // deterministic, SF-independent shuffle+aggregate job timed at
    // sweep start, every [[CalEvery]] queries, and at sweep end, so a
    // host-drag window is visible IN the bench artifact instead of
    // only in out-of-band builder sweeps. The probe is deliberately
    // JVM/alloc-bound (hash shuffle + hash aggregate over 4M rows):
    // the r19/r20 noisy-neighbor windows left raw-CPU probes clean
    // while dragging memory-bound JVM work 1.5–2.2×, so a pure-CPU
    // burn would read clean exactly when the signal matters. Probe
    // times are NOT part of any query timing or of the cold/warm
    // totals; they ride in their own "calibration" line plus a
    // summary object in the contract line (ratio = max/min — ~1 on a
    // quiet host; a drag window inflates whichever probes it covers).
    // Each recorded probe is the MIN of two back-to-back passes, the
    // same one-sided-spike discipline as the warm channel: a single
    // in-sweep pass read up to 1.7× spread on a probed-quiet host
    // (one GC/scheduler hiccup per 0.5 s job suffices), which would
    // bury the 1.5–2.2× drag signal; a REAL drag window slows both
    // passes.
    def calProbe(): Double = {
      spark.sparkContext.setJobDescription("calibration probe")
      def onePass(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        spark.range(0, 4000000L, 1, 32)
          .selectExpr("pmod(xxhash64(id), 9973) AS k", "id")
          .groupBy("k")
          .agg(org.apache.spark.sql.functions.sum("id").as("s"),
            org.apache.spark.sql.functions.count("*").as("n"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val el = math.min(onePass(), onePass())
      spark.sparkContext.setJobDescription(null)
      el
    }
    val CalEvery = 50
    val calTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Settle the probe's own codegen/JIT before the first RECORDED
    // probe: its first execution pays one-time compilation that would
    // otherwise read as start-of-sweep "drag".
    calProbe()
    // Diagnostic order override: SPARK_GRAFT_FIRST=k1,k2 hoists the
    // named queries to the FRONT of the sweep (relative order of the
    // rest unchanged). Used to attribute in-sweep cold amplification —
    // a query whose sweep-first cold matches its isolated cold but
    // whose normal-position cold is inflated is paying sweep-context
    // state, not its own plan. Unset (the recorded config) the order
    // is exactly SparkEntry.queries' iteration order, as before.
    // distinct: a key listed twice would otherwise run twice, inflate
    // queries_n and the sweep total, and keep only the later timing
    // in the .toMap.
    val hoisted = sys.env.get("SPARK_GRAFT_FIRST")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq.distinct)
      .getOrElse(Seq.empty)
    val ordered = {
      val all = SparkEntry.queries.toSeq
      val front = hoisted.flatMap(k => all.find(_._1 == k))
      front ++ all.filterNot { case (k, _) => hoisted.contains(k) }
    }
    val results = ordered.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi % CalEvery == 0) calTimes += calProbe()
      // GC barrier between queries: heavy predecessors (KMeans,
      // minhash shuffles) otherwise bill multi-second collections to
      // whatever small query runs next — observed up to 6× outliers.
      System.gc()
      val cold = run(name, fn)
      // Warm iterations: the plan/codegen compile floor (~0.5–2 s per
      // query) is paid by the cold pass, so these approximate the
      // per-row cost that dominates at 100 TB where compilation
      // amortizes to nothing. Caches are cleared between passes —
      // warm means a warm JVM/codegen cache, never cached data.
      // A GC barrier first (the cold pass's garbage must not bill to
      // the warm channel), then the MINIMUM of two passes: one-off
      // host/GC spikes are one-sided slow and were rotating 2–5×
      // false flags through the regression gate on loaded windows
      // (round 10: two consecutive runs flagged 11 then 6 DISJOINT
      // queries), while a real per-row regression shows in both
      // passes — min kills the former and keeps the latter.
      System.gc()
      val warm = math.min(run(name, fn), run(name, fn))
      name -> (cold, warm)
    }
    calTimes += calProbe()
    // Locale-pinned formatting: the f-interpolator uses the JVM default
    // locale, and a comma decimal separator would make every line
    // unparseable JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val cold = results.map { case (k, (c, _)) => k -> c }.toMap
    val warm = results.map { case (k, (_, w)) => k -> w }.toMap
    def mapJson(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = cold.values.sum
    // Per-query WARM regression gate: the cold total is dominated by
    // the per-query plan/codegen compile floor, which can hide a 5×
    // per-row regression in any one query — but the warm channel is
    // the per-row term that scales to 100 TB. Compare each warm time
    // against the committed baseline (tools/warm_baseline.json,
    // recorded at sf0.1) and flag anything above 2× — the same
    // host-variance budget the cold total gets. Informational line;
    // the driver contract line stays last.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_WARM_BASELINE",
      "tools/warm_baseline.json")
    // The baseline is only accepted at the scale it was recorded at
    // (its "sf" tag must equal this run's SF dir); when it is refused
    // the status names the reason in the output line — a refused
    // baseline must never silently degrade to "0 regressions"
    // (WarmBaselineSpec pins the acceptance rules).
    val (baseline, baselineStatus) = WarmBaseline.load(baselinePath, sfDir, cpus)
    // Confirm pass for flagged queries only: a spike that survived
    // min-of-2 inside the sweep (some queries JIT-settle over more
    // repeats, and a loaded window can spike twice) gets one more
    // isolated measurement — GC barrier, quiet JVM — and keeps its
    // best time. Zero cost when the gate is clean; a REAL per-row
    // regression reproduces here and stays flagged.
    val confirmed = WarmBaseline.regressions(warm, baseline).map(_._1).map { k =>
      System.gc()
      k -> (warm(k), run(k, SparkEntry.queries(k)))
    }.toMap
    val warmFinal = warm ++ confirmed.map { case (k, (s, c)) => k -> math.min(s, c) }
    val totalWarm = warmFinal.values.sum
    // Exactly ONE {"metric":"total"} record per run: the full per-query
    // maps (too long for the driver's ~2000-char tail window) go out
    // under distinct metric names so a sum-all-totals or
    // parse-first-object consumer can't double-count or pick a
    // truncated parse. The warm channel is informational: the cold
    // line below stays the unchanged driver contract.
    println(s"""{"metric":"queries_full","value":${fmt(total)},"unit":"sec","queries":${mapJson(cold)},"sf":"$sfDir"}""")
    println(s"""{"metric":"queries_full_warm","value":${fmt(totalWarm)},"unit":"sec","queries":${mapJson(warmFinal)},"sf":"$sfDir"}""")
    // Confirm-pass transparency: keeping only min(sweep, confirm) can
    // permanently mask an INTERMITTENT regression (one lucky pass per
    // round). Record both measurements and call out disagreement wider
    // than the gate ratio itself, so a query that oscillates across
    // the threshold reads as "unstable" in the round evidence instead
    // of silently passing.
    WarmBaseline.confirmSpreadLine(confirmed).foreach(println)
    println(s"""{"metric":"total_warm","value":${fmt(totalWarm)},"unit":"sec","queries_n":${results.size},"sf":"$sfDir"}""")
    val regressions = WarmBaseline.regressions(warmFinal, baseline)
    val regJson = regressions
      .map { case (k, w, b) => "\"" + k + "\":{\"warm\":" + fmt(w) + ",\"baseline\":" + fmt(b) + "}" }
      .mkString("{", ",", "}")
    // Queries absent from the baseline are silently unchecked by the
    // gate — surface them so a grown query set is visible in the same
    // line instead of only via baseline_n < queries_n. The list is
    // CAPPED: the driver parses only a ~2000-char stdout tail, and an
    // uncapped list is longest exactly when the query set just grew —
    // the moment the signal matters — so the full count rides in
    // unbaselined_n and only the first few names are spelled out.
    val unbaselined =
      if (baseline.isEmpty) Seq.empty
      else warm.keys.filterNot(baseline.contains).toSeq.sorted
    val unbaselinedShown = unbaselined.take(8)
    val thresholdTag =
      if (WarmBaseline.GateFactor == WarmBaseline.GateFactor.toLong)
        s"${WarmBaseline.GateFactor.toLong}x"
      else s"${WarmBaseline.GateFactor}x"
    println(s"""{"metric":"warm_regressions","count":${regressions.size},"threshold":"$thresholdTag","baseline":"${baselineStatus.tag}","queries":$regJson,"baseline_n":${baseline.size},"unbaselined_n":${unbaselined.size},"unbaselined":${unbaselinedShown.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    // The driver captures only the TAIL of stdout (observed: last
    // 2000 chars) and parses the JSON it finds there. At 89 queries
    // the full line above exceeds that window, so its head is cut and
    // nothing parses (BENCH_r01..r03 all have "parsed": null). The
    // LAST line is the contract line: complete within any plausible
    // tail window, per-query map limited to the slowest entries, full
    // count recorded alongside.
    val slowest = cold.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Calibration summary: every probe time in its own (head-of-
    // output) line, min/med/max + max/min ratio compact enough for
    // the contract line's tail window. A quiet host reads ratio
    // ≈ 1–1.5; the r19/r20 drag windows read 2×+ on JVM-bound work —
    // so a sweep whose slow queries coincide with inflated probes is
    // self-evidently drag, and one whose probes are flat is not.
    val calSorted = calTimes.toSeq.sorted
    val calJson =
      if (calSorted.isEmpty) """{"n":0}"""
      else {
        val med = calSorted(calSorted.size / 2)
        val ratio = calSorted.last / math.max(calSorted.head, 1e-9)
        s"""{"n":${calSorted.size},"min":${fmt(calSorted.head)},"med":${fmt(med)},"max":${fmt(calSorted.last)},"ratio":${fmt(ratio)}}"""
      }
    println(s"""{"metric":"calibration","unit":"sec","every_n_queries":$CalEvery,"probes":${calTimes.map(fmt).mkString("[", ",", "]")}}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$slowest,"queries_n":${results.size},"calibration":$calJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
