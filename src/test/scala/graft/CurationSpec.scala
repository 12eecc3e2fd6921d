package graft

import graft.functions.{Curation, Text}
import org.apache.spark.sql.functions._

/** Semantic pins for the corpus-curation operators — the properties
  * the DuckDB hash-match can't express: quota/budget bounds hold for
  * EVERY source, boundary-crossing docs are kept, LM scores order
  * rare-token docs below common-token docs, and planted cross-doc
  * boilerplate is detected while unique text is not.
  */
class CurationSpec extends SparkSpec {

  test("q_domain_cap keeps at most the cap per source and positions are 1..n") {
    val rows = run("q_domain_cap")
      .groupBy("source").agg(count(lit(1)).as("n"), max("pos").as("mx"),
        min("pos").as("mn"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mx, mn) = (r.getLong(1), r.getInt(2), r.getInt(3))
      assert(n <= Curation.DomainCap, s"source ${r.getString(0)} over cap")
      assert(mn == 1 && mx == n, "positions must be dense 1..n")
    }
  }

  test("q_domain_cap selection is a function of doc_id alone (stable under refresh of other sources)") {
    import spark.implicits._
    // Dropping an entire OTHER source must not change which docs a
    // surviving source keeps — the md5 priority depends only on the
    // doc itself, so per-source selections are independent.
    val docs = Tables.documents(spark, sf)
    val keepAll = run("q_domain_cap").filter($"source" === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"h".asc, $"doc_id".asc)
    val keepSubset = docs.filter($"source" =!= "src1")
      .select($"doc_id", $"source", md5($"doc_id".cast("string")).as("h"))
      .withColumn("pos", row_number().over(w))
      .filter($"pos" <= Curation.DomainCap && $"source" === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keepAll == keepSubset)
  }

  test("q_span_scrub removes exactly the positions q_dup_span_coverage counts; untouched docs keep content") {
    import spark.implicits._
    val scrub = run("q_span_scrub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // The two queries define "covered" identically — interval-union
    // length (coverage) must equal the count of removed positions
    // (scrub), for EVERY doc.
    val cov = run("q_dup_span_coverage").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    scrub.foreach { case (id, _, rem, _) =>
      assert(rem.toLong == cov(id), s"doc $id: removed $rem != covered ${cov(id)}")
    }
    assert(scrub.exists(_._3 > 0), "no doc scrubbed — dead branch")
    assert(scrub.exists(_._3 == 0), "every doc scrubbed — dead branch")
    // A doc with nothing removed must fingerprint to its canonical
    // (space-rejoined) token stream — the scrub is a no-op rewrite.
    val canon = Tables.documents(spark, sf)
      .select($"doc_id", md5(concat_ws(" ", Text.tokens($"text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    scrub.filter(_._3 == 0).foreach { case (id, _, _, fp) =>
      assert(fp == canon(id), s"doc $id content changed by a zero-removal scrub")
    }
  }

  test("q_source_mix: contiguous ranks, monotone cumulative coverage closing at exactly 1, full doc accounting") {
    val rows = run("q_source_mix").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length),
      "ranks must be the contiguous 1..n in output order")
    val cums = rows.map(_.getDouble(5)).toSeq
    assert(cums === cums.sorted, "cumulative share must be nondecreasing")
    assert(cums.last === 1.0,
      "the final cumulative share is tt/tt — exactly 1 after rounding")
    val shares = rows.map(_.getDouble(4))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    assert(math.abs(shares.sum - 1.0) < 1e-3,
      "per-source shares must close to ~1 (6-dp rounding residue only)")
    assert(rows.map(_.getLong(2)).sum ===
      Tables.documents(spark, sf).count(),
      "every document must be counted in exactly one source row")
  }

  test("q_token_budget: every source's exclusive prefix is under budget and the crossing doc is kept") {
    import spark.implicits._
    val out = run("q_token_budget")
    // Every kept row's exclusive prefix is under budget by definition;
    // the real pin is on the NEXT doc: for each source, re-derive the
    // priority order and check the first non-kept doc (if any) is
    // exactly the one whose exclusive prefix reached the budget.
    assert(out.filter($"cum_before" >= Curation.TokenBudget).isEmpty)
    val perSource = out.groupBy("source")
      .agg(sum("n_toks").as("kept_toks"), max("cum_before").as("max_before"))
      .collect()
    perSource.foreach { r =>
      // The last kept doc started under budget, so total kept tokens
      // can exceed the budget only by that one doc's length — the
      // "within one doc of budget" contract.
      val lastStart = r.getLong(2)
      assert(lastStart < Curation.TokenBudget)
    }
    // The boundary pin the query's own filter can't imply: re-derive
    // the priority order independently and walk each source's
    // exclusive prefix sums. The crossing doc (starts under budget,
    // ends over) must be KEPT; the first doc at-or-over budget must be
    // the first one DROPPED. An inclusive window frame — the off-by-
    // one that silently drops the crossing doc — fails here.
    val docs = Tables.documents(spark, sf)
    val keptIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val bySource = docs
      .select($"doc_id", $"source", $"n_chars",
        functions.Text.tokenCount($"text").cast("long").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._2)
    var sawCrossing = false
    bySource.foreach { case (src, rows) =>
      val ordered = rows.sortBy { case (id, _, nChars, _) => (-nChars, id) }
      var cum = 0L
      ordered.foreach { case (id, _, _, n) =>
        val expectKept = cum < Curation.TokenBudget
        assert(keptIds.contains(id) === expectKept,
          s"$src doc $id: exclusive prefix $cum vs budget ${Curation.TokenBudget} — " +
            s"expected kept=$expectKept")
        if (expectKept && cum + n > Curation.TokenBudget) sawCrossing = true
        cum += n
      }
    }
    // The boundary case actually occurred (otherwise this run proved
    // nothing about the crossing rule).
    assert(sawCrossing, "no source produced a budget-crossing doc at this sf")
  }

  test("token budget: chunked formulation ≡ single-window formulation on documents") {
    val docs = Tables.documents(spark, sf)
    val scaled = Curation.tokenBudgetScaled(docs).collect().toSeq
    val windowed = Curation.tokenBudgetWindowed(docs).collect().toSeq
    assert(scaled === windowed)
  }

  test("token budget parity on adversarial source shapes (crossing-first, all-kept, deep-prune)") {
    import spark.implicits._
    // Three boundary shapes the documents table may not cover at this
    // sf: a source whose FIRST doc alone crosses the budget (only it
    // kept), a source whose docs sum under budget (all kept, no chunk
    // ever pruned), and a source long enough that most of its chunks
    // start past the budget (the prune path does real work). Token
    // counts are exact: text is k repetitions of one word.
    val rows =
      Seq(("crossfirst", 1, Curation.TokenBudget + 50)) ++
        (1 to 5).map(i => ("crossfirst", 1 + i, 10)) ++
        (1 to 7).map(i => ("tiny", 10 + i, 3)) ++
        (1 to 400).map(i => ("deep", 100 + i, 7))
    val fixture = rows.toDF("source", "id", "k")
      .select(($"id" * 1000).cast("long").as("doc_id"), $"source",
        // n_chars descending order must agree with k descending so the
        // windowed walk and the chunked walk see one priority order
        ($"k" * 2).as("n_chars"),
        concat_ws(" ", array_repeat(lit("w"), $"k")).as("text"))
    val scaled = Curation.tokenBudgetScaled(fixture).collect().toSeq
    val windowed = Curation.tokenBudgetWindowed(fixture).collect().toSeq
    assert(scaled === windowed)
    assert(scaled.count(_.getString(1) == "crossfirst") == 1,
      "the over-budget first doc must be the only crossfirst survivor")
    assert(scaled.count(_.getString(1) == "tiny") == 7, "under-budget source must keep all docs")
    // and chunk-count invariance: the kept set cannot depend on where
    // chunk boundaries fall inside the deep source
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(Curation.tokenBudgetScaled(fixture).collect().toSeq === windowed)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("q_mix_temperature replays shares and sqrt weights; flattening inequalities hold") {
    import spark.implicits._
    val bySrc = Tables.documents(spark, sf)
      .select($"source", functions.Text.tokenCount($"text").cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, rs) => s -> ((rs.size.toLong, rs.map(_._2).sum)) }
    val tt = bySrc.values.map(_._2).sum
    val mx = bySrc.values.map(_._2).max
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("q_mix_temperature").collect()
    assert(got.map(_.getString(0)).toSet === bySrc.keySet)
    // Ordered by n_tokens desc, source asc.
    assert(got.map(r => (-r.getLong(2), r.getString(0))).toSeq ===
      got.map(r => (-r.getLong(2), r.getString(0))).toSeq.sorted)
    got.foreach { r =>
      val (nd, nt) = bySrc(r.getString(0))
      assert(r.getLong(1) === nd && r.getLong(2) === nt, r.getString(0))
      assert(r.getDouble(3) === r6(nt.toDouble / tt), s"${r.getString(0)} share")
      assert(r.getDouble(4) === r6(math.sqrt(nt.toDouble / mx)), s"${r.getString(0)} w_rel")
      assert(r.getDouble(5) === r6(math.sqrt(mx.toDouble / nt)), s"${r.getString(0)} boost")
      // Temperature flattening: every source is boosted AT LEAST to
      // proportional (boost ≥ 1, = 1 only for the largest), and the
      // relative weight dominates the relative share.
      assert(r.getDouble(5) >= 1.0 - 1e-9)
      assert(r.getDouble(4) + 1e-9 >= nt.toDouble / mx)
    }
  }

  test("q_token_budget_dedup: survivor choice, duplicate displacement, and no-dup identity") {
    import spark.implicits._
    // The fixture SF has no exact duplicates, so the registered query
    // must equal plain q_token_budget there — the composition is a
    // no-op exactly when the corpus is already unique.
    assert(run("q_token_budget_dedup").collect().toSeq ===
      run("q_token_budget").collect().toSeq)
    // Dedup semantics on a constructed corpus: one source whose
    // budget-hogging head doc is a whitespace-variant duplicate group
    // (the fingerprint normalizes runs, so all three collapse; the
    // keeper is the LONGEST text — the padded variant), plus unique
    // tail docs a raw budget would displace. Token counts are exact:
    // k repetitions of one word.
    def doc(k: Int): String = ("w " * k).trim
    val rows = Seq(
      // duplicate group: same normalized text (the fingerprint
      // collapses INTERNAL whitespace runs; it does not trim, so the
      // variants vary run width, not edges), different raw lengths
      (1L, "s", 600L, doc(300)),
      (2L, "s", 601L, doc(300).replace(" ", "  ")), // longest raw → keeper
      (3L, "s", 600L, doc(300).replace(" ", " \t")),
      // unique tail, each 250 tokens
      (4L, "s", 300L, ("a " * 250).trim),
      (5L, "s", 299L, ("b " * 250).trim),
      (6L, "s", 298L, ("c " * 250).trim))
      .toDF("doc_id", "source", "n_chars", "text")
    val kept = Curation.tokenBudgetDeduped(rows)
      .collect().map(_.getLong(0)).toSet
    // Raw budget (500): docs 2 then 1 fill it (300+300 ≥ 500) and
    // doc 4 never enters. Deduped: ONE 300-token survivor (doc 2 —
    // longest raw text wins; doc 3 ties it on length, loses on id),
    // then doc 4 starts at 300 < 500 (crossing doc kept) and doc 5
    // starts at 550 ≥ 500.
    assert(kept === Set(2L, 4L),
      s"deduped budget must keep the longest-variant survivor then refill: $kept")
    val raw = Curation.tokenBudgetScaled(rows).collect().map(_.getLong(0)).toSet
    assert(raw === Set(1L, 2L),
      s"raw budget must burn on the duplicate group: $raw")
    // And the chunked composition equals the single-window reference
    // over the same survivor set.
    val survivors = rows.filter($"doc_id".isin(2L, 4L, 5L, 6L))
    assert(Curation.tokenBudgetDeduped(rows).collect().toSeq ===
      Curation.tokenBudgetWindowed(survivors).collect().toSeq)
  }

  test("q_unigram_lm scores rare-token docs below common-token docs") {
    import spark.implicits._
    // Build a corpus where "common" appears everywhere and "rareX"
    // once each: the all-common doc must outscore the all-rare doc.
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "rare1 rare2 rare3 rare4"),
      (3L, "common common rare5 common"),
      (4L, "common filler words here"))
      .toDF("doc_id", "text")
    val terms = docs.select($"doc_id", explode(functions.Text.tokens(lower($"text"))).as("term"))
    val cnt = terms.groupBy($"term").agg(count(lit(1)).as("c"))
    val tot = broadcast(terms.agg(count(lit(1)).as("n")))
    val sc = terms.join(cnt, Seq("term")).crossJoin(tot)
      .groupBy($"doc_id")
      .agg(avg(log($"c" / $"n".cast("double"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc(1L) > sc(3L), "pure-common must outscore mostly-common")
    assert(sc(3L) > sc(2L), "mostly-common must outscore all-rare")
    // And the registered query emits one score per document.
    val out = run("q_unigram_lm")
    assert(out.count() === Tables.documents(spark, sf).count())
    assert(out.filter($"lm_score" > 0).isEmpty, "log-probs can't be positive")
  }

  test("q_ngram_novelty flags planted cross-doc boilerplate but not unique text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six seven"), // unique
      (4L, "short doc")) // no trigrams
      .toDF("doc_id", "text")
    val tris = docs
      .select($"doc_id", functions.Text.tokens($"text").as("tk"))
      .select($"doc_id", functions.Text.trigrams($"tk").as("tg"))
      .select($"doc_id", explode(array_distinct($"tg")).as("tri"))
    val dfc = tris.groupBy($"tri").agg(count(lit(1)).as("df"))
    val frac = tris.join(dfc, Seq("tri")).groupBy($"doc_id")
      .agg((sum(when($"df" >= 2, 1).otherwise(0)) /
        count(lit(1))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(frac(1L) === 1.0 && frac(2L) === 1.0, "planted dup pair: all trigrams shared")
    assert(frac(3L) === 0.0, "unique doc: no shared trigrams")
    assert(!frac.contains(4L), "no-trigram doc emits no candidate rows")
    // Registered query: no-trigram docs surface with n_tg=0, frac 0.
    val out = run("q_ngram_novelty")
    assert(out.count() === Tables.documents(spark, sf).count())
    assert(out.filter($"dup_frac" < 0 || $"dup_frac" > 1).isEmpty)
  }

  test("q_dup_span_coverage: planted shared span covers exactly its tokens; interval union never over-counts") {
    import spark.implicits._
    // A and B share a 10-token run (→ 3 duplicated 8-gram starts at
    // positions 1,2,3 whose interval union is exactly 10 tokens); C is
    // unique. The sorted-starts window must count 1+1+8, NOT 3×8.
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val docs = Seq(
      (1L, shared + " tailA1 tailA2"),
      (2L, shared + " tailB1 tailB2 tailB3"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"))
      .toDF("doc_id", "text")
    val grams = docs
      .select($"doc_id", functions.Text.tokens($"text").as("tk"))
      .select($"doc_id", $"tk",
        explode(when(size($"tk") < Curation.SpanLen, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size($"tk") - (Curation.SpanLen - 1)))).as("start"))
      .select($"doc_id", $"start",
        array_join(slice($"tk", $"start", lit(Curation.SpanLen)), " ").as("gram"))
    val dfc = grams.select($"doc_id", $"gram").distinct()
      .groupBy($"gram").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"start")
    val covered = grams.join(dfc, Seq("gram")).filter($"df" >= 2)
      .withColumn("next", lead($"start", 1).over(w))
      .withColumn("contrib",
        when($"next".isNull, lit(Curation.SpanLen))
          .otherwise(least(lit(Curation.SpanLen), $"next" - $"start")))
      .groupBy($"doc_id").agg(sum($"contrib").as("n_covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(covered(1L) === 10L, s"A: shared run covers its 10 tokens, got $covered")
    assert(covered(2L) === 10L, s"B: same 10, got $covered")
    assert(!covered.contains(3L), "unique doc has no duplicated span")
    // Real data: the union can never exceed the doc.
    val out = run("q_dup_span_coverage")
    assert(out.count() === Tables.documents(spark, sf).count())
    assert(out.filter($"n_covered" > $"n_tokens").isEmpty,
      "interval union over-counted past the token count")
    assert(out.filter($"coverage" < 0 || $"coverage" > 1).isEmpty)
  }

  test("q_source_kl: Gibbs nonnegativity and a driver-side replay per source") {
    import spark.implicits._
    val rows = run("q_source_kl").collect()
    assert(rows.length === Tables.documents(spark, sf)
      .select($"source").distinct().count().toInt)
    // KL(P‖Q) ≥ 0 with equality iff P = Q (Gibbs' inequality) — a
    // negative row means the twin-shared formula is not a KL at all.
    assert(rows.forall(_.getAs[Double]("kl") >= 0.0),
      "negative KL divergence")
    // Driver replay from raw token counts, every source.
    val toks = Tables.documents(spark, sf)
      .select($"source", explode(Text.tokens(lower($"text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nc = toks.length.toDouble
    val cc = toks.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val bySrc = toks.groupBy(_._1)
    val got = rows.map(r => r.getString(0) ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_terms"),
        r.getAs[Double]("kl")))).toMap
    bySrc.foreach { case (src, ts) =>
      val ns = ts.length.toDouble
      val cs = ts.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
      val kl = BigDecimal(cs.toSeq.sortBy(_._1).map { case (t, c) =>
        (c / ns) * math.log((c * nc) / (ns * cc(t)))
      }.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gt, gk) = got(src)
      assert(gn === ns.toLong && gt === cs.size.toLong, src)
      assert(math.abs(gk - kl) <= 1e-6,
        s"$src: kl $gk != replay $kl (sum-order tolerance exceeded)")
    }
  }

  test("q_log_odds: full driver replay of the Monroe z-scores and top-5 selection") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select($"source", explode(Text.tokens(lower($"text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = toks.length.toLong
    val yc = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = toks.groupBy(_._1)
    val a0 = Curation.LogOddsPrior
    val expect = bySrc.flatMap { case (src, ts) =>
      val ns = ts.length.toLong
      val ys = ts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      ys.toSeq.map { case (term, y) =>
        val at = a0 * yc(term) / n
        val yr = (yc(term) - y).toDouble
        val nr = (n - ns).toDouble
        val delta = math.log((y + at) / (ns + a0 - y - at)) -
          math.log((yr + at) / (nr + a0 - yr - at))
        val z = BigDecimal(delta / math.sqrt(1.0 / (y + at) + 1.0 / (yr + at)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (src, term, y, z)
      }.sortBy { case (_, term, _, z) => (-z, term) }
        .take(Curation.LogOddsTopK)
        .zipWithIndex.map { case ((s2, t2, y2, z2), i) => (s2, i + 1, t2, y2, z2) }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = run("q_log_odds").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got === expect)
    // The prior must be doing its job: no selected term is a hapax
    // seen once in the whole corpus (raw log-odds would rank those first).
    assert(got.forall { case (_, _, term, _, _) => yc(term) > 1 },
      "a corpus-hapax term won the z ranking — the Dirichlet prior is inert")
  }

  test("q_epoch_schedule replays the integer schedule; cap and no-cap branches both occur") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(Text.Ws + "+").count(_.nonEmpty).toLong))
    val byLang = toks.groupBy(_._1).view
      .mapValues(rows => math.max(rows.map(_._2).sum, 1L)).toMap
    val weight = byLang.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val wt = weight.values.sum
    val budget = byLang.values.sum * Curation.EpochBudgetMult
    val got = run("q_epoch_schedule").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet === byLang.keySet)
    byLang.foreach { case (lang, n) =>
      val w = weight(lang)
      val target = budget * w / wt
      val epochs = (target + n - 1) / n
      val capped = math.min(epochs, Curation.MaxEpochs)
      assert(got(lang) === ((n, w, target, epochs, capped, capped * n)), lang)
    }
    // Both schedule regimes must occur, or the cap (and the
    // temperature boost it bounds) was never exercised.
    val (cappedLangs, freeLangs) =
      got.values.partition { case (_, _, _, e, c, _) => c < e }
    assert(cappedLangs.nonEmpty, "cap never binds at this sf")
    assert(freeLangs.nonEmpty, "every language capped — budget too large")
  }

  test("q_ccnet_buckets matches the single-window ntile formulation and tercile boundaries are ordered") {
    import spark.implicits._
    // Independent formulation: the same unigram scoring, bucketed by
    // the NATIVE ntile window (one task per lang — fine at spec scale;
    // the registered query's PrefixScan formula must agree exactly).
    val docs = Tables.documents(spark, sf)
    val terms = docs.select($"doc_id",
      explode(Text.tokens(lower($"text"))).as("term")).persist()
    val cnt = terms.groupBy($"term").agg(count(lit(1)).as("c"))
    val tot = terms.agg(count(lit(1)).as("n"))
    val scored = terms.join(cnt, Seq("term")).crossJoin(broadcast(tot))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(avg(log($"c" / $"n".cast("double"))), 4).as("lm_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"lm_score".desc, $"doc_id".asc)
    val expect = docs.select($"doc_id", $"lang").join(scored, Seq("doc_id"))
      .withColumn("b", ntile(3).over(w))
      .groupBy($"lang", $"b")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_toks"),
        min($"lm_score").as("lo_score"), max($"lm_score").as("hi_score"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    terms.unpersist()
    val labels = Map("head" -> 1, "middle" -> 2, "tail" -> 3)
    val got = run("q_ccnet_buckets").collect().map(r =>
      (r.getString(0), labels(r.getString(1))) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === expect)
    // Tercile semantics: per lang, 3 buckets, sizes within 1 of each
    // other, and score ranges ordered head >= middle >= tail (ties may
    // touch at the boundary, never cross).
    got.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val szs = (1 to 3).map(b => got((lang, b))._1)
      assert(szs.max - szs.min <= 1, s"$lang sizes $szs not balanced")
      assert(got((lang, 1))._3 >= got((lang, 2))._4,
        s"$lang head floor below middle ceiling")
      assert(got((lang, 2))._3 >= got((lang, 3))._4,
        s"$lang middle floor below tail ceiling")
    }
  }
}
