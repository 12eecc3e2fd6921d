package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Round-2 operator breadth: as-of join, binned range join, pivot,
  * salted aggregation, percentiles, cube, distribution windows,
  * bigrams, centroids, stratified sampling.
  */
class OperatorBreadthSpec extends SparkSpec {

  test("asofJoin picks the latest build row at-or-before each probe ts") {
    import spark.implicits._
    val probe = Seq((100L, 1L, 10L), (101L, 1L, 5L), (102L, 2L, 7L))
      .toDF("event_id", "k", "t")
    val build = Seq((1L, 3L, 30L), (1L, 10L, 100L), (1L, 12L, 120L), (2L, 9L, 90L))
      .toDF("k", "t", "payload")
    val out = Joins.asofJoin(probe, build, "k", "t", "payload")
      .select($"event_id", $"payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(100L) === 100L) // t=10 matches the build row AT 10 (inclusive)
    assert(out(101L) === 30L)  // t=5 → latest build at 3
    assert(out(102L) === -1L)  // t=7 precedes the only k=2 build row (9)
  }

  test("q_join_asof matches per-row max-subquery semantics") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"))
    val expected = purchases.join(views,
        $"user_id" === $"v_user" && $"v_ts" <= $"ts", "left")
      .groupBy($"event_id").agg(max($"v_ts").as("view_ts"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val got = run("q_join_asof").collect()
      .map(r => r.getLong(0) -> r.get(2)).toMap
    assert(got === expected)
  }

  test("binned range join returns exactly the BNLJ range-join result") {
    val a = run("q_join_range").collect().toSeq
    val b = run("q_join_range_binned").collect().toSeq
    assert(a === b)
  }

  test("salted aggregation equals the direct groupBy") {
    import spark.implicits._
    val direct = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(run("q_salted_agg").collect().toSeq === direct)
  }

  test("pivot counts per row sum to the group total") {
    import spark.implicits._
    val rows = run("q_pivot").collect()
    val totals = Tables.orders(spark, sf).groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val s = r.getLong(1) + r.getLong(2) + r.getLong(3)
      assert(s === totals(r.getString(0)))
    }
  }

  test("cube contains group, both subtotal shapes, and the grand total") {
    val rows = run("q_cube").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val grand = rows.filter(t => t._1 == "ALL" && t._2 == "ALL")
    assert(grand.length === 1)
    assert(grand.head._3 === Tables.orders(spark, sf).count())
    assert(rows.exists(t => t._1 == "ALL" && t._2 != "ALL"))
    assert(rows.exists(t => t._1 != "ALL" && t._2 == "ALL"))
  }

  test("percentiles are ordered and within the value domain") {
    val rows = run("q_percentiles").collect()
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
      assert(p25 >= 1.0 && p75 <= 50.0)
    }
  }

  test("ntile quartiles are 1..4 and cume_dist ends at 1") {
    import spark.implicits._
    val rows = run("q_window_ntile")
    val qs = rows.select($"quartile").distinct().collect().map(_.getInt(0)).sorted
    assert(qs.toSeq === Seq(1, 2, 3, 4))
    assert(rows.agg(max($"cume")).collect().head.getDouble(0) === 1.0)
  }

  test("top bigrams come from the corpus and counts are descending") {
    val rows = run("q_top_bigrams").collect()
    assert(rows.length === 20)
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sorted.reverse))
    assert(rows.forall(_.getString(0).split(" ").length >= 2))
  }

  test("centroids: 64 dims per label, values inside observed range") {
    import spark.implicits._
    val rows = run("q_centroids").collect()
    val perLabel = rows.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(perLabel.values.forall(_ === 64))
    assert(rows.forall(r => math.abs(r.getDouble(2)) < 10.0))
  }

  test("approx_count_distinct lands within 5% of the exact cardinality") {
    import spark.implicits._
    val approx = run("q_approx_distinct").collect().head
    val exact = Tables.lineitem(spark, sf).agg(
      countDistinct($"l_partkey"), countDistinct($"l_orderkey"))
      .collect().head
    Seq(0, 1).foreach { i =>
      val (a, e) = (approx.getLong(i).toDouble, exact.getLong(i).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("approx percentiles land within the GK rank-error bound of exact") {
    // accuracy=10000 → rank error ≤ n/10000; at sf0.001 n per group is
    // far below 10000, so the sketch should be EXACT here. Allow one
    // interpolation step of slack: exact percentile interpolates
    // between order statistics, approx returns an actual data value.
    val exact = run("q_percentiles").collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = run("q_approx_percentiles").collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).zipWithIndex.foreach { case ((e, a), i) =>
        // l_quantity cols (0-2): unit-spaced domain → within 1.0;
        // median_price (3): prices are ~1000s apart → 1% relative.
        val tol = if (i < 3) 1.0 else 0.01 * e
        assert(math.abs(e - a) <= tol, s"$flag[$i]: exact $e vs approx $a")
      }
    }
  }

  test("approx_top_k counts equal exact counts when the tracker covers the vocab") {
    import spark.implicits._
    val sketch = run("q_approx_top_terms").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.documents(spark, sf)
      .select(explode(graft.functions.Text.tokens(lower($"text"))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.nonEmpty)
    // every sketched term's count must be the exact count (tracker
    // sized above this corpus's vocabulary → zero approximation here)
    sketch.foreach { case (t, c) =>
      assert(exact(t) === c, s"term '$t': sketch $c vs exact ${exact(t)}")
    }
    // and the sketch's minimum count must dominate every unreported
    // term (it really is a top-k set, not an arbitrary sample)
    val floor = sketch.values.min
    val unreported = exact.filterNot { case (t, _) => sketch.contains(t) }
    assert(unreported.values.forall(_ <= floor))
  }

  test("edit distance is 0 on identical prefixes and symmetric") {
    import spark.implicits._
    val df = Seq(("abc", "abc"), ("kitten", "sitting"), ("", "ab"))
      .toDF("a", "b")
      .select(levenshtein($"a", $"b").as("d"), levenshtein($"b", $"a").as("dr"))
      .collect()
    assert(df.map(_.getInt(0)).toSeq === Seq(0, 3, 2))
    assert(df.forall(r => r.getInt(0) === r.getInt(1)))
  }

  test("stratified sample is deterministic and respects strata") {
    import spark.implicits._
    val a = run("q_sample_stratified").collect().map(_.getLong(0)).toSeq
    val b = run("q_sample_stratified").collect().map(_.getLong(0)).toSeq
    assert(a === b, "hash-bucket sampling must be a pure function of the key")
    val byLang = run("q_sample_stratified").groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 0.5, others at 0.25 — allow generous Bernoulli noise
    val enFrac = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enFrac > 0.25 && enFrac < 0.75, s"en fraction $enFrac")
    val deFrac = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(deFrac > 0.05 && deFrac < 0.5, s"de fraction $deFrac")
  }

  test("stat.sampleBy (RNG Bernoulli surface) is seed-deterministic") {
    // The registered q_sample_stratified moved to hash-bucket sampling
    // (engine-portable, oracle-checked); Spark's own stratified
    // sampler stays covered here as API surface.
    import spark.implicits._
    def draw() = Tables.documents(spark, sf)
      .stat.sampleBy("lang", Map("en" -> 0.5, "de" -> 0.25), seed = 42L)
      .collect().map(_.getLong(0)).toSeq
    assert(draw() === draw(), "sampleBy with a fixed seed must be repeatable")
  }

  /** Driver-side whitespace tokenizer — the same char class the engine
    * and oracles pin (Text.Ws), reimplemented independently.
    */
  private def toksOf(text: String): Seq[String] =
    text.toLowerCase.split("[ \\t\\n\\x0B\\f\\r]+").filter(_.nonEmpty).toSeq

  test("q_entropy_filter: entropy matches a driver recompute; keep flag reads the rounded value") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("q_entropy_filter").collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val (id, nToks, nDistinct, ent, keep) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4))
      val tk = toksOf(texts(id))
      assert(nToks == tk.length, s"doc $id token count")
      assert(nDistinct == tk.distinct.length, s"doc $id distinct count")
      val expected = if (tk.isEmpty) 0.0 else {
        val n = tk.length.toDouble
        val cs = tk.groupBy(identity).values.map(_.size.toDouble)
        math.log(n) - cs.map(c => c * math.log(c)).sum / n
      }
      // Driver sum order differs from the engine's — one rounding ulp
      // of slack, not a reimplementation of round-half-up.
      assert(math.abs(ent - expected) < 1.5e-4, s"doc $id entropy $ent vs $expected")
      assert(keep == (ent >= functions.Curation.EntropyMin),
        s"doc $id keep flag disagrees with its own rounded entropy")
    }
  }

  test("q_pmi_bigrams: PMI matches a driver recompute over corpus counts") {
    import spark.implicits._
    // Engine tokenization for bigrams is on RAW text (the
    // q_top_bigrams convention) — mirror that, not toksOf's lowercase.
    val toks = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0).split("[ \\t\\n\\x0B\\f\\r]+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    val bi = toks.flatMap(tk => tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" })
      .groupBy(identity).map { case (g, xs) => g -> xs.size.toDouble }
    val (n, nb) = (uni.values.sum, bi.values.sum)
    val expected = bi.filter(_._2 >= functions.Text.PmiMinCount)
      .map { case (g, cab) =>
        val Array(t1, t2) = g.split(" ", 2)
        g -> math.log(cab * n * n / (nb * uni(t1) * uni(t2)))
      }
    val got = run("q_pmi_bigrams").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == functions.Text.PmiTopK)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse, "pmi not descending")
    got.foreach { case (g, cab, pmi) =>
      assert(bi(g) == cab.toDouble, s"bigram '$g' count")
      assert(math.abs(pmi - expected(g)) < 1.5e-4, s"bigram '$g' pmi $pmi vs ${expected(g)}")
    }
  }

  test("q_bigram_lm: nll matches a driver-trained add-1 bigram model") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> toksOf(r.getString(1)))
    val bcnt = toks.flatMap(_._2.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    val ucnt = toks.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val v = ucnt.size
    val expected = toks.map { case (id, tk) =>
      val bs = tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val s = if (bs.isEmpty) 0.0 else
        bs.map { g =>
          val ctx = g.split(" ", 2)(0)
          -math.log((bcnt(g) + 1).toDouble / (ucnt(ctx) + v).toDouble)
        }.sum / bs.length
      id -> (bs.length, s)
    }.toMap
    val got = run("q_bigram_lm").collect()
    assert(got.length == toks.length)
    got.foreach { r =>
      val (id, nBig, nll) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val (en, es) = expected(id)
      assert(nBig == en, s"doc $id bigram count $nBig vs $en")
      assert(math.abs(nll - es) < 1.5e-4, s"doc $id nll $nll vs $es")
    }
  }

  test("q_feature_hash: buckets and counts match a driver-side hashed vectorizer") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .flatMap { r =>
        toksOf(r.getString(1)).map { t =>
          (r.getLong(0), java.lang.Long.parseLong(md5hex(t).take(8), 16)
            % functions.Selection.FeatureBuckets)
        }
      }
      .groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.length.toLong) }
      .toSeq.sortBy { case (d, b, _) => (d, b) }
    val got = run("q_feature_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q_inverted_index: df and capped postings match a driver-built index") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> toksOf(r.getString(1)).distinct)
    val index = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) =>
        val ids = xs.map(_._2).sorted
        t -> (ids.length.toLong, ids.take(functions.Retrieval.PostingsCap).mkString(","))
      }
    val expected = index.toSeq
      .map { case (t, (df, ps)) => (t, df, ps) }
      .sortBy { case (t, df, _) => (-df, t) }
      .take(functions.Retrieval.IndexTerms)
    val got = run("q_inverted_index").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === expected)
    Storage.releaseAll(spark)
  }
}
