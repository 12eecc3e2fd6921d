package graft

import graft.functions.Retrieval
import org.apache.spark.sql.functions._

/** Property checks for the retrieval / curation operators beyond their
  * DuckDB oracles: the oracle replays the same formula, so these pin
  * the SEMANTIC claims — BM25 results actually contain query terms,
  * contamination hits actually share an n-gram, k-NN output is a
  * well-formed top-k, the mix respects its per-source weights.
  */
class RetrievalSpec extends SparkSpec {

  test("q_bm25: scores positive and descending; every hit contains a query term") {
    import spark.implicits._
    val rows = run("q_bm25").collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    val hitIds = rows.map(_.getLong(0)).toSet
    val withTerm = Tables.documents(spark, sf)
      .filter($"doc_id".isin(hitIds.toSeq: _*))
      .filter(Retrieval.QueryTerms
        .map(t => array_contains(functions.Text.tokens(lower($"text")), t))
        .reduce(_ || _))
      .count()
    assert(withTerm == hitIds.size,
      s"${hitIds.size - withTerm} BM25 hits contain no query term")
  }

  test("q_contamination: every flagged doc genuinely shares a 4-gram with the eval slice") {
    import spark.implicits._
    val flagged = run("q_contamination").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.nonEmpty, "contamination check found no overlap — fixture drift?")
    assert(flagged.keySet.forall(_ % Retrieval.EvalMod != 0),
      "an eval doc appeared in the train-side output")
    // Brute-force re-derivation on the driver (500 docs at spec scale).
    def grams(tokens: Array[String]): Set[String] =
      tokens.sliding(Retrieval.ContamN).filter(_.length == Retrieval.ContamN)
        .map(_.mkString(" ")).toSet
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", functions.Text.tokens($"text").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val evalGrams = toks.collect {
      case (id, tk) if id % Retrieval.EvalMod == 0 => grams(tk)
    }.foldLeft(Set.empty[String])(_ ++ _)
    val expected = toks.collect {
      case (id, tk) if id % Retrieval.EvalMod != 0 =>
        id -> (grams(tk) & evalGrams).size.toLong
    }.filter(_._2 > 0).toMap
    assert(flagged == expected)
  }

  test("contamination shuffle branch: forced past the broadcast threshold, same result, no broadcast join") {
    // The size switch's scale path: with the threshold at 0 the eval
    // grams must arrive via an exchange on the n-gram key (shuffled
    // hash join), never a broadcast — and the result must be
    // row-for-row what the broadcast branch (the default at this
    // scale, oracle-gated) computes.
    val shuffled = Retrieval.contamination(spark, sf, broadcastThresholdBytes = 0L)
    val p = shuffled.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    val viaShuffle = shuffled.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaBroadcast = run("q_contamination").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaShuffle === viaBroadcast)
  }

  test("q_knn_join: exactly k rows per query, descending sims, never the query itself") {
    val rows = run("q_knn_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3, s"query $q returned ${rs.length} rows")
      assert(rs.forall(_._2 != q), s"query $q matched itself")
      val sims = rs.sortBy(_._4).map(_._3)
      assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)),
        s"query $q sims not descending: ${sims.mkString(",")}")
    }
  }

  test("q_ann_ivf_pq: rerank returns a subset of the query's IVF cell, led by the query itself") {
    import spark.implicits._
    val rows = run("q_ann_ivf_pq").collect()
    assert(rows.length == 10)
    // The query vector scores sim=1 against itself and must survive
    // both the quantized scan and the exact rerank.
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(2) == 1.0)
    // Quantization error bound: the approximate score of the query
    // against itself is within 2% of its true squared norm.
    val qsimSelf = rows.head.getDouble(1)
    val trueNorm = run("q_array_dot").filter($"vec_id" === 0).collect().head.getDouble(1)
    assert(math.abs(qsimSelf - trueNorm) / trueNorm < 0.02,
      s"int8 self-score $qsimSelf vs true $trueNorm")
  }

  test("q_mix_weighted: weight-100 sources keep every doc; mix is deterministic") {
    import spark.implicits._
    val kept = run("q_mix_weighted").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val full = Tables.documents(spark, sf)
      .filter($"source".isin("src0", "src1", "src2", "src3", "src4"))
      .select($"doc_id", $"source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(full.subsetOf(kept), "a weight-100 doc was dropped")
    assert(kept.size > full.size, "no downweighted source contributed anything")
    val again = run("q_mix_weighted").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == kept, "mix not deterministic across runs")
  }

  test("q_repetition: kept flag equals the rounded-ratio threshold; a planted loop is caught") {
    import spark.implicits._
    val bad = run("q_repetition")
      .filter($"kept" =!= ($"dup_ratio" <= 0.2)).count()
    assert(bad == 0)
    // A doc that is one phrase repeated must score dup_ratio near 1.
    val loop = Seq((1L, Array.fill(20)("spark is fast").mkString(" ")))
      .toDF("doc_id", "text")
    val tk = functions.Text.tokens($"text")
    val tri = loop.select(
      size(tk).as("n"),
      size(array_distinct(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
          element_at(tk, i + 2))))).as("u"))
      .collect().head
    assert(tri.getInt(1).toDouble / (tri.getInt(0) - 2) < 0.1,
      "planted repetition not detected as duplicated trigrams")
  }

  test("q_zorder: the Morton code is a bijection — deinterleaving recovers both dims") {
    val rows = run("q_zorder").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (gx, gy, z) =>
      var (dx, dy) = (0L, 0L)
      (0 until 8).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == gx && dy == gy, s"z=$z deinterleaved to ($dx,$dy), expected ($gx,$gy)")
    }
  }

  test("q_merge_upsert: action counts match the batch construction") {
    import spark.implicits._
    val actions = run("q_merge_upsert").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val ids = Tables.documents(spark, sf).select($"doc_id")
      .collect().map(_.getLong(0))
    assert(actions.getOrElse("update", 0L) == ids.count(_ % 10 == 0))
    assert(actions.getOrElse("noop", 0L) == ids.count(i => i % 7 == 0 && i % 10 != 0))
    assert(actions.getOrElse("insert", 0L) == ids.count(_ % 50 == 0))
    assert(actions.values.sum ==
      ids.length + actions.getOrElse("insert", 0L),
      "output must cover every snapshot row plus the inserts")
  }

  test("q_shuffle_shard: positions are contiguous per shard and the permutation is stable") {
    import spark.implicits._
    val rows = run("q_shuffle_shard").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == total, "every doc must land in exactly one shard slot")
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val ps = rs.map(_._3).sorted
      assert(ps.toSeq == (1 to rs.length), s"shard $shard positions not contiguous")
    }
    val again = run("q_shuffle_shard").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSeq == rows.toSeq, "shuffle order not deterministic across runs")
  }

  test("q_sparse_cosine: scores in (0,1], descending, every hit shares a term with the query doc") {
    import spark.implicits._
    val hits = run("q_sparse_cosine").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.nonEmpty && !hits.exists(_._1 == 0L), "query doc must be excluded")
    assert(hits.forall { case (_, s) => s > 0.0 && s <= 1.0 },
      "tf-idf weights are positive, so cosines must land in (0,1]")
    assert(hits.map(_._2).toSeq == hits.map(_._2).sortBy(-_).toSeq)
    // Inverted-index property: a returned doc OVERLAPS the query doc's
    // vocabulary (docs sharing no term are never scored at all).
    val qTerms = Tables.documents(spark, sf).filter($"doc_id" === 0)
      .select(explode(functions.Text.tokens(lower($"text"))).as("t"))
      .collect().map(_.getString(0)).toSet
    val hitIds = hits.map(_._1).toSet
    val overlaps = Tables.documents(spark, sf)
      .filter($"doc_id".isin(hitIds.toSeq: _*))
      .select($"doc_id", explode(functions.Text.tokens(lower($"text"))).as("t"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.exists(r => qTerms(r.getString(1))) }
    assert(overlaps.values.forall(identity), "a hit shares no vocabulary with the query")
  }

  test("q_anomaly_zscore: all flagged events exceed the threshold against recomputed stats") {
    import spark.implicits._
    val flagged = run("q_anomaly_zscore").collect()
    assert(flagged.nonEmpty)
    assert(flagged.forall(r => math.abs(r.getDouble(3)) > 2.5))
    // Flag count should be a small tail, not the bulk of the stream.
    val total = Tables.events(spark, sf).count()
    assert(flagged.length < total / 10,
      s"${flagged.length} of $total events flagged — threshold not selective")
  }

  test("q_rrf_fusion equals a driver-side fusion of the two rankers' score lists") {
    import spark.implicits._
    val bm = graft.Pins.scoped(_ => Retrieval.bm25Scored(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val cos = graft.Pins.scoped(_ => Retrieval.sparseCosineScored(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    def ranks(scored: Array[(Long, Double)]): Map[Long, Int] =
      scored.sortBy { case (id, s) => (-s, id) }.take(Retrieval.RrfDepth)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val (ra, rb) = (ranks(bm), ranks(cos))
    val fused = (ra.keySet ++ rb.keySet).toSeq.map { id =>
      val rrf = BigDecimal(
        ra.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0)
          + rb.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ra.getOrElse(id, 0), rb.getOrElse(id, 0), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(Retrieval.RrfTopK)
    val got = run("q_rrf_fusion").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got === fused)
    // A doc in BOTH top lists must outrank one at the same single-list
    // position alone — the fusion property the operator exists for.
    val both = got.filter(t => t._2 > 0 && t._3 > 0)
    assert(both.nonEmpty, "no doc appears in both rankers' top lists")
  }

  test("q_rank_overlap equals a driver-side comparison of the two rank lists") {
    val bm = graft.Pins.scoped(_ => Retrieval.bm25Scored(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val cos = graft.Pins.scoped(_ => Retrieval.sparseCosineScored(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    def ranks(scored: Array[(Long, Double)]): Map[Long, Int] =
      scored.sortBy { case (id, s) => (-s, id) }.take(Retrieval.RrfDepth)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val (ra, rb) = (ranks(bm), ranks(cos))
    val got = run("q_rank_overlap").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === Retrieval.OverlapDepths)
    got.foreach { case (depth, nBm, nCos, nCommon, jac) =>
      val a = ra.filter(_._2 <= depth).keySet
      val b = rb.filter(_._2 <= depth).keySet
      assert(nBm === a.size.toLong && nCos === b.size.toLong, s"depth $depth sizes")
      assert(nCommon === (a & b).size.toLong, s"depth $depth common")
      assert(jac === BigDecimal((a & b).size.toDouble / (a | b).size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"depth $depth jaccard")
    }
    // Counts are monotone in depth (list prefixes nest).
    assert(got.sliding(2).forall(p => p(0)._4 <= p(1)._4), "common not monotone")
  }

  test("rank_overlap absence encoding: a doc in one top-10 but both top-50s flips membership with depth") {
    // The trickiest encoding in the report: absence from a list is
    // rank Int.MaxValue, so `rank <= depth` is the membership test at
    // EVERY depth. Constructed fixture: doc 1 is rank 5 in ranker B
    // but rank 30 in ranker A — inside both top-50s, inside only B's
    // top-10 — so it must flip from non-common at depth 10 to common
    // at depth 50. Doc 2 appears ONLY in ranker A (rank 3): common at
    // no depth, counted in n_bm25 at every depth. Driven through the
    // SAME overlapReport the registered query runs.
    import spark.implicits._
    // Ranker A: docs 100..129 at ranks 1..30 except doc 1 at rank 30
    // and doc 2 at rank 3; ranker B: doc 1 at rank 5 plus filler.
    val ra = (Seq((2L, 3), (1L, 30)) ++
      (1 to 28).map(i => (100L + i, if (i >= 3) i + 1 else i))).toDF("doc_id", "ra")
    val rb = (Seq((1L, 5)) ++ (1 to 11).map(i => (200L + i, if (i >= 5) i + 1 else i)))
      .toDF("doc_id", "rb")
    val got = Retrieval.overlapReport(ra, rb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n10, n50) = (got(10), got(50))
    // Depth 10: doc 1 is only in B's prefix — zero common docs.
    assert(n10._3 === 0L, s"doc 1 must NOT be common at depth 10: $n10")
    assert(n10._1 === 10L && n10._2 === 10L, s"both prefixes full at 10: $n10")
    // Depth 50: doc 1 is inside both lists — exactly one common doc.
    assert(n50._3 === 1L, s"doc 1 must be common at depth 50: $n50")
    // Doc 2 (A-only, rank 3) and B-only docs never inflate common.
    assert(n50._1 === 30L && n50._2 === 12L, s"full list sizes at 50: $n50")
  }
}
