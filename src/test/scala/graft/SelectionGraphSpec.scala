package graft

import graft.functions.{Graph, Selection, Vectors}
import org.apache.spark.sql.functions._

/** Semantic pins for the selection/graph operators — the properties
  * the DuckDB hash-match can't express:
  *
  *   - q_semantic_dedup: the kept set is τ-separated within every
  *     cell (the SemDeDup guarantee: any over-threshold pair loses
  *     its higher-priority member), and every drop has a same-cell
  *     witness — checked against an independent brute-force pass.
  *   - q_weighted_sample: the pick multiset is exactly what an
  *     independent single-threaded prefix-sum scan selects, and total
  *     multiplicity equals total div step (the systematic-sampling
  *     identity).
  *   - q_dsir_select: the score discriminates — the target slice
  *     (lang='en') scores strictly higher on average than the rest.
  *   - q_pagerank: fixed-point mass conservation (truncation-bounded)
  *     on the real graph, and exact structural symmetry on a
  *     hand-built path graph.
  */
class SelectionGraphSpec extends SparkSpec {

  test("q_semantic_dedup: kept set is τ-separated within cells; every drop has a higher-priority witness") {
    import spark.implicits._
    val out = run("q_semantic_dedup").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(out.exists(_._4 == 0), "threshold selects nothing — dead branch")
    assert(out.count(_._4 == 1) > out.length / 2, "most of the corpus should survive")

    // Independent brute-force cosine over the raw embeddings.
    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // The contract is the CAPPED rule (Vectors.CellPoolCap): only the
    // first-cap pool under the priority order can drop. At this SF the
    // pool is the whole cell (CellPoolSpec asserts occupancy ≤ cap),
    // so the checks reduce to the uncapped SemDeDup guarantee.
    val byCell = out.groupBy(_._2)
    byCell.values.foreach { members =>
      val pool = members.sortBy(m => (m._3, m._1))
        .take(Vectors.CellPoolCap).map(_._1).toSet
      val kept = members.filter(_._4 == 1)
      for (x <- kept; y <- kept if x._1 < y._1) {
        val hi = if (y._3 < x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
        if (pool contains hi._1)
          assert(r4(cos(vecs(x._1), vecs(y._1))) < Vectors.SemDedupTau,
            s"kept pair ${x._1},${y._1} violates τ-separation (in-pool dropper)")
      }
      for (d <- members.filter(_._4 == 0)) {
        val witness = members.exists(y => y._1 != d._1 &&
          (pool contains y._1) &&
          (y._3 < d._3 || (y._3 == d._3 && y._1 < d._1)) &&
          r4(cos(vecs(d._1), vecs(y._1))) >= Vectors.SemDedupTau)
        assert(witness, s"dropped ${d._1} has no higher-priority in-pool witness")
      }
    }
  }

  test("q_weighted_sample: matches an independent sequential prefix-sum scan; Σmultiplicity = total div step") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = docs.map(_._2).sum
    val step = math.max(total / Selection.SampleK, 1L)
    var cum = 0L
    val expected = docs.flatMap { case (id, w) =>
      val m = (cum + w) / step - cum / step
      cum += w
      if (m > 0) Some((id, w, cum - w, m.toInt)) else None
    }
    val got = run("q_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == expected.toSeq,
      "distributed prefix-sum pick set differs from the sequential scan")
    assert(got.map(_._4.toLong).sum == total / step)
  }

  test("exclusiveOffsets recursion (subtotals > PrefixBucket) matches a sequential scan") {
    import spark.implicits._
    // 300 buckets > PrefixBucket=64 forces one recursion level (super
    // table of 5 rows); sparse, unsorted, with gaps and zero values so
    // the per-super window and the bucket ordering both get exercised.
    val rows = (0L until 300L).map(b => (b * 7 % 300, b % 13))
      .filterNot { case (b, _) => b % 11 == 3 }
    val seq = rows.sortBy(_._1)
    var cum = 0L
    val expected = seq.map { case (b, v) => val off = cum; cum += v; b -> off }.toMap
    val got = Selection.exclusiveOffsets(rows.toDF("bkt", "v"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected, "recursive offsets differ from the sequential scan")
    spark.catalog.clearCache()
  }

  test("exclusiveOffsets: terminal and recursive shapes agree across the PrefixBucket boundary") {
    import spark.implicits._
    // n = PrefixBucket runs the terminal window; n = PrefixBucket+1
    // recurses — both must produce the same exclusive prefix law.
    Seq(Selection.PrefixBucket, Selection.PrefixBucket + 1).foreach { n =>
      val rows = (0L until n.toLong).map(b => (b, b + 1))
      val got = Selection.exclusiveOffsets(rows.toDF("bkt", "v"), "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (b, _) =>
        assert(got(b) === b * (b + 1) / 2, s"n=$n bkt=$b")
      }
      spark.catalog.clearCache()
    }
  }

  test("q_global_index: idx is dense 1..n in doc_id order") {
    val rows = run("q_global_index").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq,
      "indices must be dense 1..n in the returned (doc_id) order")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("q_dsir_select: the target slice scores strictly higher than the rest on average") {
    val rows = run("q_dsir_select")
      .groupBy(expr("lang = 'en'").as("is_target"))
      .agg(avg("dsir_score").as("s")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rows(true) > rows(false),
      s"DSIR must up-score target-like data: target=${rows(true)} rest=${rows(false)}")
  }

  test("q_pagerank: mass conserved within truncation bounds on the trade graph") {
    val edges = Graph.tradeEdges(spark, sf)
    val full = Graph.pagerank(edges)
    val total = full.agg(sum("rank")).collect()(0).getLong(0)
    // Each round loses <1 unit per in-edge (rank div outdeg) plus <2
    // per node (the two div-100 blends) — bounded, never gained.
    val nEdges = edges.count(); val nNodes = full.count()
    val bound = Graph.Rounds * (nEdges + 2 * nNodes) + nNodes
    assert(total <= Graph.RankScale)
    assert(total >= Graph.RankScale - bound,
      s"lost more than truncation can explain: $total vs ${Graph.RankScale}")
  }

  test("q_pagerank: path-graph symmetry — ends tie, middle dominates") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val r = Graph.pagerank(edges).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == r("c"), "symmetric ends must tie exactly (integer arithmetic)")
    assert(r("b") > r("a"), "the 2-degree middle must outrank the ends")
  }

  test("pagerank: shuffle-join fallback is rank-for-rank identical to the broadcast path") {
    val edges = Graph.tradeEdges(spark, sf)
    val viaBroadcast = Graph.pagerank(edges, broadcastRanks = Some(true))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val viaShuffle = Graph.pagerank(edges, broadcastRanks = Some(false))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaShuffle === viaBroadcast,
      "join strategy must never change the fixed-point arithmetic")
    Storage.releaseAll(spark)
  }

  test("pagerank: Reliable checkpoint strategy matches Local rank-for-rank") {
    // The 100 TB configuration: the final rank table truncates into
    // the configured checkpoint dir instead of executor-local blocks,
    // and the pin lifecycle must behave identically (DedupScaleSpec
    // pins the same property for connectedComponents).
    val ckDir = Scratch.dir("pagerank_reliable_ck")
    spark.sparkContext.setCheckpointDir(ckDir)
    val edges = Graph.tradeEdges(spark, sf)
    val local = Graph.pagerank(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Storage.releaseAll(spark)
    val reliable = Graph.pagerank(Graph.tradeEdges(spark, sf),
        strategy = graft.functions.CheckpointStrategy.Reliable)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reliable === local,
      "checkpoint strategy must never change the fixed-point arithmetic")
    Storage.releaseAll(spark)
  }

  test("pagerank: dangling node is ranked and its mass redistributed, not lost") {
    import spark.implicits._
    // a -> b with no out-edge from b: b holds mass that a pure
    // contribution pass would drop. Hand arithmetic at RankScale=1e12:
    // round 1 shares b's 5e11 equally (dshare 2.5e11), so
    // a = 75e9 + 85*(2.5e11) div 100 and b = 75e9 + 85*(7.5e11) div 100.
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pagerank(edges).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set("a", "b"), "dangling dst must still be ranked")
    assert(r("b") > r("a"), "the sink accumulates more than the source")
    val total = r.values.sum
    val bound = Graph.Rounds * (1 + 3 * 2) + 2
    assert(total <= Graph.RankScale && total >= Graph.RankScale - bound,
      s"dangling mass lost: $total vs ${Graph.RankScale}")
    Storage.releaseAll(spark)
  }

  /** Independent driver-side brute force of the capped-basket pair
    * counts — the common input of q_copurchase and q_triangle_count.
    */
  private def bruteForcePairs(): Map[(Long, Long), Long] = {
    import spark.implicits._
    val baskets = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    baskets.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val capped = rows.map(_._2).distinct.sorted.take(Graph.MaxBasket)
      for (i <- capped.indices; j <- i + 1 until capped.length)
        yield (capped(i), capped(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
  }

  test("q_copurchase: top pairs equal a driver-side brute force over capped baskets") {
    val expected = bruteForcePairs().toSeq
      .map { case ((s1, s2), n) => (s1, s2, n) }
      .sortBy { case (s1, s2, n) => (-n, s1, s2) }
      .take(Graph.CopurchaseTopK)
    val got = run("q_copurchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    Storage.releaseAll(spark)
  }

  test("q_triangle_count: per-node counts equal brute-force triangle enumeration") {
    // toSeq first: .collect on a Map yielding pairs would rebuild a
    // Map and collapse every a's edges to one entry.
    val edges = bruteForcePairs().toSeq.collect {
      case ((a, b), n) if n >= Graph.MinSupport => (a, b)
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triangles = for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } yield (a, b, c)
    val perNode = triangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }.toSeq
      .sortBy { case (n, c) => (-c, n) }.take(Graph.TriangleTopK)
    val got = run("q_triangle_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(triangles.nonEmpty, "fixture must actually contain triangles")
    assert(got === perNode)
    Storage.releaseAll(spark)
  }

  test("triangle counting: degree-ordered orientation matches id orientation at two SFs") {
    // The arboricity-bounded variant (round-11 verdict item 4): edges
    // re-oriented from the lower-(degree, id) endpoint pivot every
    // wedge on its lowest-degree vertex, so hub wedge work collapses
    // from O(deg(hub)²) to O(arboricity²) per node — but the triangle
    // MULTISET, and hence every per-node count, must be exactly the
    // id-oriented result. Both SFs: the smoke fixture plus the 10×
    // graph, where the degree distribution actually differs.
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val id = Graph.triangleCounts(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      Storage.releaseAll(spark)
      val byDeg = Graph.triangleCounts(spark, dir, byDegree = true).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      Storage.releaseAll(spark)
      assert(id.nonEmpty, s"fixture $dir must contain triangles")
      assert(byDeg === id, s"orientation parity broken at $dir")
    }
  }

  test("q_degree_dist histogram equals brute-force degrees; ccdf anchors at 1 and decreases") {
    val edges = bruteForcePairs().toSeq.collect {
      case ((a, b), n) if n >= Graph.MinSupport => (a, b)
    }
    val degrees = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map(_._2.size)
    val expect = degrees.groupBy(identity)
      .map { case (d, xs) => d.toLong -> xs.size.toLong }
    val rows = run("q_degree_dist").collect()
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === degrees.size.toLong)
    val ccdfs = rows.sortBy(_.getLong(0)).map(_.getAs[Double]("ccdf"))
    assert(math.abs(ccdfs.head - 1.0) < 1e-9,
      "ccdf at the minimum degree must cover every node")
    assert(ccdfs.zip(ccdfs.tail).forall { case (a, b) => b <= a + 1e-9 },
      "ccdf must be non-increasing in degree")
    Storage.releaseAll(spark)
  }

  test("q_link_predict: jaccard equals intersection over union of capped neighborhoods") {
    import spark.implicits._
    val pairs = bruteForcePairs()
    // Independent degree recompute — the same capped baskets, counted
    // per supplier.
    val deg = {
      val baskets = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey", $"l_suppkey").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      baskets.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.map(_._2).distinct.sorted.take(Graph.MaxBasket)
      }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    }
    val expected = pairs.toSeq.collect {
      case ((a, b), n) if n >= Graph.MinSupport =>
        val j = n.toDouble / (deg(a) + deg(b) - n).toDouble
        (a, b, n, BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (a, b, _, j) => (-j, a, b) }.take(Graph.LinkTopK)
    val got = run("q_link_predict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    Storage.releaseAll(spark)
  }

  test("q_priority_sample: exact bottom-K of the fixed-point priority keys") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = Tables.documents(spark, sf).select($"doc_id", $"n_chars").collect()
      .map { r =>
        val (id, w) = (r.getLong(0), math.max(r.getLong(1), 1L))
        val h = java.lang.Long.parseLong(md5hex(s"ps$id").take(7), 16)
        (id, w, (h * Selection.PriorityScale) / w)
      }
    val expected = all.sortBy { case (id, _, k) => (k, id) }
      .take(Selection.PriorityK).toSeq
    val got = run("q_priority_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q_label_prop: deterministic snapshot, multiple communities, members account for every connectable node") {
    import spark.implicits._
    val r1 = run("q_label_prop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Storage.releaseAll(spark)
    val r2 = run("q_label_prop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Storage.releaseAll(spark)
    // Sync LPA is a fixed-budget snapshot (convergence NOT guaranteed
    // — see LpaRounds), so the contract is determinism: identical
    // runs, identical results.
    assert(r1 === r2, "LPA snapshot must be a pure function of the data")
    assert(r1.length > 1, "kNN-cell graph must yield multiple communities")
    r1.foreach { case (_, n, _) => assert(n >= 1) }
    // Node accounting: the graph's nodes are exactly the vectors with
    // ≥1 same-cell neighbor; when the report is not truncated by the
    // top-K, community sizes must sum to that count.
    val cellSizes = functions.Vectors.ivfAssigned(
        Tables.embeddings(spark, sf)
          .select($"vec_id", functions.Vectors.asDouble($"embedding").as("v")))
      .groupBy($"cell").count().collect().map(_.getLong(1))
    val connectable = cellSizes.filter(_ >= 2).sum
    if (r1.length < functions.Graph.LpaTopK)
      assert(r1.map(_._2).sum === connectable,
        "every node in a ≥2-occupant cell must land in exactly one community")
  }

  test("kcore: checkpoint composition is semantics-free — 1, 2, and 6 rounds per barrier agree row-for-row") {
    // The r13 barrier diet composes peel rounds between checkpoint
    // truncations. The peel is a pure function of the previous
    // survivor set, so composition can only change WHERE the plan is
    // materialized, never what it computes — pinned here as a
    // property (row-identical results across barrier frequencies, the
    // per-round shape, the committed 2, and the no-intermediate-
    // barrier extreme) instead of asserted in the comment that calls
    // the frequency "a knob, not a semantic".
    def rows(rpc: Int): Seq[(Long, Long)] = {
      val r = functions.Graph.kcore(spark, sf, roundsPerCheckpoint = rpc)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      Storage.releaseAll(spark)
      r
    }
    val perRound = rows(1)
    assert(perRound.nonEmpty)
    assert(rows(2) === perRound, "2-per-barrier diverged from per-round peeling")
    assert(rows(graft.functions.Graph.KcoreRounds) === perRound,
      "fully-composed (single-barrier) peel diverged from per-round peeling")
  }

  test("q_kcore matches a driver-side peel-to-fixpoint (fixed rounds reach it)") {
    import spark.implicits._
    // Rebuild the thresholded co-purchase edge set the query peels.
    val b = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("sk")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c").orderBy($"sk")
    val capped = b.withColumn("rn", row_number().over(w))
      .filter($"rn" <= functions.Graph.MaxBasket).select($"c", $"sk")
    val pairs = capped.select($"c", $"sk".as("s1"))
      .join(capped.select($"c", $"sk".as("s2")), Seq("c"))
      .filter($"s1" < $"s2")
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("sup"))
      .filter($"sup" >= functions.Graph.MinSupport)
      .select($"s1", $"s2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Peel to the TRUE fixpoint on the driver (however many rounds).
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= functions.Graph.KcoreK).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val expect = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val got = run("q_kcore").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // The fixed KcoreRounds must have REACHED the fixpoint on this
    // fixture — equality, not containment.
    assert(got === expect,
      s"core mismatch: only-engine=${got.keySet -- expect.keySet} " +
        s"only-fixpoint=${expect.keySet -- got.keySet}")
    got.values.foreach(d => assert(d >= functions.Graph.KcoreK))
  }

  test("kcoreFrom: the warm-path miniature (K10) peels to the full 9-core") {
    // GraftSession.warm runs kcoreFrom over exactly this complete
    // graph to pay the fresh-JVM analysis/JIT floor outside the timed
    // window (r21). Pin here that the miniature is a NON-degenerate
    // pass through the whole chain: every node survives (degree
    // 9 ≥ KcoreK = 8), the assert_true report fires no error, and the
    // result is the full core — so the warm run exercises the same
    // report path a real invocation does, rows included.
    import spark.implicits._
    val k10 = (for { a <- 1 to 10; b <- 1 to 10 if a < b }
      yield (s"n$a", s"n$b")).toDF("s1", "s2")
    val got = functions.Graph.kcoreFrom(spark, k10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Storage.releaseAll(spark)
    assert(got.keySet === (1 to 10).map(i => s"n$i").toSet)
    assert(got.values.forall(_ === 9L),
      s"K10 core degrees must all be 9, got $got")
  }
}
