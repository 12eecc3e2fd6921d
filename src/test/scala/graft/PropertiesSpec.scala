package graft

import graft.functions.{Text, Vectors}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY §5.3). scalatestplus is
  * not in the offline cache, so sampling is driven manually from `Gen`
  * with a fixed seed — deterministic and framework-free.
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val sentence = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("prop: fingerprint invariant under case/whitespace noise; token count >= 1") {
    import spark.implicits._
    val texts = samples(sentence, 40)
    val noisy = texts.map(t => t.toUpperCase.replace(" ", "   "))
    val df = texts.zip(noisy).toDF("clean", "noisy")
    df.select(
      Text.fingerprint($"clean").as("f1"),
      Text.fingerprint($"noisy").as("f2"),
      Text.tokenCount($"clean").as("n")).collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getInt(2) >= 1)
    }
  }

  test("prop: cosine is symmetric, bounded, 1 on itself") {
    import spark.implicits._
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)).suchThat(_.exists(_ != 0.0))
    val pairs = samples(Gen.zip(vec, vec), 30)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val df = pairs.toDF("a", "b")
    df.select(
      Vectors.cosine($"a", $"b").as("ab"),
      Vectors.cosine($"b", $"a").as("ba"),
      Vectors.cosine($"a", $"a").as("aa")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("prop: top-K of group counts is a prefix of the full sorted counts") {
    import spark.implicits._
    val full = Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }
    val topk = run("q_filter_topk_count").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(topk.toSeq === full.take(5).toSeq)
  }

  test("prop: na.fill is idempotent") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (null, "x"), (null, null))
      .toDF("a", "b")
    val once = df.na.fill(Map("a" -> 0L, "b" -> "none"))
    val twice = once.na.fill(Map("a" -> 0L, "b" -> "none"))
    assert(once.collect().toSeq === twice.collect().toSeq)
  }

  test("prop: binned range join equals BNLJ result for any bin width") {
    import graft.operators.Joins
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val buckets = Seq((1, 1, 10), (2, 11, 20), (3, 21, 35), (4, 36, 50))
      .toDF("b_id", "lo", "hi")
    val expected = Tables.part(spark, sf)
      .join(broadcast(buckets), $"p_size".between($"lo", $"hi"))
      .select($"p_partkey", $"b_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    samples(Gen.chooseNum(1, 64), 6).foreach { w =>
      val got = Joins.binnedRangeJoin(
        Tables.part(spark, sf), $"p_size", buckets, $"lo", $"hi", binWidth = w)
        .select($"p_partkey", $"b_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got === expected, s"binWidth=$w")
    }
  }

  test("prop: asofJoin matches a per-row max-subquery on random event data") {
    import graft.operators.Joins
    import spark.implicits._
    val g = for {
      k <- Gen.chooseNum(1L, 4L)
      t <- Gen.chooseNum(0L, 100L)
    } yield (k, t)
    val probes = samples(g, 40).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val builds = samples(g, 40).map { case (k, t) => (k, t, t * 1000 + k) }
    val probeDf = probes.toDF("event_id", "k", "t")
    val buildDf = builds.toDF("k", "t", "payload")
    val got = Joins.asofJoin(probeDf, buildDf, "k", "t", "payload")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString.toLong)).toMap
    val expected = probes.map { case (id, k, t) =>
      val cands = builds.filter(b => b._1 == k && b._2 <= t)
      id -> (if (cands.isEmpty) None else Some(cands.map(_._3).max))
    }.toMap
    assert(got === expected)
  }

  test("prop: PrefixScan equals a driver-side per-group exclusive prefix walk on random tables") {
    import graft.operators.PrefixScan
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Random (group, key, weight) rows — few groups (the shape the
    // chunked scan exists for), zero weights included, one row per
    // (group, key) so the sort is a total order.
    val g = for {
      grp <- Gen.chooseNum(0, 3)
      key <- Gen.chooseNum(0L, 1000000L)
      w <- Gen.chooseNum(0L, 50L)
    } yield (s"g$grp", key, w)
    val rows = samples(g, 200)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = PrefixScan.scan(rows.toDF("grp", "key", "w"),
        Seq("grp"), Seq(col("key").asc), col("w"))
      .select("grp", "key", "cum_before", "grp_total")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
      val ordered = rs.sortBy(_._2)
      val total = rs.map(_._3).sum
      ordered.scanLeft(0L)(_ + _._3).zip(ordered).map {
        case (cum, (grp, k, _)) => (grp, k) -> (cum, total)
      }
    }
    assert(got === expected)
  }

  test("prop: union count additivity over random splits") {
    import spark.implicits._
    val o = Tables.orders(spark, sf)
    samples(Gen.chooseNum(1000.0, 400000.0), 5).foreach { thr =>
      val lo = o.filter($"o_totalprice" <= thr)
      val hi = o.filter($"o_totalprice" > thr)
      assert(lo.unionByName(hi).count() === o.count())
    }
  }

  test("prop: bpe merge training matches a driver-side reference walk on random corpora") {
    import spark.implicits._
    // A 3-letter alphabet forces dense pair collisions, so later
    // rounds routinely adopt pairs with a MERGED (multi-char) side —
    // the feedback path the fixed corpus fixture can't reach — and
    // single-char-word corpora exercise the pairless-round edge
    // (training goes quiet without emptying the result).
    def refBpe(wf: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Map[Vector[String], Long] =
        wf.map { case (w, f) => w.map(_.toString).toVector -> f }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      for (step <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (s, f) =>
          s.indices.dropRight(1).foreach { i =>
            counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f }
        }
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.toSeq.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
          out += ((step, l, r, c))
          vocab = vocab.groupMapReduce { case (s, _) =>
            val b = Vector.newBuilder[String]; var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
              else { b += s(i); i += 1 }
            }
            b.result()
          }(_._2)(_ + _)
        }
      }
      out.result()
    }
    val word3 = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, word3).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(3, 15).flatMap(n => Gen.listOfN(n, doc))
    var sawMergedSide = false
    samples(corpus, 4).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.functions.Text.bpeMerges(df, rounds = 4).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wf = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      assert(got === refBpe(wf, 4), s"corpus: $docs")
      sawMergedSide ||= got.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 }
      // releaseAll, not clearCache: bpeMerges leaves its truncated
      // merge table as checkpoint blocks the cache manager can't see
      Storage.releaseAll(spark)
    }
    assert(sawMergedSide,
      "no sample ever merged a merged symbol - the generator stopped covering the feedback path")
  }

  test("prop: bpe encode replays the learned merges exactly (driver-walk parity on random corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Same 3-letter generator as the training sweep: merged-side
    // merges, repeated symbols (the leftmost-greedy trap), and words
    // no learned pair touches. The driver walk replays the GOT merge
    // table in step order with the same scan-based greedy merge the
    // training reference uses.
    def encodeWord(w: String, merges: Seq[(String, String)]): Int = {
      var s: Vector[String] = w.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]; var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
          else { b += s(i); i += 1 }
        }
        s = b.result()
      }
      s.length
    }
    val word3 = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, word3).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(3, 15).flatMap(n => Gen.listOfN(n, doc))
    samples(corpus, 3).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val merges = graft.functions.Text.bpeMerges(df, rounds = 4)
      val learned = merges.collect().sortBy(_.getInt(0))
        .map(r => r.getString(1) -> r.getString(2)).toSeq
      val wsyms = df.select(explode(graft.functions.Text.tokens(lower($"text"))).as("w"))
        .distinct()
        .select($"w", concat(lit(" "), array_join(split($"w", ""), "  "), lit(" ")).as("syms"))
      val got = graft.functions.Text.bpeApply(wsyms, merges, rounds = 4)
        .select($"w", size(split(trim($"syms"), "  ")).as("n"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      got.foreach { case (w, n) =>
        assert(n === encodeWord(w, learned), s"word '$w' under $learned; corpus: $docs")
      }
      Storage.releaseAll(spark)
    }
  }

  test("prop: fixed-point pagerank conserves mass within truncation bounds on random DIRECTED graphs") {
    import spark.implicits._
    import graft.functions.Graph
    // Random DIRECTED graphs of varying shape — multi-component ones,
    // and ones with DANGLING nodes (a dst that never appears as src),
    // where conservation additionally exercises the per-round
    // redistribution of dangling mass.
    val graphGen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 120)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (s"n$a", s"n$b"))
      if pairs.nonEmpty
    } yield pairs.distinct
    samples(graphGen, 6).foreach { pairs =>
      val edges = pairs.toDF("src", "dst")
      val ranks = Graph.pagerank(edges).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val nodes = edges.select($"src").union(edges.select($"dst"))
        .distinct().count()
      assert(ranks.length == nodes, "pagerank must rank every node exactly once")
      assert(ranks.forall(_._2 > 0), "every rank keeps a positive damping floor")
      val total = ranks.map(_._2).sum
      val nEdges = edges.count()
      // Truncation per round: <1 unit per in-edge (rank div outdeg),
      // <2 per node (the div-100 blends), <1 per node for the dangling
      // share (D div n); plus the initial RankScale div n remainder.
      val bound = Graph.Rounds * (nEdges + 3 * nodes) + nodes
      assert(total <= Graph.RankScale, s"mass created: $total")
      assert(total >= Graph.RankScale - bound,
        s"mass lost beyond truncation: $total vs ${Graph.RankScale} (bound $bound)")
      // releaseAll: each pagerank call leaves one truncated rank table
      Storage.releaseAll(spark)
    }
  }
}
