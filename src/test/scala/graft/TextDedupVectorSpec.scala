package graft

import graft.functions.{Dedup, Text, Vectors}
import org.apache.spark.sql.functions._

class TextDedupVectorSpec extends SparkSpec {

  test("fingerprint is invariant under case and whitespace noise") {
    import spark.implicits._
    val df = Seq(
      ("a", "Hello  World foo"),
      ("b", "hello world   foo"),
      ("c", "entirely different")).toDF("id", "text")
    val fps = df.select($"id", Text.fingerprint($"text").as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") === fps("b"))
    assert(fps("a") !== fps("c"))
  }

  test("token and stopword counts on known sentence") {
    import spark.implicits._
    val df = Seq("the cat sat on the mat").toDF("text")
    val r = df.select(
      Text.tokenCount($"text").as("n"),
      Text.stopwordCount($"text").as("s")).collect().head
    assert(r.getInt(0) === 6)
    assert(r.getInt(1) === 3) // the, on, the
  }

  test("subword count splits at punctuation and digit boundaries") {
    import spark.implicits._
    // "ab12 cd, ef.3" → ab | 1 | 2 | cd | ef | 3 (every digit starts a
    // new subword; punctuation runs separate like whitespace).
    val n = Seq("ab12 cd, ef.3").toDF("text")
      .select(Text.subwordCount($"text")).collect().head.getInt(0)
    assert(n == 6)
  }

  test("quality score stays in [0,1]") {
    val qs = run("q_quality_score").collect().map(_.getDouble(1))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("identical texts get identical minhash signatures; est_jaccard detects a planted dup") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("simhash of identical texts matches; disjoint texts differ") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark scala data"), (2L, "spark scala data"), (3L, "totally other words here"))
      .toDF("doc_id", "text")
    val hs = df.select($"doc_id", Dedup.simhash48($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) === hs(2L))
    assert(hs(1L) !== hs(3L))
  }

  test("cosine(v, v) == 1 and dot matches hand computation") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      Vectors.dot($"a", $"b").as("d"),
      Vectors.cosine($"a", $"a").as("c")).collect().head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("brute-force cosine top-k: query vector ranks itself first with sim 1") {
    val top = run("q_cosine_topk").collect()
    assert(top.head.getLong(0) === 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("LSH ANN results are a subset of brute-force candidates by construction") {
    val ann = run("q_ann_lsh").collect()
    assert(ann.head.getLong(0) === 0L) // query's own bucket contains it
    assert(ann.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("exact dedup keeps one keeper per distinct fingerprint") {
    val rows = run("q_dedup_exact").collect()
    val keepers = rows.map(_.getLong(0))
    assert(keepers.distinct.length === keepers.length)
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
  }

  test("q_bpe_pairs matches an independent in-memory pair count") {
    import spark.implicits._
    // Recount from scratch with plain Scala string ops — no Spark
    // expressions shared with the query under test.
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select($"text").collect().foreach { r =>
      r.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { w =>
        // Pair CODE POINTS, not UTF-16 units: the query's Column.substr
        // slices by code point, and String.sliding(2) would split a
        // supplementary-plane character (emoji) into surrogate halves.
        val cps = w.codePoints.toArray
        cps.indices.dropRight(1).foreach { i =>
          val p = new String(cps, i, 2)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
    val got = run("q_bpe_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q_bpe_merges matches an independent driver-side merge walk") {
    import spark.implicits._
    // Full BPE reference in plain Scala — no Spark expressions shared
    // with the query under test. Symbols are code points (see the
    // q_bpe_pairs recount for why), the merge is leftmost-greedy
    // non-overlapping, argmax tiebreak (cnt desc, left asc, right asc).
    def refMerges(wordFreq: Map[String, Long],
                  rounds: Int): Seq[(Int, String, String, Long)] = {
      def cps(w: String): Vector[String] =
        w.codePoints.toArray.map(cp => new String(Character.toChars(cp))).toVector
      var vocab: Map[Vector[String], Long] =
        wordFreq.map { case (w, f) => cps(w) -> f }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      for (step <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.indices.dropRight(1).foreach { i =>
            val k = (syms(i), syms(i + 1))
            counts(k) = counts.getOrElse(k, 0L) + f
          }
        }
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.toSeq.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
          out += ((step, l, r, c))
          vocab = vocab.map { case (syms, f) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result() -> f
          }
        }
      }
      out.result()
    }
    // Corpus word freqs (tokenization itself is pinned by the
    // q_bpe_pairs recount above — here the subject is the merge LOOP).
    val wf = Tables.documents(spark, sf).select($"text").collect()
      .flatMap(r => r.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val expected = refMerges(wf, functions.Text.BpeRounds)
    val got = run("q_bpe_merges").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expected)
    // (The rewrite-feeds-back property — a later round consuming a
    // MERGED symbol — is pinned by the classic fixture below; this
    // corpus's top-6 pairs happen to all be fresh single-char pairs.)
  }

  test("q_bpe_merges on the classic fixture: back-to-back merges stay leftmost-greedy") {
    import spark.implicits._
    // 'aaaa'×3 + 'aaa': pair (a,a) counts 3·3+2 = 11; after merging,
    // 'aaaa' → [aa, aa] (greedy non-overlap) and 'aaa' → [aa, a], so
    // round 2 must see (aa, aa):3 and (aa, a):1 — an implementation
    // whose single-pass replace breaks back-to-back merges (the
    // single-space separator trap) yields [aa, a, a] for 'aaaa' and
    // fails the round-2 row.
    val docs = Seq((1L, "aaaa aaaa aaaa aaa")).toDF("doc_id", "text")
    val got = functions.Text.bpeMerges(docs, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((1, "a", "a", 11L), (2, "aa", "aa", 3L)))
  }

  test("q_bpe_encode: per-doc symbol counts replay the learned merges; missing steps are identity") {
    import spark.implicits._
    // 'aa aa b' can learn exactly ONE merge — (a,a) with count 2 —
    // so training with rounds=4 yields a 1-row merge table, and
    // encode's steps 2-4 must be identity passes (the isNull guard):
    // without it the left-join degenerate of a cross join would empty
    // the vocabulary and every count below. Expected: 'aa' → [aa]
    // (1 symbol), 'b' → [b] (1).
    val docs = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    val merges = functions.Text.bpeMerges(docs, rounds = 4)
    assert(merges.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      === Seq((1, "a", "a")), "fixture must learn exactly one merge")
    val words = docs.select($"doc_id",
      explode(functions.Text.tokens(lower($"text"))).as("w"))
    val wsyms = words.select($"w").distinct()
      .select($"w", concat(lit(" "), array_join(split($"w", ""), "  "), lit(" ")).as("syms"))
    val enc = functions.Text.bpeApply(wsyms, merges, rounds = 4)
      .select($"w", size(split(trim($"syms"), "  ")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc === Map("aa" -> 1, "b" -> 1))
    val perDoc = run("q_bpe_encode") // registered query on the real corpus
    val row = perDoc.limit(1).collect()
    assert(row.nonEmpty && row(0).getLong(2) >= row(0).getLong(1),
      "symbols can never be fewer than tokens (every word is ≥1 symbol)")
  }

  test("q_bpe_merges: supplementary-plane symbols merge as code points, not surrogate halves") {
    import spark.implicits._
    // U+1F600 is two UTF-16 chars; if the symbol split broke surrogate
    // pairs, each word would contribute (high,low) half-pairs — three
    // across the corpus — instead of the two whole-code-point pairs,
    // and the adopted pair would be garbage halves.
    val g = "😀"
    val docs = Seq((1L, s"$g$g $g$g ${g}a")).toDF("doc_id", "text")
    val got = functions.Text.bpeMerges(docs, rounds = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((1, g, g, 2L)))
  }

  test("q_minhash_incremental: flagged set brackets exact cross-batch Jaccard") {
    import spark.implicits._
    // Exact cross-batch shingle Jaccard, brute force (new × history),
    // using the SAME shingle definition the signatures hash.
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", Tables.docBatchIdx($"source").as("b"),
        Dedup.shingles($"text", 3).as("sh"))
      .filter(size($"sh") > 0)
    val hist = sh.filter($"b" < Tables.HistoryBatches)
      .select($"doc_id".as("hist_id"), $"sh".as("hsh"))
    val exact = sh.filter($"b" >= Tables.HistoryBatches)
      .crossJoin(hist)
      .select($"doc_id", $"hist_id",
        (size(array_intersect($"sh", $"hsh")).cast("double") /
          size(array_union($"sh", $"hsh"))).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val flagged = run("q_minhash_incremental").collect()
      .map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "the corpus plants cross-batch near-dups; none flagged")
    // Recall: a true near-dup (exact j ≥ 0.8) collides in ≥1 of 16
    // bands and agrees on ≳80% of members — it cannot be missed.
    val strong = exact.filter(_._3 >= 0.8).map(_._1).toSet
    assert(strong.subsetOf(flagged),
      s"missed strong near-dups: ${strong -- flagged}")
    // Precision: est ≥ 0.5 over 32 members is implausible below
    // exact j ≈ 0.2 — every flag needs a real overlap witness.
    val witnessed = exact.filter(_._3 >= 0.2).map(_._1).toSet
    assert(flagged.subsetOf(witnessed),
      s"flags without an overlap witness: ${flagged -- witnessed}")
  }

  test("q_cluster_balance: caps crowded cells, passes sparse cells intact, dense positions") {
    val cellSizes = run("q_ivf_assign").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val picked = run("q_cluster_balance").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byCell = picked.groupBy(_._2)
    byCell.foreach { case (cell, rows) =>
      assert(rows.length <= Vectors.ClusterCap, s"cell $cell over cap")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"cell $cell positions not dense")
      assert(rows.length == math.min(cellSizes(cell), Vectors.ClusterCap.toLong),
        s"cell $cell kept ${rows.length} of ${cellSizes(cell)}")
    }
    assert(cellSizes.values.exists(_ > Vectors.ClusterCap),
      "no cell over cap — the trimming branch is dead at this sf")
  }

  test("q_ann_recall: full driver replay of exact and probed top-10 per query") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", Vectors.asDouble($"embedding").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def sqd(a: Array[Double], c: Array[Double]) =
      a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val cells = emb.map { case (id, v) =>
      id -> Vectors.ivfCells.zipWithIndex.minBy { case (c, i) => (sqd(v, c), i) }._2
    }.toMap
    // Sequential-fold cosine (the VecDot order), rounded like the query.
    def cos(a: Array[Double], b: Array[Double]) = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = run("q_ann_recall").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === (0L until 5L).toSet)
    (0L until 5L).foreach { q =>
      val qv = emb.find(_._1 == q).get._2
      def top10(cand: Array[(Long, Array[Double])]) = cand
        .map { case (id, v) => (id, cos(v, qv)) }
        .sortBy { case (id, sim) => (-sim, id) }.take(10).map(_._1).toSet
      val exact = top10(emb.filter(_._1 != q))
      val approx = top10(emb.filter { case (id, _) => id != q && cells(id) == cells(q) })
      val (nApprox, hits, recall) = got(q)
      assert(nApprox === approx.size.toLong, s"q$q n_approx")
      assert(hits === (exact & approx).size.toLong, s"q$q hits")
      assert(recall === BigDecimal((exact & approx).size / 10.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"q$q recall")
    }
  }

  test("q_lang_confusion replays the per-doc q_lang_id guesses") {
    val perDoc = run("q_lang_id").collect()
      .map(r => (r.getString(2), r.getString(1)))
    val expect = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowTot = perDoc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = run("q_lang_confusion").collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === expect(key), s"$key count")
      assert(r.getDouble(3) === BigDecimal(expect(key).toDouble / rowTot(key._1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$key share")
    }
  }

  test("q_pack_efficiency replays the q_seq_pack assignment") {
    val packed = run("q_seq_pack").collect()
      .map(r => ((r.getLong(0), r.getInt(4)), r.getInt(2).toLong))
    val seqTokens = packed.groupBy(_._1).view.mapValues(_.map(_._2).sum).values.toSeq
    val nSeqs = seqTokens.length.toLong
    val nTokens = seqTokens.sum
    val under = seqTokens.count(_ < Text.PackBudget * 4 / 5).toLong
    val row = run("q_pack_efficiency").collect().head
    assert(row.getLong(0) === nSeqs)
    assert(row.getLong(1) === nTokens)
    assert(row.getLong(2) === under)
    assert(row.getDouble(3) === BigDecimal(nTokens.toDouble / (nSeqs * Text.PackBudget))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(4) === BigDecimal(under.toDouble / nSeqs)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // The report is only meaningful if multi-sequence docs exist.
    assert(nSeqs > packed.map(_._1._1).distinct.length.toLong / 2,
      "degenerate fixture: almost no packing happened")
  }

  test("q_dup_rate replays per-source redundancy from the fingerprint table") {
    import spark.implicits._
    val fps = Tables.documents(spark, sf)
      .select($"source", Text.fingerprint($"text").as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = fps.groupBy(_._1)
    val got = run("q_dup_rate").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val n = rows.length.toLong
      val grp = rows.groupBy(_._2).view.mapValues(_.length).values.toSeq
      val uniq = grp.length.toLong
      val (gn, gu, gd, gr, gred) = got(src)
      assert(gn === n && gu === uniq, src)
      assert(gd === grp.count(_ > 1).toLong, src)
      assert(gr === n - uniq, src)
      assert(gred === BigDecimal((n - uniq).toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, src)
    }
    // Conservation: per-source doc counts must add to the corpus.
    assert(got.values.map(_._1).sum === fps.length.toLong)
  }

  test("q_token_fertility replays per-doc guesses, token counts, and UTF-8 bytes") {
    import spark.implicits._
    val guess = run("q_lang_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = run("q_text_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getInt(2).toLong))).toMap
    val bytes = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length.toLong)
      .toMap
    val byLang = guess.keys.toSeq.groupBy(guess)
    val got = run("q_token_fertility").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet === byLang.keySet)
    byLang.foreach { case (lang, ids) =>
      val nt = ids.map(i => toks(i)._1).sum
      val nsw = ids.map(i => toks(i)._2).sum
      val nb = ids.map(bytes).sum
      val (gDocs, gT, gSw, gB, gFert, gBpt) = got(lang)
      assert(gDocs === ids.length.toLong && gT === nt && gSw === nsw
        && gB === nb, lang)
      assert(gFert === BigDecimal(nsw.toDouble / math.max(nt, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$lang fertility")
      assert(gBpt === BigDecimal(nb.toDouble / math.max(nt, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$lang bytes/token")
    }
  }

  test("q_trunc_loss replays the loss curve from per-doc token counts") {
    val n = run("q_text_tokens").collect().map(_.getInt(1).toLong)
    val total = n.sum
    val got = run("q_trunc_loss").collect()
    assert(got.map(_.getInt(0)) === Text.TruncBudgets.toArray,
      "one row per budget, ascending")
    got.foreach { r =>
      val b = r.getInt(0)
      val cut = n.count(_ > b).toLong
      val lost = n.map(t => math.max(t - b, 0L)).sum
      assert(r.getLong(1) === cut, s"budget $b docs")
      assert(r.getLong(2) === lost, s"budget $b tokens")
      assert(r.getDouble(3) === BigDecimal(lost.toDouble / math.max(total, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"budget $b share")
      assert(r.getDouble(4) === BigDecimal(cut.toDouble / math.max(n.length, 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"budget $b docs share")
    }
    // Monotone: a larger budget never loses more.
    val losses = got.map(_.getLong(2))
    assert(losses.zip(losses.tail).forall { case (a, b) => a >= b },
      "token loss must be non-increasing in budget")
  }

  test("q_vocab_coverage replays the top-V cut, OOV counts, and byte-fallback shares") {
    import spark.implicits._
    // Independent replay in plain Scala: lowercased whitespace tokens
    // per doc, the (cnt DESC, term ASC) top-V vocabulary, then
    // per-language OOV occurrence and UTF-8 byte totals.
    val guess = run("q_lang_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docToks = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(Text.Ws + "+").filter(_.nonEmpty).toSeq)
      .toMap
    val cnt = docToks.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size }
    val vocab = cnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(Text.VocabSize).map(_._1).toSet
    val byLang = docToks.keys.toSeq.groupBy(guess)
    val got = run("q_vocab_coverage").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === byLang.keySet)
    byLang.foreach { case (lang, ids) =>
      val toks = ids.flatMap(docToks)
      val oov = toks.filterNot(vocab)
      val nOovBytes = oov.map(_.getBytes("UTF-8").length.toLong).sum
      val nSymbols = (toks.size - oov.size).toLong + nOovBytes
      val (gT, gOov, gOovB, gRate, gFall) = got(lang)
      assert(gT === toks.size.toLong && gOov === oov.size.toLong
        && gOovB === nOovBytes, lang)
      assert(gRate === BigDecimal(oov.size.toDouble / math.max(toks.size, 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$lang oov_rate")
      assert(gFall === BigDecimal(nOovBytes.toDouble / math.max(nSymbols, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$lang byte_fallback_share")
    }
    // The audit must have a real OOV tail at this sf, or the top-V cut
    // proved nothing (VocabSize must undercut the corpus vocabulary).
    assert(cnt.size > Text.VocabSize, "fixture vocabulary smaller than VocabSize")
    assert(got.values.map(_._2).sum > 0, "no OOV occurrences at this sf")
  }

  test("q_dedup_cluster_sizes matches a union-find histogram over the candidate graph") {
    // Independent algorithm: union-find over the SAME candidate pairs
    // the query labels with large-star/small-star — the histogram must
    // agree exactly (DedupScaleSpec proves the labeler itself; this
    // proves the histogram query end-to-end).
    val pairs = Dedup.candidatePairs(Tables.documents(spark, sf),
        "doc_id", "text", numHashes = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val sizes = parent.keys.toSeq.groupBy(find).values.map(_.size).filter(_ > 1)
    val expected = sizes.groupBy(identity).map { case (sz, g) =>
      sz.toLong -> g.size.toLong }
    val got = run("q_dedup_cluster_sizes").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (sz, n) =>
      val (gN, gDocs, gRem) = got(sz)
      assert(gN === n, s"size $sz")
      assert(gDocs === sz * n && gRem === (sz - 1) * n, s"size $sz derived cols")
    }
    // The fixture must actually contain multi-member groups or the
    // histogram proved nothing.
    assert(expected.values.sum > 0, "no dup groups at this sf")
  }

  test("q_url_dedup replays synthesis + normalization and the full top-200 report") {
    import spark.implicits._
    def norm(id: Long, lang: String, source: String, text: String): String = {
      val tk = text.split(Text.Ws + "+").filter(_.nonEmpty)
      def seg(i: Int) = if (tk.length >= i) tk(i - 1) else "index"
      val raw = (if (id % 3 == 0) "HTTP://" else "https://") +
        (if (id % 2 == 0) "www." else "") +
        (if (id % 9 == 0) source.toUpperCase(java.util.Locale.ROOT) else source) +
        ".example.com/" + seg(1) + "/" + seg(2) +
        (if (id % 5 == 0) "/" else "") +
        (if (id % 4 == 0) "?utm_source=feed&page=" + (id % 3)
         else if (id % 4 == 1) "?ref=" + lang
         else if (id % 4 == 2) "?page=" + (id % 3)
         else "") +
        (if (id % 6 == 0) "#sec" else "")
      val bare = raw.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("#.*$", "").replaceAll("^https?://", "")
        .replaceAll("^www\\.", "")
      val path = bare.replaceAll("\\?.*$", "").replaceAll("/$", "")
      val qs = { val i = bare.indexOf('?'); if (i >= 0) bare.substring(i + 1) else "" }
      val kept = qs.split("&")
        .filter(p => !p.matches("(utm_[a-z0-9]+|ref)=.*")).mkString("&")
      path + (if (kept.nonEmpty) "?" + kept else "")
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val expected = docs.map { case (id, lang, src, text) =>
      (norm(id, lang, src, text), id) }
      .groupBy(_._1).map { case (u, g) =>
        (u, g.length.toLong, g.map(_._2).min) }
      .toSeq.sortBy { case (u, n, _) => (-n, u) }.take(200)
    val got = run("q_url_dedup").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // Normalization properties: no scheme / www. / fragment / tracking
    // params / trailing slash survive, and real params do.
    got.map(_._1).foreach { u =>
      assert(!u.contains("://") && !u.startsWith("www.") && !u.contains("#"), u)
      assert(!u.contains("utm_") && !u.contains("ref="), u)
      assert(!u.stripSuffix("?").endsWith("/"), u)
    }
    assert(got.map(_._1).exists(_.contains("?page=")),
      "kept-param path never exercised")
    // The pass must collapse something at this sf or the dedup proved
    // nothing: at least one group with n_docs >= 2.
    assert(got.exists(_._2 >= 2), "no URL collisions at this sf")
  }

  test("q_gopher_rules replays every rule in exact integers; both verdicts occur") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("q_gopher_rules").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6)))).toMap
    assert(got.keySet === docs.keySet)
    docs.foreach { case (id, text) =>
      val tk = text.split(Text.Ws + "+").filter(_.nonEmpty)
      val n = tk.length.toLong
      val sumLen = tk.map(_.length.toLong).sum
      val nAlpha = tk.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nStop = tk.count(Text.Stopwords.contains).toLong
      val rLen = n >= Text.GopherMinTokens && n <= Text.GopherMaxTokens
      val rMean = sumLen >= n * Text.GopherMinMeanLen &&
        sumLen <= n * Text.GopherMaxMeanLen
      val rAlpha = nAlpha * 5 >= n * 4
      val rStop = nStop >= Text.GopherMinStops
      def b(x: Boolean) = if (x) 1 else 0
      assert(got(id) === ((n, b(rLen), b(rMean), b(rAlpha), b(rStop),
        b(rLen && rMean && rAlpha && rStop))), s"doc $id")
    }
    val passes = got.values.map(_._6).toSeq
    assert(passes.contains(1) && passes.contains(0),
      "degenerate fixture: the gate never fires (or always fires)")
  }

  test("q_matryoshka_recall replays full-dim vs truncated top-k from first principles") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def topK(q: Long, d: Int): Set[Long] =
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(v, vecs(q), d)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val got = run("q_matryoshka_recall").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === (0L until 5L).flatMap(q => Seq((q, 16), (q, 32))).toSet)
    for (q <- 0L until 5L; d <- Seq(16, 32)) {
      val expect = (topK(q, 64) & topK(q, d)).size.toLong
      val (hits, recall) = got((q, d))
      assert(hits === expect, s"probe $q dim $d")
      assert(recall === expect / 10.0, s"probe $q dim $d recall")
    }
    // Truncation must actually cost recall somewhere at this sf, or
    // the audit measured nothing.
    assert(got.values.exists(_._1 < 10), "truncation never lost a neighbor")
  }

  test("q_minhash_tuning: S-curve grid is the closed form, histogram is geometry-invariant, exp_caught replays") {
    val rows = run("q_minhash_tuning").collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(rows.length === 60, "6 geometries x 10 bins")
    // Grid passthrough: p is exactly the plan-time closed form.
    rows.foreach { case (b, rr, bin, sMid, p, _, _) =>
      assert(b * rr === 32, "every geometry spends the 32-hash budget")
      assert(sMid === (bin + 0.5) / 10.0)
      assert(p === Dedup.candidateProb(b, rr, sMid), s"($b,$rr) bin $bin")
    }
    // The observed histogram is a property of the DATA (shipped
    // geometry), not of the report row's geometry.
    rows.groupBy(_._3).foreach { case (bin, g) =>
      assert(g.map(_._6).distinct.length === 1, s"bin $bin n_obs varies")
    }
    // exp_caught replays as round(n_obs * p, 4).
    rows.foreach { case (_, _, _, _, p, n, e) =>
      assert(e === BigDecimal(n * p)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // Pointwise S-curve ordering: with the hash budget fixed, fewer
    // rows per band can only widen the catch (1-(1-s^r)^b decreasing
    // in r at rb const) — the property that makes the report a tuning
    // CURVE and not six unrelated numbers.
    rows.groupBy(_._3).values.foreach { g =>
      val byRows = g.sortBy(_._2).map(_._5)
      assert(byRows === byRows.sorted.reverse, "p not monotone in r")
    }
    // The shipped geometry's near-dup guarantee: P[candidate] >= 0.97
    // from j >= 0.5 up (the q_ngram_jaccard scaladoc claim).
    rows.filter(r => r._1 == 16 && r._3 >= 5)
      .foreach { case (_, _, bin, _, p, _, _) =>
        assert(p >= 0.97, s"shipped geometry weak at bin $bin") }
    // Histogram totals replay against the shared candidate stage, and
    // the thresholded tail (bins >= 1 <=> rounded jaccard >= 0.1) is
    // exactly q_ngram_jaccard's pre-limit pair count.
    val cand = Dedup.exactJaccardCandidates(Tables.documents(spark, sf))
      .collect().map(_.getDouble(2))
    val perBin = rows.filter(_._1 == 16).map(r => r._3 -> r._6).toMap
    assert(perBin.values.sum === cand.length.toLong)
    assert(perBin.filterKeys(_ >= 1).values.sum ===
      cand.count(_ >= 0.1).toLong)
    assert(cand.nonEmpty, "no candidate pairs at this sf — dead report")
  }

  test("q_minhash_calibration replays bias/mae from signatures + exact jaccard; histogram matches the tuning report") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.exactJaccardCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // First-principles replay of the integer-exact aggregate.
    val byBin = pairs.groupBy { case (_, _, ex) => math.min((ex * 10).toInt, 9) }
    val expect = byBin.map { case (bin, ps) =>
      val ds = ps.map { case (a, b, ex) =>
        val agree = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
        agree * 10000L - math.round(ex * 10000).toLong * 32L
      }
      val n = ds.length.toLong
      val sd = ds.sum
      val bias = (if (sd < 0) -1L else 1L) * ((2 * math.abs(sd) + 32 * n) / (64 * n))
      val mae = (2 * ds.map(math.abs).sum + 32 * n) / (64 * n)
      bin -> ((n, bias / 10000.0, mae / 10000.0))
    }
    val got = run("q_minhash_calibration").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === expect)
    // The histogram must be the SAME candidate population the tuning
    // report bins — one shared chain, two reports.
    val tuning = run("q_minhash_tuning").collect()
      .filter(_.getInt(0) == 16).map(r => r.getInt(2) -> r.getLong(5)).toMap
    got.foreach { case (bin, (n, _, _)) => assert(tuning(bin) === n, s"bin $bin") }
    // Estimator sanity at this sf: the near-dup regime (j >= 0.5) must
    // exist and estimate within the 32-member band (3 sigma of
    // sqrt(j(1-j)/32) < 0.27).
    assert(got.keys.exists(_ >= 5), "no near-dup bin — calibration measured nothing")
    got.foreach { case (bin, (_, _, mae)) => assert(mae <= 0.3, s"bin $bin mae $mae") }
  }

  test("q_bpe_fairness aggregates the encode output per lang; char counts replay; the audit discriminates") {
    import spark.implicits._
    val langOf = Tables.documents(spark, sf)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Per-lang word/symbol totals must be exactly the per-doc encode
    // output (q_bpe_encode — same trained merges, same word stream)
    // re-keyed by the doc's language.
    val fromEncode = run("q_bpe_encode").collect()
      .map(r => (langOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (l, rs) =>
        l -> ((rs.map(_._2).sum, rs.map(_._3).sum))
      }
    // Char totals replay from first principles: code-point count per
    // tokenized word (the v0 split identity).
    val chars = Tables.documents(spark, sf)
      .select($"lang", $"text").collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split(functions.Text.Ws + "+")
          .filter(_.nonEmpty)
          .map(w => r.getString(0) -> w.codePointCount(0, w.length).toLong)
      }.groupBy(_._1).map { case (l, ws) => l -> ws.map(_._2).sum }
    val got = run("q_bpe_fairness").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === fromEncode.keySet)
    got.foreach { case (l, (nw, nc, ns, spw, cps)) =>
      assert((nw, ns) === fromEncode(l), s"$l words/symbols")
      assert(nc === chars(l), s"$l chars")
      // Half-up INTEGER division over the exact rational — the
      // q_cross_dup rounding rule, replayed bit-for-bit.
      assert(spw === ((2L * 10000L * ns + nw) / (2L * nw)) / 10000.0, s"$l spw")
      assert(cps === ((2L * 10000L * nc + ns) / (2L * ns)) / 10000.0, s"$l cps")
      // BPE can only merge: a word's symbols are between 1 and its
      // characters, so the per-lang means respect the same bounds.
      assert(spw >= 1.0 && cps >= 1.0, s"$l ratio bounds")
      assert(ns <= nc && nw <= ns, s"$l count bounds")
    }
    // The audit must actually discriminate languages at this sf, or
    // the report measures nothing.
    assert(got.values.map(_._4).toSeq.distinct.length >= 2,
      "every language pays the same symbols-per-word")
  }

  test("q_cross_dup replays the per-source-pair matrix from the shared candidate stage") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val srcOf = docs.select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.exactJaccardCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) =>
      val n = ps.length.toLong
      val j4s = ps.map { case (_, _, j) => math.round(j * 10000) }
      k -> ((n, ((2 * j4s.sum + n) / (2 * n)) / 10000.0, ps.map(_._3).max))
    }
    val got = run("q_cross_dup").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === expect)
    assert(got.nonEmpty, "no near-dup cells at this sf — dead report")
    // Both regimes must exist at this sf: within-source near-dups and
    // cross-source ones (the report's reason to exist).
    assert(got.keys.exists { case (a, b) => a == b }, "no within-source cell")
    assert(got.keys.exists { case (a, b) => a != b }, "no cross-source cell")
  }

  test("q_simhash_tuning: hypergeometric grid is the closed form, pigeonhole holds, histogram replays from signatures") {
    val rows = run("q_simhash_tuning").collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length === 78, "6 geometries x 13 hamming values")
    rows.foreach { case (b, w, h, p, _, _) =>
      assert(b * w === 48, "every geometry spends the 48 signature bits")
      assert(p === Dedup.simBandProb(b, w, h), s"($b,$w) h=$h")
      // Pigeonhole: fewer differing bits than bands forces a clean
      // band — the closed form must say EXACTLY 1.
      if (h < b) assert(p === 1.0, s"pigeonhole broken at ($b,$w) h=$h")
    }
    // The shipped 4x12 geometry is the COARSEST split that keeps the
    // hamming<=3 contract: p = 1 through h=3, and the next-coarser
    // (2,24) already leaks at h=2.
    rows.filter(r => r._1 == 4 && r._3 <= 3).foreach(r =>
      assert(r._4 === 1.0, s"shipped contract broken at h=${r._3}"))
    assert(rows.find(r => r._1 == 4 && r._3 == 4).get._4 < 1.0)
    assert(rows.find(r => r._1 == 2 && r._3 == 2).get._4 < 1.0)
    // With total bits fixed, narrower bands can only widen the catch:
    // p is monotone nondecreasing in the band count at every h.
    rows.groupBy(_._3).values.foreach { g =>
      val byBands = g.sortBy(_._1).map(_._4)
      assert(byBands === byBands.sorted, "p not monotone in band count")
    }
    // The observed histogram is a property of the DATA (shipped
    // geometry), not of the report row's geometry.
    rows.groupBy(_._3).foreach { case (h, g) =>
      assert(g.map(_._5).distinct.length === 1, s"h=$h n_obs varies")
    }
    // exp_caught replays as round(n_obs * p, 4).
    rows.foreach { case (_, _, _, p, n, e) =>
      assert(e === BigDecimal(n * p)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // Histogram replays from first principles: collected 48-bit
    // signatures, 4x12 band collisions under the occupancy cap, each
    // DISTINCT pair counted once if ANY surviving band matches (the
    // r20 distinct-pair rule — the first-matching-band predicate was
    // retired after its capped-bucket recall loss measured 47% at
    // sf1.0; see Dedup.simhashTuning), hamming <= 12.
    val sigs = run("q_dedup_simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def bv(s: Long, k: Int): Long = (s >> (12 * k)) & 4095L
    val occ = (for { (_, s) <- sigs; k <- 0 until 4 } yield (k, bv(s, k)))
      .groupBy(identity).map { case (b, bs) => b -> bs.length }
    val keep = (b: Int, v: Long) => occ((b, v)) <= Dedup.SimTuningBucketCap
    val expectHist = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if (0 until 4).exists(k => bv(sa, k) == bv(sb, k) && keep(k, bv(sa, k)))
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 12
    } yield h).groupBy(identity).map { case (h, hs) => h -> hs.length.toLong }
    val gotHist = rows.filter(_._1 == 4).map(r => r._3 -> r._5)
      .filter(_._2 > 0L).toMap
    assert(gotHist === expectHist)
    assert(gotHist.nonEmpty, "no candidate pairs at this sf — dead report")
  }

  test("scaled IVF cell family: clamp floor covers the graded SFs, prefix-stable, mirrors the SQL clamps") {
    // All three graded SFs sit at the clamp floor — the scaled family
    // IS the historical k=8, so assignments are bit-identical there.
    for (n <- Seq(500L, 2000L)) assert(Vectors.ivfCellCount(n) === 8, s"n=$n")
    // Scaling region and ceiling (the literal-pool bound the twins embed).
    assert(Vectors.ivfCellCount(20000L) === 80)
    assert(Vectors.ivfCellCount(40000L) === 160)
    assert(Vectors.ivfCellCount(100000L) === 256)
    // Prefix stability: family k's first j centroids equal family j —
    // the property that keeps graded assignments unchanged and lets
    // the twin filter one shared pool.
    val small = Vectors.ivfCellsFor(2000L).map(_.toSeq).toSeq
    val big = Vectors.ivfCellsFor(30000L).map(_.toSeq).toSeq
    assert(big.length === Vectors.ivfCellCount(30000L))
    assert(big.take(small.length) === small)
  }

  test("q_vocab_budget replays Hamilton apportionment over the fairness excess signal") {
    // The excess signal must be EXACTLY the fairness audit's counts —
    // one shared dictionary-coded chain, two reports.
    val fairness = run("q_bpe_fairness").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val got = run("q_vocab_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).toSet === fairness.keySet)
    got.foreach { case (l, nw, ns, excess, _) =>
      assert((nw, ns) === fairness(l), s"$l counts diverge from fairness")
      assert(excess === ns - nw, s"$l excess")
      assert(excess >= 0L, s"$l negative excess — BPE split a word?")
    }
    // First-principles largest-remainder replay in exact integers.
    val budget = functions.Text.VocabBudget.toLong
    val nn = got.map(_._4).sum
    assert(nn > 0L, "zero total excess — degenerate fixture")
    val based = got.map { case (l, _, _, e, _) =>
      (l, e, budget * e / nn, budget * e % nn) }
    val used = based.map(_._3).sum
    val topUp = based.sortBy { case (l, _, _, rem) => (-rem, l) }
      .take((budget - used).toInt).map(_._1).toSet
    val expect = based.map { case (l, _, base, _) =>
      l -> (base + (if (topUp(l)) 1L else 0L)) }.toMap
    got.foreach { case (l, _, _, _, alloc) =>
      assert(alloc === expect(l), s"$l alloc") }
    // The apportionment spends the budget EXACTLY and must actually
    // discriminate (an equal split would mean the signal is dead).
    assert(got.map(_._5).sum === budget)
    assert(got.map(_._5).distinct.length >= 2, "allocation is uniform")
  }
}
