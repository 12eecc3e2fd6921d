package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** [EXT] Retrieval-side operators for LLM-data pipelines over
  * `documents`: BM25 keyword scoring (the lexical-retrieval baseline
  * every RAG/eval stack needs next to the embedding ANN paths in
  * [[Vectors]]) and train/eval n-gram decontamination (the overlap
  * check run before any benchmark number is trusted — an eval document
  * whose n-grams appear in training data is contaminated).
  *
  * Both are explode → bounded hash-aggregate pipelines: the shuffles
  * move (key, partial count) pairs, never documents, so corpus size
  * only grows the linear tokenize/explode stage — the same 100 TB
  * shape as q_tfidf / q_top_bigrams.
  */
object Retrieval extends QueryModule {

  /** BM25 query terms — fixed so the whole score is deterministic and
    * the DuckDB twin can reproduce it literally.
    */
  val QueryTerms: Seq[String] = Seq("spark", "hash", "window")

  /** Decontamination shingle width. 4 tokens on this corpus's ~50-token
    * docs plays the role 13-grams play on real web text (the classic
    * overlap width): wide enough that a hit means real shared phrasing,
    * narrow enough that hits exist to verify the plumbing.
    */
  val ContamN = 4

  /** Every 25th doc_id plays the held-out eval set. */
  val EvalMod = 25

  /** Inverted-index result shape: the [[IndexTerms]] highest-df terms,
    * each with its first [[PostingsCap]] doc ids.
    */
  val IndexTerms = 50
  val PostingsCap = 10

  override def queries: Map[String, Query] = Map(
    // BM25 (Okapi, k1=1.2 b=0.75) of a fixed 3-term query against the
    // corpus. Plan shape: the per-doc length table is computed ONCE and
    // persisted (it feeds both the corpus-stats aggregate and the tf
    // explode — an unpinned second consumer would re-tokenize the
    // corpus, the round-3 self-join trap); the term explode is filtered
    // to the query terms BEFORE any aggregation, so the tf/df
    // aggregates see only matching postings (at 100 TB this is the
    // difference between aggregating the full posting list and the
    // query's slice of it). N and avgdl arrive as a broadcast one-row
    // aggregate, df as a broadcast |query-terms|-row join — nothing
    // larger than the match set ever shuffles. Constants are written as
    // the same literals in both engines (1.2, 2.2, 0.25, 0.75): deriving
    // 2.2 as 1.2+1 at runtime could differ from the literal 2.2 in the
    // last ulp and flip a rounded score.
    "q_bm25" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      bm25Scored(s, dir)
        .orderBy($"bm25".desc, $"doc_id".asc)
        .limit(25)
    }),

    "q_contamination" -> ((s, dir) => graft.Pins.scoped(_ => contamination(s, dir))),

    // [EXT] Inverted-index build — the term → postings-list
    // materialization behind every lexical retrieval system (the
    // BM25/sparse-cosine queries above assume this structure exists;
    // this operator BUILDS it). Plan shape: one tokenize +
    // distinct-terms explode (per-doc distinct via array_distinct, so
    // the explode emits each (doc, term) once), a map-side-combined
    // df count, the [[IndexTerms]] head of the df table broadcast
    // back as the term filter, and per-term postings capped at
    // [[PostingsCap]] via row_number ≤ k — Catalyst rewrites that to
    // WindowGroupLimit, so no full posting list ever materializes in
    // one task (the hot-term skew bound: a stopword's millions of
    // postings truncate inside each partition before the window
    // sort). Postings ship as a comma-joined string: the index ROW is
    // the unit of storage, and the driver's compare hashes scalars.
    "q_inverted_index" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val posting = Tables.documents(s, dir)
        .select($"doc_id",
          explode(array_distinct(Text.tokens(lower($"text")))).as("term"))
        .transform(graft.Pins.ambient)
      val df = posting.groupBy($"term").agg(count(lit(1)).as("df"))
      val top = broadcast(df.orderBy($"df".desc, $"term".asc).limit(IndexTerms))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"term").orderBy($"doc_id")
      posting.join(top, Seq("term"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= PostingsCap)
        .groupBy($"term", $"df")
        .agg(array_join(transform(sort_array(collect_list($"doc_id")),
          _.cast("string")), ",").as("postings"))
        .orderBy($"df".desc, $"term".asc)
    }),

    // [EXT] sparse TF-IDF cosine — related-document search, the SPARSE
    // twin of the dense ANN paths in Vectors: score every corpus doc
    // against query doc 0 by the cosine of their tf·idf term vectors.
    // The sparse shape never materializes a vector: the weighted
    // postings table (doc, term, w) is pinned once (it feeds the query
    // slice, the corpus side, and the norm aggregate), the query doc's
    // ≤|doc| terms broadcast, the dot product is a term-key join +
    // per-doc sum — only docs SHARING a term with the query are ever
    // touched (the inverted-index property; a dense scan touches all).
    // idf = ln((N+1)/(df+1)) + 1 (smoothed, always positive); N
    // arrives as a broadcast one-row aggregate. Scores are rounded at
    // 4dp — sum order differs across engines (the q_tfidf contract).
    "q_sparse_cosine" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      sparseCosineScored(s, dir)
        .orderBy($"sim".desc, $"doc_id".asc)
        .limit(10)
    }),

    // [EXT r13] Reciprocal-rank fusion of the two lexical rankers —
    // hybrid retrieval's standard merge (Cormack, Clarke & Büttcher,
    // SIGIR 2009): each ranker contributes 1/(K + rank) for the docs
    // in its top [[RrfDepth]], and the sum orders the fused list.
    // Rank-based fusion needs no score normalization, which is
    // exactly why production hybrid search (BM25 + vector) uses it.
    // Scale shape: each ranker's candidate list arrives by
    // TakeOrdered (never a global rank window over the corpus — the
    // row_number that ASSIGNS ranks runs over the ≤[[RrfDepth]]-row
    // top-K result only), and the fusion is a full outer join of two
    // tiny lists. Ranks are ints from 4-dp-rounded scores with
    // doc_id tiebreaks (deterministic on both engines); absent-list
    // membership is encoded as rank 0, keeping the output columns
    // non-null integers. 1/(K+rank) is one exact IEEE division; the
    // sum of two such doubles is deterministic; rrf rounds at 6 dp.
    "q_rrf_fusion" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      // ONE pinned tokenize pass feeds both rankers (docTokens);
      // rank assignment is the shared [[ranked]] contract.
      val dld = docTokens(s, dir)
      val ra = ranked(bm25From(s, dld), "bm25", "rank_bm25")
      val rb = ranked(sparseCosineFrom(s, dld), "sim", "rank_cos")
      ra.join(rb, Seq("doc_id"), "full_outer")
        .select($"doc_id",
          coalesce($"rank_bm25", lit(0)).as("rank_bm25"),
          coalesce($"rank_cos", lit(0)).as("rank_cos"),
          round(coalesce(lit(1.0) / (lit(RrfK) + $"rank_bm25"), lit(0.0))
            + coalesce(lit(1.0) / (lit(RrfK) + $"rank_cos"), lit(0.0)), 6)
            .as("rrf"))
        .orderBy($"rrf".desc, $"doc_id".asc)
        .limit(RrfTopK)
    }),

    // [EXT r13] Ranker agreement report — the diagnostic run BEFORE
    // deciding a fusion is worth shipping: how much do the lexical
    // rankers (BM25, sparse TF-IDF cosine) actually agree at depth
    // 10/25/50? High overlap means fusion adds nothing; low overlap
    // means the rankers see different relevance signals and RRF has
    // something to merge (the complementarity argument of the hybrid-
    // retrieval literature). Same plan scale-shape as q_rrf_fusion:
    // each list arrives by TakeOrdered (the rank window runs over
    // ≤[[RrfDepth]] rows, never the corpus), the comparison is a full
    // outer join of two tiny lists crossed with a 3-row depth frame —
    // everything after the shared scoring pipelines is constant-size.
    // Absence is encoded as rank MAXINT so `rank <= depth` IS the
    // membership test; overlap is exact integer counts, Jaccard =
    // common/union rounded at 4 dp (one exact division).
    "q_rank_overlap" -> ((s, dir) => graft.Pins.scoped { _ =>
      // ONE pinned tokenize pass feeds both rankers (docTokens);
      // rank assignment is the shared [[ranked]] contract and the
      // depth comparison is [[overlapReport]] (spec-driven on a
      // constructed fixture, so the absence encoding is pinned).
      val dld = docTokens(s, dir)
      overlapReport(
        ranked(bm25From(s, dld), "bm25", "ra"),
        ranked(sparseCosineFrom(s, dld), "sim", "rb"))
    }),
  )

  /** The depth-sweep comparison of two rank lists `(doc_id, ra)` /
    * `(doc_id, rb)` — q_rank_overlap's tail, split out so a
    * constructed-fixture spec can drive the trickiest encoding
    * directly: absence from a list is rank Int.MaxValue, so
    * `rank <= depth` IS the membership test at every depth (a doc in
    * one ranker's top-10 but both top-50s flips from non-common at
    * depth 10 to common at depth 50 — RetrievalSpec pins the flip).
    */
  private[graft] def overlapReport(ra: DataFrame, rb: DataFrame): DataFrame = {
    val s = ra.sparkSession
    import s.implicits._
    val depths = broadcast(OverlapDepths.toDF("depth"))
    ra.join(rb, Seq("doc_id"), "full_outer")
      .select(coalesce($"ra", lit(Int.MaxValue)).as("ra"),
        coalesce($"rb", lit(Int.MaxValue)).as("rb"))
      .crossJoin(depths)
      .groupBy($"depth")
      .agg(count(when($"ra" <= $"depth", lit(1))).as("n_bm25"),
        count(when($"rb" <= $"depth", lit(1))).as("n_cos"),
        count(when($"ra" <= $"depth" && $"rb" <= $"depth", lit(1)))
          .as("n_common"))
      .select($"depth", $"n_bm25", $"n_cos", $"n_common",
        round($"n_common" / nullif(
          ($"n_bm25" + $"n_cos" - $"n_common").cast("double"), lit(0.0)),
          4).as("jaccard"))
      .orderBy($"depth")
  }

  /** Depths at which q_rank_overlap compares the two rank lists. */
  val OverlapDepths: Seq[Int] = Seq(10, 25, 50)

  /** RRF smoothing constant (the k=60 of the original paper). */
  val RrfK = 60
  /** Per-ranker candidate-list depth entering the fusion. */
  val RrfDepth = 50
  /** Fused-list size reported. */
  val RrfTopK = 25

  /** BM25 (Okapi, k1=1.2 b=0.75) of the fixed [[QueryTerms]] against
    * the corpus — the scored frame `(doc_id, bm25)`, shared by q_bm25
    * (top-25 report) and q_rrf_fusion (rank source). Plan shape: the
    * per-doc length table is computed ONCE and pinned (it feeds both
    * the corpus-stats aggregate and the tf explode — an unpinned
    * second consumer would re-tokenize the corpus, the round-3
    * self-join trap); the term explode is filtered to the query terms
    * BEFORE any aggregation, so the tf/df aggregates see only
    * matching postings (at 100 TB this is the difference between
    * aggregating the full posting list and the query's slice of it).
    * N and avgdl arrive as a broadcast one-row aggregate, df as a
    * broadcast |query-terms|-row join — nothing larger than the match
    * set ever shuffles. Constants are written as the same literals in
    * both engines (1.2, 2.2, 0.25, 0.75): deriving 2.2 as 1.2+1 at
    * runtime could differ from the literal 2.2 in the last ulp and
    * flip a rounded score. Callers must be inside a Pins scope.
    */
  private[graft] def bm25Scored(s: SparkSession, dir: String): DataFrame =
    bm25From(s, docTokens(s, dir))

  /** The corpus tokenized ONCE — `(doc_id, tk, dl)`, pinned. Both
    * rankers derive from this frame, so a query composing them
    * (q_rrf_fusion, q_rank_overlap) tokenizes the corpus once instead
    * of once per ranker — at 100 TB the tokenize pass IS the linear
    * cost, everything downstream is match-set- or vocabulary-bounded.
    * Callers must be inside a Pins scope.
    */
  private[graft] def docTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", Text.tokens(lower($"text")).as("tk"))
      .select($"doc_id", $"tk", size($"tk").cast("double").as("dl"))
      .transform(graft.Pins.ambient)
  }

  /** Top-[[RrfDepth]] of a scored frame with dense ranks assigned —
    * the rank-assignment contract SHARED by q_rrf_fusion and
    * q_rank_overlap (one definition, so the two evaluations cannot
    * drift): TakeOrdered first (the rank window never sees the
    * corpus, only the ≤[[RrfDepth]]-row list), then row_number by
    * (score DESC, doc_id) — the same total order as the cut, so rank
    * i IS the i-th list entry on both engines.
    */
  private[graft] def ranked(scored: DataFrame, score: String,
      rankAs: String): DataFrame = {
    import scored.sparkSession.implicits._
    scored.orderBy(col(score).desc, $"doc_id".asc)
      .limit(RrfDepth)
      .withColumn(rankAs, row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy(col(score).desc, $"doc_id".asc)))
      .select($"doc_id", col(rankAs))
  }

  private[graft] def bm25From(s: SparkSession, dld: DataFrame): DataFrame = {
    import s.implicits._
    val stats = dld.agg(
      count(lit(1)).cast("double").as("n_docs"), sum($"dl").as("sum_dl"))
    // tf is pinned too: it feeds BOTH the final join's probe side and
    // the df aggregate — unpersisted, Spark would re-run the corpus
    // explode + tf aggregation once per consumer (the PLANS.md dump
    // showed the Generate stage twice). The cached frame is tiny
    // (one row per matching doc-term).
    val tf = dld.select($"doc_id", $"dl", explode($"tk").as("term"))
      .filter($"term".isin(QueryTerms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).cast("double").as("tf"))
      .transform(graft.Pins.ambient)
    val df = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)))
      .withColumn("score_t", $"idf" * ($"tf" * lit(2.2)) /
        ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / ($"sum_dl" / $"n_docs"))))
      .groupBy($"doc_id").agg(round(sum($"score_t"), 4).as("bm25"))
  }

  /** Sparse TF-IDF cosine of every corpus doc against query doc 0 —
    * the scored frame `(doc_id, sim)`, shared by q_sparse_cosine
    * (top-10 report) and q_rrf_fusion (rank source). The sparse shape
    * never materializes a vector: the weighted postings table
    * (doc, term, w) is pinned once (it feeds the query slice, the
    * corpus side, and the norm aggregate), the query doc's ≤|doc|
    * terms broadcast, the dot product is a term-key join + per-doc
    * sum — only docs SHARING a term with the query are ever touched
    * (the inverted-index property; a dense scan touches all).
    * idf = ln((N+1)/(df+1)) + 1 (smoothed, always positive); N
    * arrives as a broadcast one-row aggregate. Scores are rounded at
    * 4dp — sum order differs across engines (the q_tfidf contract).
    * Callers must be inside a Pins scope.
    */
  /** Standalone entry (q_sparse_cosine): tf explodes STRAIGHT off the
    * scan — tf is consumed exactly once (into the pinned w), so
    * materializing a token-array frame first would cost a full extra
    * write of the corpus tokens for nothing (measured 0.9 → 1.8 s at
    * sf0.1 when this path briefly went through [[docTokens]]). Only
    * the two-ranker composition queries, where the SECOND consumer
    * exists, route through the shared pinned frame.
    */
  private[graft] def sparseCosineScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sparseCosineFrom(s, Tables.documents(s, dir)
      .select($"doc_id", Text.tokens(lower($"text")).as("tk")))
  }

  private[graft] def sparseCosineFrom(s: SparkSession, dld: DataFrame): DataFrame = {
    import s.implicits._
    val tf = dld
      .select($"doc_id", explode($"tk").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).cast("double").as("tf"))
    val nDocs = dld.agg(count(lit(1)).cast("double").as("n"))
    val df = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    val w = tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
      .select($"doc_id", $"term",
        ($"tf" * (log(($"n" + 1) / ($"df" + 1)) + 1)).as("w"))
      .transform(graft.Pins.ambient)
    val norms = w.groupBy($"doc_id").agg(sqrt(sum($"w" * $"w")).as("nrm"))
    val qv = broadcast(w.filter($"doc_id" === 0)
      .select($"term", $"w".as("qw")))
    val qn = norms.filter($"doc_id" === 0).select($"nrm".as("qnrm"))
    w.filter($"doc_id" =!= 0)
      .join(qv, Seq("term"))
      .groupBy($"doc_id").agg(sum($"w" * $"qw").as("dot"))
      .join(norms, Seq("doc_id")).crossJoin(broadcast(qn))
      .select($"doc_id", round($"dot" / ($"nrm" * $"qnrm"), 4).as("sim"))
  }

  /** Conservative planning estimate of the eval-gram broadcast size:
    * one gram per token (~50/doc on this corpus; production pipelines
    * know their doc-length stats the same way), ~80 B per distinct
    * gram as a broadcast hash-table entry. Deliberately an
    * OVER-estimate — the cost of wrongly broadcasting (executor OOM)
    * dwarfs the cost of wrongly shuffling (one extra exchange).
    */
  private val EstGramBytesPerEvalDoc = 50L * 80L

  /** Train/eval decontamination: which training docs share a 4-gram
    * with the held-out eval slice. The train side explodes each doc's
    * distinct n-grams linearly; the n-gram frame is built once and
    * persisted — its eval and train branches would otherwise each
    * re-run the tokenize+shingle stage.
    *
    * The eval side's join strategy is a SIZE SWITCH (round-5 advice —
    * the shuffle variant used to exist only as a comment):
    *
    *   - small eval set (the common case — eval sets are curated):
    *     DISTINCT eval grams broadcast to the train side; the hash
    *     join filters non-colliding grams at the mapper, so the only
    *     shuffle is the map-side-combined per-doc hit count;
    *   - eval set too big to broadcast (estimated from the
    *     metadata-only corpus row count, never a scan): both sides
    *     exchange on the n-gram key into a shuffled hash join — a
    *     10 GB eval set costs one shuffle instead of OOMing every
    *     executor with a broadcast.
    *
    * Both branches compute the identical result (RetrievalSpec forces
    * the shuffle branch and asserts row-for-row equality; the DuckDB
    * oracle gates whichever branch the scale factor picks).
    */
  private[graft] def contamination(s: SparkSession, dir: String,
      broadcastThresholdBytes: Long = 10L << 20): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .select($"doc_id", Text.tokens($"text").as("tk"))
      .select($"doc_id",
        when(size($"tk") < ContamN, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size($"tk") - (ContamN - 1)),
            i => concat_ws(" ", (0 until ContamN).map(o => element_at($"tk", i + o)): _*)))
          .as("gs"))
      .transform(graft.Pins.ambient)
    val evalGrams = grams.filter($"doc_id" % EvalMod === 0)
      .select(explode($"gs").as("g")).distinct()
    val trainGrams = grams.filter($"doc_id" % EvalMod =!= 0)
      .select($"doc_id", explode(array_distinct($"gs")).as("g"))
    val estEvalDocs = Tables.rowCount(s, dir, "documents") / EvalMod
    val joined =
      if (estEvalDocs * EstGramBytesPerEvalDoc <= broadcastThresholdBytes)
        trainGrams.join(broadcast(evalGrams), Seq("g"))
      else
        trainGrams.join(evalGrams.hint("shuffle_hash"), Seq("g"))
    joined.groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy($"doc_id")
  }

  private val termList = QueryTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  override def oracles: Map[String, String] = Map(
    "q_inverted_index" ->
      s"""WITH posting AS (
         |  SELECT DISTINCT doc_id, term
         |  FROM (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '${Text.Ws}+'),
         |    t -> length(t) > 0)) AS term FROM documents)),
         |df AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
         |top AS (SELECT term, df FROM df
         |        ORDER BY df DESC, term LIMIT $IndexTerms)
         |SELECT top.term, top.df,
         |  array_to_string(list_slice(
         |    list(posting.doc_id ORDER BY posting.doc_id), 1, $PostingsCap),
         |    ',') AS postings
         |FROM top JOIN posting USING (term)
         |GROUP BY top.term, top.df
         |ORDER BY top.df DESC, top.term""".stripMargin,
    "q_sparse_cosine" ->
      s"""WITH tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '${Text.Ws}+'), t -> length(t) > 0)) AS term
        |  FROM documents)
        |  GROUP BY doc_id, term),
        |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |w AS (
        |  SELECT doc_id, term, tf * (ln((n + 1) / (df + 1)) + 1) AS w
        |  FROM tf JOIN df USING (term) CROSS JOIN nd),
        |norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
        |qv AS (SELECT term, w AS qw FROM w WHERE doc_id = 0),
        |qn AS (SELECT nrm AS qnrm FROM norms WHERE doc_id = 0),
        |dots AS (
        |  SELECT w.doc_id, SUM(w.w * qv.qw) AS dot
        |  FROM w JOIN qv USING (term) WHERE w.doc_id <> 0 GROUP BY w.doc_id)
        |SELECT d.doc_id, ROUND(d.dot / (norms.nrm * qn.qnrm), 4) AS sim
        |FROM dots d JOIN norms ON d.doc_id = norms.doc_id CROSS JOIN qn
        |ORDER BY sim DESC, d.doc_id LIMIT 10""".stripMargin,
    "q_bm25" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '${Text.Ws}+'), t -> length(t) > 0) AS tk
         |  FROM documents),
         |dl AS (SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS dl FROM d),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl FROM dl),
         |t AS (SELECT doc_id, dl, unnest(tk) AS term FROM dl),
         |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
         |       FROM t WHERE term IN $termList GROUP BY doc_id, dl, term),
         |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term)
         |SELECT doc_id, ROUND(SUM(
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |    * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))), 4) AS bm25
         |FROM tf JOIN df USING (term), stats
         |GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 25""".stripMargin,
    "q_contamination" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '${Text.Ws}+'), x -> length(x) > 0) AS tk
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, list_transform(range(1, len(tk) - ${ContamN - 2}),
         |    i -> array_to_string(list_slice(tk, i, i + ${ContamN - 1}), ' ')) AS gs
         |  FROM t),
         |ev AS (SELECT DISTINCT unnest(gs) AS g FROM g WHERE doc_id % $EvalMod = 0),
         |tr AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM g WHERE doc_id % $EvalMod <> 0)
         |SELECT doc_id, COUNT(*) AS n_hits
         |FROM tr JOIN ev USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Both rankers' full CTE chains (the q_bm25 and q_sparse_cosine
    // twins verbatim, b*/c*-prefixed), each top-RrfDepth'd and
    // ranked, then fused.
    "q_rrf_fusion" ->
      s"""$rankerCtes
         |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         |  COALESCE(b.rank_bm25, 0) AS rank_bm25,
         |  COALESCE(c.rank_cos, 0) AS rank_cos,
         |  ROUND(COALESCE(1.0 / ($RrfK + b.rank_bm25), 0.0)
         |    + COALESCE(1.0 / ($RrfK + c.rank_cos), 0.0), 6) AS rrf
         |FROM brank b FULL OUTER JOIN crank c ON b.doc_id = c.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT $RrfTopK""".stripMargin,
    // The same two rank lists, compared instead of fused: absent-list
    // membership encoded as rank MAXINT so a `<= depth` test is the
    // membership test on both engines.
    "q_rank_overlap" ->
      s"""$rankerCtes,
         |j AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         |        COALESCE(b.rank_bm25, 2147483647) AS ra,
         |        COALESCE(c.rank_cos, 2147483647) AS rb
         |      FROM brank b FULL OUTER JOIN crank c ON b.doc_id = c.doc_id),
         |dep(depth) AS (VALUES (10), (25), (50))
         |SELECT depth,
         |  COUNT(*) FILTER (WHERE ra <= depth) AS n_bm25,
         |  COUNT(*) FILTER (WHERE rb <= depth) AS n_cos,
         |  COUNT(*) FILTER (WHERE ra <= depth AND rb <= depth) AS n_common,
         |  ROUND((COUNT(*) FILTER (WHERE ra <= depth AND rb <= depth))
         |    / NULLIF(CAST(COUNT(*) FILTER (WHERE ra <= depth)
         |        + COUNT(*) FILTER (WHERE rb <= depth)
         |        - COUNT(*) FILTER (WHERE ra <= depth AND rb <= depth)
         |        AS DOUBLE), 0.0), 4) AS jaccard
         |FROM j CROSS JOIN dep
         |GROUP BY depth ORDER BY depth""".stripMargin,
  )

  /** The two lexical rankers' shared CTE chain (the q_bm25 and
    * q_sparse_cosine twins verbatim, prefixed b/c per ranker), each
    * list top-[[RrfDepth]]'d and rank-assigned — composed by the
    * q_rrf_fusion (merge) and q_rank_overlap (compare) twins so the
    * two evaluations can never read different rankings.
    */
  private lazy val rankerCtes: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '${Text.Ws}+'), t -> length(t) > 0) AS tk
       |  FROM documents),
       |dl AS (SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS dl FROM d),
       |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl FROM dl),
       |t AS (SELECT doc_id, dl, unnest(tk) AS term FROM dl),
       |btf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
       |        FROM t WHERE term IN $termList GROUP BY doc_id, dl, term),
       |bdf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM btf GROUP BY term),
       |bscore AS (
       |  SELECT doc_id, ROUND(SUM(
       |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))), 4) AS bm25
       |  FROM btf JOIN bdf USING (term), stats GROUP BY doc_id),
       |btop AS (SELECT doc_id, bm25 FROM bscore
       |         ORDER BY bm25 DESC, doc_id LIMIT $RrfDepth),
       |brank AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
       |            (ORDER BY bm25 DESC, doc_id) AS INT) AS rank_bm25
       |          FROM btop),
       |ctf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
       |        FROM t GROUP BY doc_id, term),
       |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
       |cdf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM ctf GROUP BY term),
       |w AS (
       |  SELECT doc_id, term, tf * (ln((n + 1) / (df + 1)) + 1) AS w
       |  FROM ctf JOIN cdf USING (term) CROSS JOIN nd),
       |norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
       |qv AS (SELECT term, w AS qw FROM w WHERE doc_id = 0),
       |qn AS (SELECT nrm AS qnrm FROM norms WHERE doc_id = 0),
       |dots AS (
       |  SELECT w.doc_id, SUM(w.w * qv.qw) AS dot
       |  FROM w JOIN qv USING (term) WHERE w.doc_id <> 0 GROUP BY w.doc_id),
       |cscore AS (
       |  SELECT dd.doc_id, ROUND(dd.dot / (norms.nrm * qn.qnrm), 4) AS sim
       |  FROM dots dd JOIN norms ON dd.doc_id = norms.doc_id CROSS JOIN qn),
       |ctop AS (SELECT doc_id, sim FROM cscore
       |         ORDER BY sim DESC, doc_id LIMIT $RrfDepth),
       |crank AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
       |            (ORDER BY sim DESC, doc_id) AS INT) AS rank_cos
       |          FROM ctop)""".stripMargin
}
