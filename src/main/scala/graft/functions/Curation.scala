package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Corpus-curation operators for LLM-data pipelines over
  * `documents` — the selection/weighting steps that sit between
  * cleaning (`Text`) and dedup (`Dedup`) in a pretraining pipeline:
  * per-domain quota caps, per-source token budgets, corpus-LM quality
  * scoring (the CCNet-style filter), and cross-document n-gram novelty
  * (the corpus-level cousin of `q_repetition`'s intra-doc rule).
  *
  * Scale shape shared by all four: no all-pairs joins, every shuffle
  * moves (key, count) partials map-side combined, and every window is
  * partitioned by a bounded key (source / doc), never global — so each
  * operator is a constant number of bounded shuffles over one linear
  * scan regardless of corpus size.
  */
object Curation extends QueryModule {

  /** Per-domain document cap (q_domain_cap). */
  val DomainCap = 10

  /** Token-entropy keep threshold (q_entropy_filter) — nats. ln(50) ≈
    * 3.9 is the all-distinct ceiling for this corpus's ~50-token docs;
    * 3.0 sits just under the observed median, so both verdicts are
    * well-populated at every SF.
    */
  val EntropyMin = 3.0

  /** Per-source token budget (q_token_budget). */
  val TokenBudget = 500

  /** q_epoch_schedule: training-budget multiple of the corpus (4× —
    * well into the repetition regime, so the temperature-boosted tail
    * languages schedule PAST the cap while the head stays under it:
    * every branch of the schedule is live at every SF) and the repeat
    * cap (≈4 epochs is where repeated data's value decays sharply —
    * Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models").
    */
  val EpochBudgetMult = 4L
  val MaxEpochs = 4L

  /** Span length for the substring-dedup pair (q_dup_span_coverage /
    * q_span_scrub) — 8-token grams, the substring-dedup unit.
    */
  val SpanLen = 8

  /** `(doc_id, tk)` token table — the ONE tokenize pass each span
    * query pins and reads everywhere (grams, position explode, token
    * counts). Re-tokenizing per consumer measured as a real cost in
    * this codebase (the shinglesFromTokens note).
    */
  private def tokTable(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), Text.tokens(col("text")).as("tk"))

  /** Per-start span grams `(doc_id, start, gram)` of a PINNED token
    * table. ONE implementation feeds both the coverage signal and the
    * scrub transform — CurationSpec asserts their per-doc agreement
    * (removed == covered), which only holds while the gram definition
    * cannot drift between them. Gram construction is
    * explode-the-starts THEN codegen'd slice+array_join — NOT a
    * transform() lambda building (start, gram) structs. Higher-order
    * functions evaluate interpreted, and a struct-building lambda
    * doing 8 element_at + concat per element measured 43 s for 236k
    * grams at sf0.1; this formulation is 0.2 s for identical output
    * (the q_doc_chunks shape — an instance of the per-element
    * re-evaluation trap family documented at q_top_bigrams). The
    * `size < SpanLen` guard is load-bearing: sequence(1, n-7) with
    * n < 8 would generate DESCENDING [1, 0, ...].
    */
  private def spanGrams(toks: org.apache.spark.sql.DataFrame) =
    toks
      .select(col("doc_id"),
        explode(when(size(col("tk")) < SpanLen, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("tk")) - (SpanLen - 1)))).as("start"),
        col("tk"))
      .select(col("doc_id"), col("start"),
        array_join(slice(col("tk"), col("start"), lit(SpanLen)), " ").as("gram"))

  /** The DuckDB twin of [[tokTable]] + [[spanGrams]] as a shared CTE
    * prefix (`t`, `g`) — generated once so the two span oracles can
    * never drift from each other.
    */
  private val spanGramCte: String =
    s"""t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '${Text.Ws}+'), x -> length(x) > 0) AS tk
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i AS start,
       |    array_to_string(list_slice(tk, i, i + ${SpanLen - 1}), ' ') AS gram
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - ${SpanLen - 2})) AS i FROM t))""".stripMargin

  override def queries: Map[String, Query] = Map(
    // [EXT] token-entropy quality gate — Shannon entropy of each
    // document's word distribution, the low-entropy filter that
    // catches keyword-stuffed / template / repeated-phrase pages the
    // length and punctuation ratios (q_quality_score) miss. Computed
    // as ln(n) − Σc·ln(c)/n over per-doc term counts — two hash
    // aggregates with map-side combine ((doc, term) then doc), state
    // bounded by per-doc vocabulary, no window and no shuffle of
    // documents themselves. Entropy rounds at 4dp (sum order differs
    // across engines); the keep flag compares the ROUNDED value, so
    // flag and score cannot disagree. Token-less docs keep a row
    // (left join, zeros) — the gate must emit a verdict per document,
    // not silently drop the empty ones.
    "q_entropy_filter" -> ((s, dir) => {
      import s.implicits._
      val tf = Tables.documents(s, dir)
        .select($"doc_id", explode(Text.tokens(lower($"text"))).as("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).cast("double").as("c"))
      val ent = tf.groupBy($"doc_id").agg(
        sum($"c").cast("long").as("n_toks"),
        count(lit(1)).as("n_distinct"),
        round(log(sum($"c")) - sum($"c" * log($"c")) / sum($"c"), 4).as("entropy"))
      Tables.documents(s, dir).select($"doc_id")
        .join(ent, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_toks", lit(0L)).as("n_toks"),
          coalesce($"n_distinct", lit(0L)).as("n_distinct"),
          coalesce($"entropy", lit(0.0)).as("entropy"),
          (coalesce($"entropy", lit(0.0)) >= EntropyMin).as("keep"))
        .orderBy($"doc_id")
    }),

    // [EXT] per-domain quota cap — crawl corpora are dominated by a few
    // boilerplate-heavy domains; cap each at N docs. Priority is the
    // md5 of doc_id (the q_shuffle_shard scheme), NOT rand(): the kept
    // set is a uniform sample, deterministic across runs and engines.
    // The window is partitioned by source, so the sort is per-domain
    // and the exchange is hash(source) — row_number never sees more
    // than one domain (the global-window trap q_share_of_total
    // documents). Skewed domains split fine under AQE: the window
    // input is (doc_id, md5) pairs, not documents.
    "q_domain_cap" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy($"h".asc, $"doc_id".asc)
      Tables.documents(s, dir)
        .select($"doc_id", $"source", md5($"doc_id".cast("string")).as("h"))
        .withColumn("pos", row_number().over(w))
        .filter($"pos" <= DomainCap)
        .select($"doc_id", $"source", $"pos")
        .orderBy($"source", $"pos")
    }),

    // [EXT] per-source token budget — compose a mixture by token
    // count, not document count (the unit training actually consumes):
    // within each source, take documents in priority order (longest
    // first, doc_id tiebreak) while the EXCLUSIVE running token count
    // is under budget, so the doc that crosses the boundary is kept
    // and every source lands within one doc of its budget. Computed
    // by [[tokenBudgetScaled]]: `source` is a low-cardinality key and
    // the budget filter is on a running SUM, not a rank — no
    // WindowGroupLimit rescue — so a plain per-source window would
    // put each source's whole corpus on one task. The chunked
    // PrefixScan keeps per-task work data-sized, and its chunk prune
    // drops every chunk whose starting offset is already over budget
    // before any per-row work: only the qualifying prefix of each
    // source is ever scanned.
    "q_token_budget" -> ((s, dir) =>
      tokenBudgetScaled(Tables.documents(s, dir))),

    // [EXT r16] dedup-aware token budget — q_token_budget charged
    // against the DEDUPED corpus: a budget computed over raw documents
    // double-counts every exact-duplicate group (q_dup_rate reports
    // how badly, per source), so sources padded with boilerplate
    // copies eat budget their unique content never fills. The keeper
    // per fingerprint group is exactly q_dedup_survivor's rule
    // (longest text, doc_id tiebreak — ONE survivorship convention
    // across the engine), and the budget then runs over survivors
    // only, same output contract as q_token_budget. Shape: the keeper
    // cut shuffles (fingerprint, length, id) triples — never
    // documents — and WindowGroupLimit bounds the per-group sort;
    // survivors return as a doc_id semi-join (at 100 TB both sides
    // co-partition on the id key), then the chunked PrefixScan
    // exactly as the base query.
    "q_token_budget_dedup" -> ((s, dir) =>
      tokenBudgetDeduped(Tables.documents(s, dir))),

    // [EXT r16] temperature-sampling audit — the rebalancing read on
    // top of q_source_mix's concentration report: proportional
    // sampling starves small sources, so multilingual/multi-source
    // pipelines sample source s with weight ∝ share^α (α<1 flattens
    // the mixture; XLM-R/mT5 popularized α≈0.3–0.7). α is fixed at
    // 1/2 — square-root sampling — because sqrt is IEEE-exact on
    // both engines while a general pow would hang cross-engine hash
    // parity on libm last-ulp agreement. Everything stays exactly
    // deterministic: the window totals are INTEGER sums over the
    // |sources|-bounded aggregate (never a float sum, whose partial
    // order differs across engines/partitionings), and doubles
    // appear only in the three final one-step divisions — w_rel =
    // sqrt(n_s/n_max) is the source's temperature weight relative to
    // the largest source, boost = sqrt(n_max/n_s) the up-sampling
    // factor vs proportional ("sample source s boost× more often
    // than its share").
    "q_mix_temperature" -> ((s, dir) => {
      import s.implicits._
      val bySrc = Tables.documents(s, dir)
        .select($"source", Text.tokenCount($"text").cast("long").as("tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"))
      val w = Window.partitionBy(lit(0))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // greatest(·, 1): a degenerate corpus whose documents all
      // tokenize to zero would otherwise divide by zero — Spark
      // yields Infinity there while DuckDB's `/` yields NULL, so the
      // cross-engine hash parity would hang on a corpus pathology
      // rather than the query. The oracle twin carries the same
      // GREATEST; on any real corpus (n_tokens ≥ 1) the guard is an
      // exact identity. Same discipline as q_vocab_coverage /
      // q_token_fertility.
      bySrc
        .withColumn("tt", greatest(sum($"n_tokens").over(w), lit(1L)))
        .withColumn("mx", greatest(max($"n_tokens").over(w), lit(1L)))
        .withColumn("nt", greatest($"n_tokens", lit(1L)))
        .select($"source", $"n_docs", $"n_tokens",
          round($"n_tokens".cast("double") / $"tt".cast("double"), 6)
            .as("share"),
          round(sqrt($"n_tokens".cast("double") / $"mx".cast("double")), 6)
            .as("w_rel"),
          round(sqrt($"mx".cast("double") / $"nt".cast("double")), 6)
            .as("boost"))
        .orderBy($"n_tokens".desc, $"source".asc)
    }),

    // [EXT r17] Epoch/repetition schedule — the data-constrained
    // planning step after q_mix_temperature chooses weights: given a
    // token budget of [[EpochBudgetMult]]× the corpus and sqrt
    // temperature weights, how many EPOCHS of each source fill its
    // share, capped at [[MaxEpochs]] (past ~4 repeats the marginal
    // value of repeated tokens decays sharply — Muennighoff et al.
    // 2023). EVERYTHING is integer arithmetic: weight =
    // floor(sqrt(n_s)) (one correctly-rounded IEEE sqrt, identical
    // across engines), target = budget·w_s div W (integer div),
    // epochs = ceil-div as (t + n − 1) div n, repeat_tokens =
    // min(epochs, cap)·n — no float ever reaches the output, so
    // cross-engine parity cannot hang on a boundary. Shape: one
    // map-combined per-source aggregate, then windows over the
    // |sources|-bounded result (the bounded-meta-window discipline).
    // At extreme scale the budget·weight product moves to
    // decimal(38,0) (long holds to ~10^18; 100 TB corpora sit around
    // 10^13 tokens × 10^6 weights — one cast away).
    "q_epoch_schedule" -> ((s, dir) => {
      import s.implicits._
      // keyed on LANG, not source: the corpus's languages are
      // genuinely skewed (en ≈ 2.5× the tail), so the sqrt flattening
      // has a live effect — small languages over-sample past the cap
      // while the head stays near proportional; per-language alpha is
      // also the published framing (XLM-R). The near-uniform source
      // axis would schedule a constant 2 epochs everywhere and prove
      // nothing.
      val bySrc = Tables.documents(s, dir)
        .select($"lang", Text.tokenCount($"text").cast("long").as("tok"))
        .groupBy($"lang")
        .agg(sum($"tok").as("toks"))
        // zero-token guard, the q_mix_temperature discipline
        .select($"lang", greatest($"toks", lit(1L)).as("n_tokens"))
      val w = Window.partitionBy(lit(0))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      bySrc
        .withColumn("weight",
          floor(sqrt($"n_tokens".cast("double"))).cast("long"))
        .withColumn("wt", sum($"weight").over(w))
        .withColumn("budget", sum($"n_tokens").over(w) * EpochBudgetMult)
        .withColumn("target_tokens",
          expr("(budget * weight) div wt"))
        .withColumn("epochs",
          expr("(target_tokens + n_tokens - 1) div n_tokens"))
        .select($"lang", $"n_tokens", $"weight", $"target_tokens",
          $"epochs",
          least($"epochs", lit(MaxEpochs)).as("epochs_capped"),
          (least($"epochs", lit(MaxEpochs)) * $"n_tokens").as("repeat_tokens"))
        .orderBy($"n_tokens".desc, $"lang".asc)
    }),

    // [EXT r13] Source mixture report — the audit companion of
    // q_domain_cap/q_token_budget/q_mix_weighted: per-source document
    // and TOKEN counts (tokens are the unit training consumes), each
    // source's token share, and the cumulative coverage in descending
    // token order ("the top k sources are X% of the mixture" — the
    // concentration read a pipeline does before choosing caps and
    // weights). One map-combined per-source aggregate; the
    // rank/cumulative window runs over the |sources|-bounded
    // aggregate, never rows (the q_degree_dist bounded-meta-window
    // argument). Exact integers until the two share divisions.
    "q_source_mix" -> ((s, dir) => {
      import s.implicits._
      val bySrc = Tables.documents(s, dir)
        .select($"source", Text.tokenCount($"text").cast("long").as("tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"))
      val tot = bySrc.agg(sum($"n_tokens").as("tt"))
      val ord = Window.partitionBy(lit(0))
        .orderBy($"n_tokens".desc, $"source".asc)
      bySrc
        .withColumn("rank", row_number().over(ord))
        .withColumn("cum", sum($"n_tokens").over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select($"rank", $"source", $"n_docs", $"n_tokens",
          round($"n_tokens".cast("double") / $"tt", 6).as("token_share"),
          round($"cum".cast("double") / $"tt", 6).as("cum_share"))
        .orderBy($"rank")
    }),

    // [EXT r13] Per-source distribution divergence: KL(source ‖
    // corpus) over unigram term distributions — "which source's
    // language is most unlike the mixture", the divergence companion
    // of q_source_mix's volume audit (DSIR and CCNet both rank data
    // by exactly this kind of LM divergence; here the statistic
    // itself is the product). KL = Σ_t p_s(t)·ln(p_s(t)/p_c(t)) ≥ 0,
    // finite by construction: every source term IS a corpus term, so
    // p_c > 0 wherever p_s > 0. One pinned tokenize pass feeds the
    // (source, term) and term counts; both aggregates are
    // vocabulary-bounded with map-side combine; the corpus total is a
    // one-row broadcast. The log ratio is ln((cs·nc)/(ns·cc)) with
    // the two products formed in exact doubles (all four factors <
    // 2⁵³ here; at trillions of tokens the products move to
    // decimal(38,0) like q_trend_fit's sums) — ONE libm call per
    // (source, term), then the contribution sum rounds at 6 dp (the
    // q_psi contract; summation order differs across engines).
    "q_source_kl" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val terms = Tables.documents(s, dir)
        .select($"source", explode(Text.tokens(lower($"text"))).as("term"))
        .transform(graft.Pins.ambient)
      val st = terms.groupBy($"source", $"term").agg(count(lit(1)).as("cs"))
        .transform(graft.Pins.ambient)
      val ct = terms.groupBy($"term").agg(count(lit(1)).as("cc"))
      val stot = st.groupBy($"source").agg(sum($"cs").as("ns"))
      val tot = terms.agg(count(lit(1)).as("nc"))
      st.join(ct, Seq("term"))
        .join(stot, Seq("source"))
        .crossJoin(broadcast(tot))
        .groupBy($"source")
        .agg(max($"ns").as("n_tokens"), count(lit(1)).as("n_terms"),
          round(sum(($"cs".cast("double") / $"ns")
            * log(($"cs".cast("double") * $"nc")
              / ($"ns".cast("double") * $"cc"))), 6).as("kl"))
        .orderBy($"kl".desc, $"source".asc)
    }),

    // [EXT] corpus unigram-LM scoring — the CCNet-style quality
    // signal: score each document by the mean log-probability of its
    // tokens under a unigram LM fit on the corpus itself. Three
    // bounded stages: (1) tokenize once (persisted — the count, total,
    // and scoring branches all read it), (2) vocabulary counts — agg
    // state bounded by vocab size, (3) term-key join back + per-doc
    // avg. The total-token count is a one-row aggregate broadcast into
    // the scoring projection (no global window). avg() summation order
    // differs across engines — the rounded score is the contract, the
    // same trick every float-emitting query here uses.
    "q_unigram_lm" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val terms = docs
        .select($"doc_id", explode(Text.tokens(lower($"text"))).as("term"))
        .transform(graft.Pins.ambient)
      val cnt = terms.groupBy($"term").agg(count(lit(1)).as("c"))
      val tot = terms.agg(count(lit(1)).as("n"))
      val scored = terms.join(cnt, Seq("term")).crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_toks"),
          avg(log($"c" / $"n".cast("double"))).as("s"))
      // Left join back to documents: a zero-token doc has no terms
      // rows, and silently dropping it would make the filter pass
      // empty docs through unscored.
      docs.select($"doc_id")
        .join(scored, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_toks", lit(0L)).cast("int").as("n_toks"),
          round(coalesce($"s", lit(0.0)), 4).as("lm_score"))
        .orderBy($"doc_id")
    }),

    // [EXT r18] CCNet head/middle/tail buckets — the shipped output
    // format of the CCNet pipeline (Wenzek et al. 2020): documents
    // tercile-bucketed per LANGUAGE by LM quality score, best third =
    // "head" (CCNet cuts by per-lang perplexity terciles; q_unigram_lm
    // is this repo's corpus-LM stand-in for the KenLM score, and its
    // rounded 4-dp score is the ordering contract so both engines rank
    // identically). Residual cross-engine risk, documented: the
    // ordering key is a ROUNDED float average, and the r18 q_cross_dup
    // incident showed the two engines can round the same double
    // differently when it sits exactly on a .00005 boundary. No
    // integer-exact form exists for a log-space mean (the jaccard
    // fix's scaled-integer trick needs terminating decimals), but the
    // boundary needs avg(ln c/n) to land within an ulp of k/20000 —
    // a measure-zero event for transcendental sums, unlike the
    // RATIONAL jaccard means that hit it in practice. If it ever
    // fires, the oracle hash catches it as a one-round mismatch.
    // Scored docs only — a zero-token doc has no LM
    // evidence to bucket (inner join, unlike q_unigram_lm's left).
    // Terciles are exact NTILE(3) semantics over (lm_score DESC,
    // doc_id): the Spark side computes the identical formula from the
    // range-chunked distributed PrefixScan — a plain per-lang window
    // would put each language's ENTIRE corpus slice on one task, the
    // scale-killer shape q_window_ntile's distributionScaled exists
    // for; the twin uses DuckDB's native NTILE (AggJoinWindowSpec pins
    // formula ≡ ntile). Output is |langs|×3 rows of exact integers
    // plus min/max of already-rounded scores — no float risk.
    "q_ccnet_buckets" -> ((s, dir) => graft.Pins.scoped { p =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val terms = docs
        .select($"doc_id", explode(Text.tokens(lower($"text"))).as("term"))
        .transform(graft.Pins.ambient)
      val cnt = terms.groupBy($"term").agg(count(lit(1)).as("c"))
      val tot = terms.agg(count(lit(1)).as("n"))
      val scored = terms.join(cnt, Seq("term")).crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_toks"),
          avg(log($"c" / $"n".cast("double"))).as("s0"))
      // Pinned: PrefixScan's range partitioner executes its child
      // TWICE (range-bound sampling job + real shuffle) — the staged
      // pattern from tokenBudgetScaled; without the pin the whole
      // tokenize+score pipeline runs twice over the data.
      val withLang = graft.Pins.ambient(
        docs.select($"doc_id", $"lang")
          .join(scored, Seq("doc_id"))
          .select($"doc_id", $"lang", $"n_toks", round($"s0", 4).as("lm_score")))
      graft.operators.PrefixScan.scan(withLang, group = Seq("lang"),
          sort = Seq($"lm_score".desc, $"doc_id".asc), weight = lit(1L), pins = p)
        .withColumn("b", graft.operators.PrefixScan.ntileOf(
          $"cum_before" + 1, $"grp_total", 3))
        .groupBy($"lang", $"b")
        .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_toks"),
          min($"lm_score").as("lo_score"), max($"lm_score").as("hi_score"))
        .select($"lang",
          when($"b" === 1, "head").when($"b" === 2, "middle")
            .otherwise("tail").as("bucket"),
          $"n_docs", $"n_toks", $"lo_score", $"hi_score")
        .orderBy($"lang", $"bucket")
    }),

    // [EXT] bigram-LM fluency score — the sequence-model upgrade of
    // q_unigram_lm's bag-of-words score, and the shape of perplexity
    // filtering (CCNet trains a KenLM and keeps low-perplexity text;
    // an n-gram LM over the corpus is that filter's SQL-expressible
    // core). Per doc: mean −ln p(wᵢ | wᵢ₋₁) over its bigram
    // occurrences, with add-1 smoothing p = (c(wᵢ₋₁wᵢ)+1)/(c(wᵢ₋₁)+V)
    // — context counts are unigram occurrence counts, V the unigram
    // vocabulary. One tokenize pass is PINNED and feeds all three
    // reads (bigram instances, bigram counts, context counts); counts
    // are vocabulary-bounded hash aggregates joined back on the
    // bigram/context keys with map-side combine; V and nothing else
    // arrives by one-row broadcast. Docs under 2 tokens keep a row
    // with nll 0 (the unigram_lm left-join rule). Lower = more
    // fluent; rounded 4dp (avg order differs across engines).
    "q_bigram_lm" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val toks = docs
        .select($"doc_id", Text.tokens(lower($"text")).as("tk"))
        .transform(graft.Pins.ambient)
      val inst = toks
        .select($"doc_id", explode(Text.bigrams($"tk")).as("bigram"))
        .withColumn("ctx", split($"bigram", " ").getItem(0))
      val bcnt = inst.groupBy($"bigram").agg(count(lit(1)).as("cb"))
      val ucnt = toks.select(explode($"tk").as("ctx"))
        .groupBy($"ctx").agg(count(lit(1)).as("cu"))
      val vocab = ucnt.agg(count(lit(1)).as("v"))
      val scored = inst
        .join(bcnt, Seq("bigram"))
        .join(ucnt, Seq("ctx"))
        .crossJoin(broadcast(vocab))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_big"),
          avg(-log(($"cb" + 1).cast("double") / ($"cu" + $"v").cast("double"))).as("s"))
      docs.select($"doc_id")
        .join(scored, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_big", lit(0L)).cast("int").as("n_big"),
          round(coalesce($"s", lit(0.0)), 4).as("nll"))
        .orderBy($"doc_id")
    }),

    // [EXT] cross-document n-gram novelty — the corpus-level
    // duplicated-n-gram rule (Gopher/Dolma): for each doc, the
    // fraction of its DISTINCT trigrams that appear in at least one
    // other doc. Distinct-within-doc first (array_distinct before the
    // explode) so a doc repeating its own phrase doesn't inflate the
    // trigram's document frequency — intra-doc repetition is
    // q_repetition's rule, this one measures cross-doc boilerplate.
    // Explode moves (doc, trigram) pairs; the df agg and the join are
    // both on the trigram key with map-side combine — never all-pairs.
    "q_ngram_novelty" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val tris = docs
        .select($"doc_id", Text.tokens($"text").as("tk"))
        .select($"doc_id", Text.trigrams($"tk").as("tg"))
        .select($"doc_id", explode(array_distinct($"tg")).as("tri"))
        .transform(graft.Pins.ambient)
      val df = tris.groupBy($"tri").agg(count(lit(1)).as("df"))
      val r = tris.join(df, Seq("tri"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tg"),
          sum(when($"df" >= 2, 1).otherwise(0)).as("n_dup"))
      docs.select($"doc_id")
        .join(r, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_tg", lit(0L)).cast("int").as("n_tg"),
          coalesce($"n_dup", lit(0L)).cast("int").as("n_dup"),
          when(coalesce($"n_tg", lit(0L)) === 0, lit(0.0))
            .otherwise(round($"n_dup".cast("double") / $"n_tg", 4))
            .as("dup_frac"))
        .orderBy($"doc_id")
    }),

    // [EXT] duplicated-span REMOVAL — the transform q_dup_span_coverage
    // is the signal for (Lee et al. '21 ExactSubstr dedup): delete
    // every token covered by a cross-doc duplicated 8-gram and emit
    // the scrubbed document (fingerprinted — the contract is the
    // rewritten CONTENT, compact enough to hash-compare). Stages share
    // the coverage query's shape (per-start grams, distinct-doc
    // counts, join back on the gram) and then materialize coverage as
    // POSITIONS: each duplicated start explodes to its 8 covered
    // positions (bounded ×SpanLen, distinct-folded), kept tokens are
    // the left-anti complement, and the doc reassembles with an
    // order-imposing sort INSIDE the aggregate (array_sort over
    // (pos, tok) structs — the q_session_seq trick, one exchange, no
    // second window pass). Fully-scrubbed and zero-token docs both
    // land on md5("") via the left join back to the corpus — present,
    // empty, distinguishable by n_tokens.
    "q_span_scrub" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val toks = tokTable(Tables.documents(s, dir))
        .transform(graft.Pins.ambient)
      val grams = spanGrams(toks)
        .transform(graft.Pins.ambient)
      val dupGrams = grams.select($"doc_id", $"gram").distinct()
        .groupBy($"gram").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2)
      val covered = grams.join(dupGrams, Seq("gram"))
        .select($"doc_id",
          explode(sequence($"start", $"start" + (SpanLen - 1))).as("pos"))
        .distinct()
      val kept = toks
        .select($"doc_id", posexplode($"tk").as(Seq("pos0", "tok")))
        .select($"doc_id", ($"pos0" + 1).as("pos"), $"tok")
        .join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(struct($"pos", $"tok"))),
              x => x.getField("tok")), " ").as("scrub"))
      toks.select($"doc_id", size($"tk").as("n_tokens"))
        .join(kept, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          ($"n_tokens" - coalesce($"n_kept", lit(0L))).cast("int").as("n_removed"),
          md5(coalesce($"scrub", lit(""))).as("scrub_fp"))
        .orderBy($"doc_id")
    }),

    // [EXT] duplicated-span coverage — the substring-dedup signal
    // (Lee et al. '21 "Deduplicating Training Data", RefinedWeb): for
    // each doc, the fraction of tokens covered by an 8-token span that
    // also appears in ANOTHER doc. Where q_ngram_novelty counts
    // distinct trigrams, this measures POSITIONAL coverage — every
    // occurrence of a shared span marks its token range, and
    // overlapping ranges union via the sorted-starts window trick
    // (contribution = min(spanLen, next_start - start); the last span
    // contributes spanLen) — no interval list ever materializes.
    // Stages: per-position grams (linear explode), distinct-doc counts
    // on the gram key (bounded agg, map-side combined), join back on
    // the gram, one per-doc window. Never all-pairs; the 100 TB move
    // is hashing the gram (xxhash64) instead of carrying the string,
    // kept as text here so the oracle can reproduce it exactly.
    //
    // Gram construction shared with q_span_scrub via [[spanGrams]] —
    // see the perf/trap notes there.
    "q_dup_span_coverage" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val toks = tokTable(Tables.documents(s, dir))
        .transform(graft.Pins.ambient)
      val grams = spanGrams(toks)
        .transform(graft.Pins.ambient)
      val docFreq = grams.select($"doc_id", $"gram").distinct()
        .groupBy($"gram").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"start")
      val covered = grams.join(docFreq, Seq("gram"))
        .filter($"df" >= 2)
        .withColumn("next", lead($"start", 1).over(w))
        .withColumn("contrib",
          when($"next".isNull, lit(SpanLen))
            .otherwise(least(lit(SpanLen), $"next" - $"start")))
        .groupBy($"doc_id")
        .agg(sum($"contrib").cast("long").as("n_covered"))
      // Token counts come from the token table, not from the gram
      // rows — a doc shorter than the span emits no grams but still
      // has tokens, and 0/0 vs 0/n is the difference between "empty"
      // and "short and clean".
      toks.select($"doc_id", size($"tk").as("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        // Coalesce BEFORE the ratio projection: inside one select an
        // expression referencing "n_covered" binds to the INPUT (null
        // for uncovered docs), not to a sibling alias — null/n would
        // silently null the coverage of every clean doc.
        .withColumn("n_covered", coalesce($"n_covered", lit(0L)))
        .select($"doc_id", $"n_tokens", $"n_covered",
          when($"n_tokens" === 0, lit(0.0))
            .otherwise(round($"n_covered".cast("double") / $"n_tokens", 4))
            .as("coverage"))
        .orderBy($"doc_id")
    }),

    // [EXT r13] Distinctive terms per source — weighted log-odds with
    // an informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    // "Fightin' Words"), the statistic that answers "what vocabulary
    // makes this source different from the rest" without the raw-
    // log-odds failure (rare terms dominate) or the TF-IDF failure
    // (frequency conflated with distinctiveness): each term's prior
    // α_t = α0·c_t/n is its CORPUS rate, the log-odds contrast is
    // source vs rest-of-corpus, and the z-score divides by the
    // estimator's variance ≈ 1/(y_s+α_t) + 1/(y_r+α_t) — the top-z
    // terms per source are its signature. Next to q_source_kl (one
    // number per source) this is the per-TERM attribution. Shape: the
    // same pinned tokenize, two vocabulary-bounded aggregates, the
    // |sources|-row and 1-row totals broadcast back, two ln calls per
    // (source, term); z rounds at 4 dp BEFORE the per-source top-
    // [[LogOddsTopK]] rank (term tiebreak — the rounded-boundary
    // contract), which Catalyst runs as WindowGroupLimit over the
    // vocabulary-bounded frame.
    "q_log_odds" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val terms = Tables.documents(s, dir)
        .select($"source", explode(Text.tokens(lower($"text"))).as("term"))
        .transform(graft.Pins.ambient)
      val st = terms.groupBy($"source", $"term").agg(count(lit(1)).as("ys"))
        .transform(graft.Pins.ambient)
      val ct = st.groupBy($"term").agg(sum($"ys").cast("long").as("yc"))
      val stot = broadcast(st.groupBy($"source").agg(sum($"ys").cast("long").as("ns")))
      val tot = terms.agg(count(lit(1)).as("n"))
      val a0 = lit(LogOddsPrior)
      val scored = st.join(ct, Seq("term"))
        .join(stot, Seq("source"))
        .crossJoin(broadcast(tot))
        .withColumn("at", a0 * $"yc" / $"n")
        .withColumn("yr", ($"yc" - $"ys").cast("double"))
        .withColumn("nr", ($"n" - $"ns").cast("double"))
        .withColumn("delta",
          log(($"ys" + $"at") / ($"ns" + a0 - $"ys" - $"at"))
            - log(($"yr" + $"at") / ($"nr" + a0 - $"yr" - $"at")))
        .withColumn("z", round($"delta"
          / sqrt(lit(1.0) / ($"ys" + $"at") + lit(1.0) / ($"yr" + $"at")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"z".desc, $"term".asc)
      scored.withColumn("rk", row_number().over(w))
        .filter($"rk" <= LogOddsTopK)
        .select($"source", $"rk", $"term", $"ys".as("n_src"), $"z")
        .orderBy($"source", $"rk")
    }),
  )

  /** q_log_odds Dirichlet prior mass (α0) and per-source report size. */
  val LogOddsPrior = 100.0
  val LogOddsTopK = 5

  /** The budget cut over [[graft.operators.PrefixScan.scan]]: chunked
    * exclusive running token count in (n_chars desc, doc_id) order
    * within each source, whole chunks pruned once their starting
    * offset is over budget. CurationSpec pins row-identical parity
    * against [[tokenBudgetWindowed]] plus invariance to the chunk
    * count.
    */
  private[graft] def tokenBudgetScaled(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    // Staged (pinned) BEFORE the scan: repartitionByRange runs a
    // sampling job that executes its whole child plan, so an
    // unpersisted input would pay the regex tokenization TWICE over
    // the corpus (once to sample the range bounds, once to shuffle).
    // Pinning the four small columns makes the sample pass the one
    // materialization and the shuffle a cache read — tokenize once.
    // Both this pin and the scan's range pin share one Pins scope,
    // released by the query's own first materialization.
    val pins = new graft.Pins
    val staged = pins(docs
      .select($"doc_id", $"source", $"n_chars",
        Text.tokenCount($"text").as("n_toks")))
    pins.releaseOnMaterialize(
    graft.operators.PrefixScan.scan(
        staged,
        group = Seq("source"),
        sort = Seq($"n_chars".desc, $"doc_id".asc),
        weight = $"n_toks",
        chunkPrune = _ < TokenBudget,
        pins = pins)
      .filter($"cum_before" < TokenBudget)
      .select($"doc_id", $"source", $"n_toks".cast("int").as("n_toks"),
        $"cum_before".cast("long").as("cum_before"))
      .orderBy($"source", $"doc_id"))
  }

  /** Dedup-aware budget (q_token_budget_dedup): the q_dedup_survivor
    * keeper cut (one row per fingerprint group — longest text, doc_id
    * tiebreak) composed with [[tokenBudgetScaled]]. The cut shuffles
    * (fp, len, id) triples only and WindowGroupLimit bounds the
    * per-group sort; survivors return by a doc_id semi-join.
    */
  private[graft] def tokenBudgetDeduped(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"fp")
      .orderBy($"len".desc, $"doc_id".asc)
    val keepers = docs
      .select($"doc_id", length($"text").as("len"),
        Text.fingerprint($"text").as("fp"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id")
    tokenBudgetScaled(docs.join(keepers, Seq("doc_id"), "left_semi"))
  }

  /** The single-window formulation — every source on one task;
    * retained as the independent reference implementation
    * CurationSpec checks [[tokenBudgetScaled]] against.
    */
  private[graft] def tokenBudgetWindowed(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"source")
      .orderBy($"n_chars".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select($"doc_id", $"source", $"n_chars",
        Text.tokenCount($"text").as("n_toks"))
      .withColumn("cum_before", coalesce(sum($"n_toks").over(w), lit(0L)))
      .filter($"cum_before" < TokenBudget)
      .select($"doc_id", $"source", $"n_toks".cast("int").as("n_toks"),
        $"cum_before".cast("long").as("cum_before"))
      .orderBy($"source", $"doc_id")
  }

  override def oracles: Map[String, String] = Map(
    "q_entropy_filter" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '${Text.Ws}+'),
         |    t -> length(t) > 0)) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |e AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
         |    COUNT(*) AS n_distinct,
         |    ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 4) AS entropy
         |  FROM tf GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(e.n_toks, 0) AS n_toks,
         |  COALESCE(e.n_distinct, 0) AS n_distinct,
         |  COALESCE(e.entropy, 0.0) AS entropy,
         |  COALESCE(e.entropy, 0.0) >= $EntropyMin AS keep
         |FROM documents d LEFT JOIN e USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q_bigram_lm" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(lower(text), '${Text.Ws}+'),
         |    t -> length(t) > 0) AS tk
         |  FROM documents),
         |inst AS (
         |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram, tk[i] AS ctx
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks)),
         |bcnt AS (SELECT bigram, COUNT(*) AS cb FROM inst GROUP BY bigram),
         |ucnt AS (SELECT ctx, COUNT(*) AS cu
         |         FROM (SELECT unnest(tk) AS ctx FROM toks) GROUP BY ctx),
         |vv AS (SELECT COUNT(*) AS v FROM ucnt),
         |sc AS (
         |  SELECT doc_id, COUNT(*) AS n_big,
         |    AVG(-ln(CAST(cb + 1 AS DOUBLE) / CAST(cu + v AS DOUBLE))) AS s
         |  FROM inst JOIN bcnt USING (bigram) JOIN ucnt USING (ctx)
         |  CROSS JOIN vv
         |  GROUP BY doc_id)
         |SELECT d.doc_id, CAST(COALESCE(sc.n_big, 0) AS INT) AS n_big,
         |  ROUND(COALESCE(sc.s, 0.0), 4) AS nll
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q_domain_cap" ->
      s"""WITH p AS (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS pos
         |  FROM documents)
         |SELECT doc_id, source, pos FROM p
         |WHERE pos <= $DomainCap ORDER BY source, pos""".stripMargin,
    "q_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(length(list_filter(string_split_regex(text, '${Text.Ws}+'),
         |      x -> length(x) > 0)) AS INT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_toks,
         |    CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, source, n_toks, cum_before FROM c
         |WHERE cum_before < $TokenBudget ORDER BY source, doc_id""".stripMargin,
    // The q_token_budget window over q_dedup_survivor's keeper set:
    // one row per fingerprint group (length DESC, doc_id tiebreak —
    // DuckDB length() counts characters like Spark's length), then
    // the identical running-sum budget cut.
    "q_token_budget_dedup" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |    row_number() OVER (PARTITION BY ${Text.fingerprintSql("text")}
         |      ORDER BY length(text) DESC, doc_id) AS rn
         |  FROM documents),
         |s AS (SELECT doc_id FROM k WHERE rn = 1),
         |t AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(length(list_filter(string_split_regex(text, '${Text.Ws}+'),
         |      x -> length(x) > 0)) AS INT) AS n_toks
         |  FROM documents JOIN s USING (doc_id)),
         |c AS (
         |  SELECT doc_id, source, n_toks,
         |    CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, source, n_toks, cum_before FROM c
         |WHERE cum_before < $TokenBudget ORDER BY source, doc_id""".stripMargin,
    "q_source_mix" ->
      s"""WITH t AS (
         |  SELECT source,
         |    CAST(length(list_filter(string_split_regex(text, '${Text.Ws}+'),
         |      x -> length(x) > 0)) AS BIGINT) AS tok
         |  FROM documents),
         |bysrc AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(tok) AS BIGINT) AS n_tokens
         |  FROM t GROUP BY source),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM bysrc),
         |r AS (
         |  SELECT source, n_docs, n_tokens,
         |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source) AS INT)
         |      AS rank,
         |    CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM bysrc)
         |SELECT rank, source, n_docs, n_tokens,
         |  ROUND(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
         |  ROUND(CAST(cum AS DOUBLE) / tt, 6) AS cum_share
         |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin,
    // All-integer twin: same floor(sqrt) weight, integer div target,
    // ceil-div epochs. DuckDB SUM(BIGINT) returns HUGEINT — cast back
    // so the arithmetic and output types stay BIGINT like Spark's.
    "q_epoch_schedule" ->
      s"""WITH t AS (
         |  SELECT lang,
         |    CAST(length(list_filter(string_split_regex(text, '${Text.Ws}+'),
         |      x -> length(x) > 0)) AS BIGINT) AS tok
         |  FROM documents),
         |bysrc AS (
         |  SELECT lang, GREATEST(CAST(SUM(tok) AS BIGINT), 1) AS n_tokens
         |  FROM t GROUP BY lang),
         |wts AS (
         |  SELECT lang, n_tokens,
         |    CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
         |  FROM bysrc),
         |sched AS (
         |  SELECT lang, n_tokens, weight,
         |    (CAST(SUM(n_tokens) OVER () AS BIGINT) * $EpochBudgetMult * weight)
         |      // CAST(SUM(weight) OVER () AS BIGINT) AS target_tokens
         |  FROM wts)
         |SELECT lang, n_tokens, weight, target_tokens,
         |  (target_tokens + n_tokens - 1) // n_tokens AS epochs,
         |  LEAST((target_tokens + n_tokens - 1) // n_tokens, $MaxEpochs)
         |    AS epochs_capped,
         |  LEAST((target_tokens + n_tokens - 1) // n_tokens, $MaxEpochs)
         |    * n_tokens AS repeat_tokens
         |FROM sched ORDER BY n_tokens DESC, lang""".stripMargin,
    // Integer window totals over the bounded per-source aggregate;
    // sqrt is IEEE-exact on both engines, doubles only in the final
    // divisions (the Spark side's determinism argument verbatim).
    "q_mix_temperature" ->
      s"""WITH t AS (
         |  SELECT source,
         |    CAST(length(list_filter(string_split_regex(text, '${Text.Ws}+'),
         |      x -> length(x) > 0)) AS BIGINT) AS tok
         |  FROM documents),
         |bysrc AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(tok) AS BIGINT) AS n_tokens
         |  FROM t GROUP BY source)
         |SELECT source, n_docs, n_tokens,
         |  ROUND(CAST(n_tokens AS DOUBLE)
         |    / CAST(GREATEST(SUM(n_tokens) OVER (), 1) AS DOUBLE), 6) AS share,
         |  ROUND(sqrt(CAST(n_tokens AS DOUBLE)
         |    / CAST(GREATEST(MAX(n_tokens) OVER (), 1) AS DOUBLE)), 6) AS w_rel,
         |  ROUND(sqrt(CAST(GREATEST(MAX(n_tokens) OVER (), 1) AS DOUBLE)
         |    / CAST(GREATEST(n_tokens, 1) AS DOUBLE)), 6) AS boost
         |FROM bysrc ORDER BY n_tokens DESC, source""".stripMargin,
    "q_source_kl" ->
      s"""WITH terms AS (
         |  SELECT source, unnest(list_filter(
         |    string_split_regex(lower(text), '${Text.Ws}+'),
         |    t -> length(t) > 0)) AS term
         |  FROM documents),
         |st AS (SELECT source, term, COUNT(*) AS cs FROM terms
         |       GROUP BY source, term),
         |ct AS (SELECT term, COUNT(*) AS cc FROM terms GROUP BY term),
         |stot AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM st
         |         GROUP BY source),
         |tot AS (SELECT COUNT(*) AS nc FROM terms)
         |SELECT st.source, MAX(stot.ns) AS n_tokens,
         |  COUNT(*) AS n_terms,
         |  ROUND(SUM((CAST(cs AS DOUBLE) / ns)
         |    * ln((CAST(cs AS DOUBLE) * nc)
         |      / (CAST(ns AS DOUBLE) * cc))), 6) AS kl
         |FROM st JOIN ct USING (term) JOIN stot USING (source)
         |CROSS JOIN tot
         |GROUP BY st.source ORDER BY kl DESC, source ASC""".stripMargin,
    "q_log_odds" ->
      s"""WITH terms AS (
         |  SELECT source, unnest(list_filter(
         |    string_split_regex(lower(text), '${Text.Ws}+'),
         |    t -> length(t) > 0)) AS term
         |  FROM documents),
         |st AS (SELECT source, term, COUNT(*) AS ys FROM terms
         |       GROUP BY source, term),
         |ct AS (SELECT term, CAST(SUM(ys) AS BIGINT) AS yc FROM st
         |       GROUP BY term),
         |stot AS (SELECT source, CAST(SUM(ys) AS BIGINT) AS ns FROM st
         |         GROUP BY source),
         |tot AS (SELECT COUNT(*) AS n FROM terms),
         |prep AS (
         |  SELECT st.source, st.term, st.ys, stot.ns, tot.n,
         |    $LogOddsPrior * ct.yc / tot.n AS at,
         |    CAST(ct.yc - st.ys AS DOUBLE) AS yr,
         |    CAST(tot.n - stot.ns AS DOUBLE) AS nr
         |  FROM st JOIN ct USING (term) JOIN stot USING (source)
         |  CROSS JOIN tot),
         |sc AS (
         |  SELECT source, term, ys,
         |    ROUND((ln((ys + at) / (ns + $LogOddsPrior - ys - at))
         |         - ln((yr + at) / (nr + $LogOddsPrior - yr - at)))
         |      / SQRT(1.0 / (ys + at) + 1.0 / (yr + at)), 4) AS z
         |  FROM prep)
         |SELECT source, CAST(rk AS INT) AS rk, term, ys AS n_src, z
         |FROM (SELECT source, term, ys, z,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |          ORDER BY z DESC, term) AS rk
         |      FROM sc)
         |WHERE rk <= $LogOddsTopK
         |ORDER BY source, rk""".stripMargin,
    "q_unigram_lm" ->
      s"""WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '${Text.Ws}+'), t -> length(t) > 0)) AS term
        |  FROM documents),
        |cnt AS (SELECT term, COUNT(*) AS c FROM terms GROUP BY term),
        |tot AS (SELECT COUNT(*) AS n FROM terms),
        |sc AS (
        |  SELECT t.doc_id, COUNT(*) AS n_toks,
        |    AVG(ln(cnt.c / CAST(tot.n AS DOUBLE))) AS s
        |  FROM terms t JOIN cnt USING (term), tot GROUP BY t.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(sc.n_toks, 0) AS INT) AS n_toks,
        |  ROUND(COALESCE(sc.s, 0.0), 4) AS lm_score
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_ccnet_buckets" ->
      s"""WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '${Text.Ws}+'), t -> length(t) > 0)) AS term
        |  FROM documents),
        |cnt AS (SELECT term, COUNT(*) AS c FROM terms GROUP BY term),
        |tot AS (SELECT COUNT(*) AS n FROM terms),
        |sc AS (
        |  SELECT t.doc_id, COUNT(*) AS n_toks,
        |    ROUND(AVG(ln(cnt.c / CAST(tot.n AS DOUBLE))), 4) AS lm_score
        |  FROM terms t JOIN cnt USING (term), tot GROUP BY t.doc_id),
        |b AS (
        |  SELECT d.lang, sc.n_toks, sc.lm_score,
        |    NTILE(3) OVER (PARTITION BY d.lang
        |      ORDER BY sc.lm_score DESC, sc.doc_id) AS b
        |  FROM sc JOIN documents d USING (doc_id))
        |SELECT lang,
        |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_toks,
        |  MIN(lm_score) AS lo_score, MAX(lm_score) AS hi_score
        |FROM b GROUP BY lang, b
        |ORDER BY lang, bucket""".stripMargin,
    "q_span_scrub" ->
      s"""WITH $spanGramCte,
         |dup AS (
         |  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
         |  GROUP BY gram HAVING COUNT(*) >= 2),
         |cov AS (
         |  SELECT DISTINCT g.doc_id, unnest(range(g.start, g.start + $SpanLen)) AS pos
         |  FROM g JOIN dup USING (gram)),
         |tok AS (
         |  SELECT doc_id, i AS pos, tk[i] AS tok
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM t)),
         |kept AS (
         |  SELECT k.doc_id, COUNT(*) AS n_kept,
         |    array_to_string(list(k.tok ORDER BY k.pos), ' ') AS scrub
         |  FROM tok k
         |  WHERE NOT EXISTS (SELECT 1 FROM cov
         |    WHERE cov.doc_id = k.doc_id AND cov.pos = k.pos)
         |  GROUP BY k.doc_id)
         |SELECT t.doc_id, CAST(len(tk) AS INT) AS n_tokens,
         |  CAST(len(tk) - COALESCE(kept.n_kept, 0) AS INT) AS n_removed,
         |  md5(COALESCE(kept.scrub, '')) AS scrub_fp
         |FROM t LEFT JOIN kept USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q_dup_span_coverage" ->
      s"""WITH $spanGramCte,
         |df AS (
         |  SELECT gram, COUNT(*) AS df
         |  FROM (SELECT DISTINCT doc_id, gram FROM g) GROUP BY gram),
         |d AS (
         |  SELECT g.doc_id, g.start,
         |    lead(g.start) OVER (PARTITION BY g.doc_id ORDER BY g.start) AS next
         |  FROM g JOIN df USING (gram) WHERE df.df >= 2),
         |c AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN next IS NULL THEN $SpanLen
         |                  ELSE LEAST($SpanLen, next - start) END) AS BIGINT) AS n_covered
         |  FROM d GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(tk) AS INT) AS n_tokens,
         |  CAST(COALESCE(c.n_covered, 0) AS BIGINT) AS n_covered,
         |  CASE WHEN len(tk) = 0 THEN 0.0
         |       ELSE ROUND(COALESCE(c.n_covered, 0) / CAST(len(tk) AS DOUBLE), 4)
         |  END AS coverage
         |FROM t LEFT JOIN c USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q_ngram_novelty" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '${Text.Ws}+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS tg
        |  FROM t),
        |e AS (SELECT doc_id, unnest(tg) AS tri FROM g),
        |df AS (SELECT tri, COUNT(*) AS df FROM e GROUP BY tri),
        |r AS (
        |  SELECT e.doc_id, COUNT(*) AS n_tg,
        |    SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS n_dup
        |  FROM e JOIN df USING (tri) GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(r.n_tg, 0) AS INT) AS n_tg,
        |  CAST(COALESCE(r.n_dup, 0) AS INT) AS n_dup,
        |  CASE WHEN COALESCE(r.n_tg, 0) = 0 THEN 0.0
        |       ELSE ROUND(CAST(r.n_dup AS DOUBLE) / r.n_tg, 4) END AS dup_frac
        |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id""".stripMargin,
  )
}
