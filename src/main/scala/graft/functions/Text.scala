package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Text analysis for LLM-data pipelines over `documents`:
  * tokenization + token counting, language-ID heuristic, quality
  * scoring (length / punctuation / stopword ratios), and document
  * fingerprinting (normalized md5). Everything is built from codegen'd
  * built-ins and higher-order array functions — per-row compute with
  * no shuffle, so it scales linearly with input splits at 100 TB.
  */
object Text extends QueryModule {

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  /** PMI collocation support floor and result size (q_pmi_bigrams). */
  val PmiMinCount = 5
  val PmiTopK = 20

  /** q_gopher_rules thresholds (the Gopher filter's structure with
    * corpus-adapted bounds — the published 50..100k-word window would
    * fail every fixture doc, proving nothing). Mean-length bounds are
    * INTEGER multipliers (the rule is evaluated as 2n ≤ Σlen ≤ 12n).
    */
  val GopherMinTokens = 20L
  val GopherMaxTokens = 1000L
  val GopherMinMeanLen = 2L
  val GopherMaxMeanLen = 12L
  val GopherMinStops = 2L

  /** Shard count for the deterministic shuffle (q_shuffle_shard) —
    * shared with its SQL twin by interpolation so the two cannot
    * drift. Must divide 2^32 for the md5-prefix mod to be exactly
    * uniform.
    */
  val ShuffleShards = 8

  /** The tokenizer's whitespace, spelled out as an explicit character
    * class shared VERBATIM by the Spark regexes and every DuckDB twin
    * (interpolated into the oracle SQL, so the two engines cannot
    * drift). Java's `\s` and RE2's `\s` disagree on U+000B vertical
    * tab — Java includes it, RE2 does not — so a document containing
    * `\x0B` would tokenize differently under the shorthand; the
    * explicit class pins ONE semantics on both sides.
    */
  private[graft] val WsChars: String = " \\t\\n\\x0B\\f\\r"

  /** `[ \t\n\x0B\f\r]` — the pinned whitespace class. */
  private[graft] val Ws: String = s"[$WsChars]"

  /** Whitespace tokens of a text column: split on runs of whitespace
    * and drop empties. (Round 2 split on a single space, so whitespace
    * runs inflated `n_tokens` and skewed `q_quality_score` — bug-
    * compatible with its oracle but wrong; this is now the ONE
    * tokenizer shared by the text metrics and the dedup suite.)
    */
  def tokens(text: Column): Column =
    filter(split(text, s"$Ws+"), t => length(t) > 0)

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Space-joined bigrams of a PROJECTED token-array attribute — the
    * [[trigrams]] rule at width 2, shared by the frequency count
    * (q_top_bigrams) and the association scorer (q_pmi_bigrams) so
    * the two queries' bigram semantics cannot drift.
    */
  def bigrams(tk: Column): Column =
    when(size(tk) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))

  /** Space-joined trigrams of a PROJECTED token-array attribute (pass
    * an attribute, not an inline tokenizer — the per-element
    * re-evaluation trap documented at q_top_bigrams). The ONE trigram
    * builder shared by the intra-doc repetition rule (q_repetition)
    * and the cross-doc novelty rule (q_ngram_novelty) — two
    * implementations here would let the two rules' n-gram semantics
    * silently diverge (the same drift the shared tokenizer exists to
    * prevent).
    */
  def trigrams(tk: Column): Column =
    when(size(tk) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
          element_at(tk, i + 2))))

  /** BPE-ish subword count approximation: word tokens + extra splits
    * on punctuation/digit boundaries via regex.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, s"[$WsChars.,;:!?]+|(?=\\d)"), t => length(t) > 0))

  /** Stopword hits among tokens. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit): _*)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Normalized fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the exact-dedup key that survives trivial reformatting.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), s"$Ws+", " ").cast("binary"))

  /** DuckDB twin of [[fingerprint]] — generated from the same pinned
    * whitespace class, so every oracle that fingerprints text shares
    * one spelling and cannot drift from the Spark side.
    */
  private[graft] def fingerprintSql(textExpr: String): String =
    s"md5(regexp_replace(lower($textExpr), '$Ws+', ' ', 'g'))"

  /** Language-ID heuristic: non-ASCII script detection first, then an
    * English stopword signal, else unknown. (A real n-gram model slots
    * in here; the heuristic keeps the operator SQL-expressible so the
    * DuckDB oracle can check the plumbing.)
    */
  def langGuess(text: Column): Column =
    when(text.rlike("[^\\x00-\\x7F]"), lit("other"))
      .when(text.rlike("(^| )(the|a|of|and|is)( |$)"), lit("en"))
      .otherwise(lit("unknown"))

  // (The quality formula lives INSIDE q_quality_score, over a
  // projected token attribute — a text-taking helper here would
  // re-tokenize per metric via per-element lambda re-evaluation, which
  // is exactly the trap the query's comment documents.)

  override def queries: Map[String, Query] = Map(
    // Tokens are projected ONCE to an attribute, then both counts read
    // it — the inline helpers would re-run the regex split per metric
    // (2-3× per row; same family as the per-element trap, see
    // Dedup.shinglesFromTokens).
    "q_text_tokens" -> ((s, dir) => {
      import s.implicits._
      // n_subwords is the BPE-ish count (extra splits at punctuation
      // and digit boundaries). Spark side uses a lookahead split;
      // DuckDB's RE2 has no lookahead, so the twin inserts a space
      // before each digit first — the same tokenization (the
      // TextDedupVectorSpec planted-text case pins the digit/punct
      // behavior).
      Tables.documents(s, dir)
        .select($"doc_id", tokens($"text").as("tk"),
          subwordCount($"text").as("n_subwords"),
          length($"text").cast("int").as("len"))
        .select($"doc_id",
          size($"tk").as("n_tokens"),
          $"n_subwords",
          size(filter($"tk", t => t.isin(Stopwords.map(lit): _*))).as("n_stop"),
          $"len")
        .orderBy($"doc_id")
    }),

    "q_lang_id" -> ((s, dir) => {
      import s.implicits._
      langIdentified(Tables.documents(s, dir)).orderBy($"doc_id")
    }),

    "q_quality_score" -> ((s, dir) => {
      import s.implicits._
      qualityScored(Tables.documents(s, dir)).orderBy($"doc_id")
    }),

    // [EXT r17] Composite rule-based quality gate — the Gopher-style
    // document filter (Rae et al. 2021 §A1.1: word-count bounds, mean
    // word length window, alphabetic-word fraction, stopword
    // requirement; thresholds adapted to this corpus so every rule has
    // a live failure mode). Unlike q_quality_score's continuous score,
    // this is the keep/drop REPORT a curation pipeline acts on: one
    // flag per rule plus the conjunction, so a rule-level failure
    // histogram is one aggregation away. Every rule is evaluated in
    // EXACT INTEGER arithmetic (mean-length window as 2n ≤ Σlen ≤ 12n,
    // alpha fraction as 5·a ≥ 4·n) — no division, so cross-engine
    // parity can never hang on a rounding boundary. Per-row projection
    // off one pruned scan, zero exchanges before the final sort; the
    // token array is projected to an attribute once (rule 1) and the
    // flags read it.
    "q_gopher_rules" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", tokens($"text").as("tk"))
        .select($"doc_id",
          size($"tk").cast("long").as("n_tokens"),
          length(array_join($"tk", "")).cast("long").as("sum_len"),
          size(filter($"tk", t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
          size(filter($"tk", t => t.isin(Stopwords.map(lit): _*)))
            .cast("long").as("n_stop"))
        .select($"doc_id", $"n_tokens",
          ($"n_tokens" >= GopherMinTokens && $"n_tokens" <= GopherMaxTokens)
            .cast("int").as("r_len"),
          ($"sum_len" >= $"n_tokens" * GopherMinMeanLen
            && $"sum_len" <= $"n_tokens" * GopherMaxMeanLen)
            .cast("int").as("r_mean_len"),
          ($"n_alpha" * 5 >= $"n_tokens" * 4).cast("int").as("r_alpha"),
          ($"n_stop" >= GopherMinStops).cast("int").as("r_stop"))
        .withColumn("pass",
          ($"r_len" === 1 && $"r_mean_len" === 1 && $"r_alpha" === 1
            && $"r_stop" === 1).cast("int"))
        .orderBy($"doc_id")
    }),

    "q_fingerprint" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }),

    // TF-IDF top terms: tf from an explode → (doc, term) hash count,
    // document frequency from a term-level aggregate, idf join kept on
    // the term key. Both shuffles move pre-aggregated (key, count)
    // partials — corpus size only grows the linear tokenize stage, the
    // agg state is bounded by vocabulary size.
    "q_tfidf" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // One job, no driver pre-pass: n_docs is a one-row aggregate
      // broadcast-cross-joined into the scoring projection, and the
      // tokenize stage (`terms`) is persisted so the tf and df branches
      // read it once instead of exploding the corpus twice.
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val terms = graft.Pins.ambient(
        docs.select($"doc_id", explode(tokens(lower($"text"))).as("term")))
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = terms.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      tf.join(df, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .select($"doc_id", $"term",
          round($"tf" * log(($"n_docs" + 1.0) / ($"df" + 1.0)), 4).as("tfidf"))
        .orderBy($"tfidf".desc, $"term".asc, $"doc_id".asc)
        .limit(50)
    }),

    // [EXT] sketch-based frequent terms — the 100 TB twin of exact
    // term counting (q_top_bigrams / q_tfidf's tf stage): approx_top_k
    // keeps a bounded sketch per partition and merges, so agg state is
    // O(maxItemsTracked) regardless of vocabulary size. With the
    // tracker sized above this corpus's vocabulary the counts are
    // exact (the spec pins that against the exact groupBy); at real
    // scale the tracker bounds memory and counts become approximate.
    // OVER-FETCH + exact re-rank (the standard sketch-top-k recipe):
    // the sketch returns its top 40, the total order (cnt DESC, term)
    // re-ranks and cuts to 20 — so which items the SKETCH puts at its
    // own boundary no longer matters, and the result is deterministic
    // whenever counts are exact. That determinism is what earns the
    // exact-count DuckDB oracle (round-10 verdict item 6); only a
    // >40-way tie straddling rank 20 could reintroduce sketch tie
    // order, and the parity spec would catch it before the oracle did.
    "q_approx_top_terms" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(explode(tokens(lower($"text"))).as("term"))
        .agg(expr("approx_top_k(term, 40, 10000)").as("top"))
        .select(explode($"top").as("t"))
        .select($"t.item".as("term"), $"t.count".cast("long").as("cnt"))
        .orderBy($"cnt".desc, $"term")
        .limit(20)
    }),

    // Pairwise edit distance (codegen'd levenshtein built-in) over
    // consecutive-id English docs — the string-similarity surface for
    // near-dup verification. Restricted to 50-char prefixes so the
    // O(m·n) DP stays bounded per pair; at scale the pairing comes
    // from LSH candidates, not id-adjacency.
    "q_edit_distance" -> ((s, dir) => {
      import s.implicits._
      val en = Tables.documents(s, dir).filter($"lang" === "en")
        .select($"doc_id", substring($"text", 1, 50).as("prefix"))
      val a = en.select($"doc_id".as("id_a"), $"prefix".as("pa"))
      val b = en.select(($"doc_id" - 1).as("id_a"), $"doc_id".as("id_b"), $"prefix".as("pb"))
      a.join(b, Seq("id_a"))
        .select($"id_a", $"id_b", levenshtein($"pa", $"pb").as("edit_dist"))
        .orderBy($"id_a")
    }),

    // Corpus-level bigram frequencies: per-row bigram arrays explode
    // into a hash-partition count — the shuffle moves (bigram, partial
    // count), map-side combined, so corpus size only grows the linear
    // explode stage.
    "q_top_bigrams" -> ((s, dir) => {
      import s.implicits._
      // Tokens are projected to an attribute BEFORE the bigram lambda
      // references them — a higher-order lambda re-evaluates captured
      // sub-expressions per element, so an inline tokenizer would
      // re-run the regex split twice per bigram (see
      // Dedup.shinglesFromTokens; this was 8-9 s of the round 2 bench).
      Tables.documents(s, dir)
        .select(tokens($"text").as("tk"))
        .select(explode(bigrams($"tk")).as("bigram"))
        .groupBy($"bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"bigram".asc)
        .limit(20)
    }),

    // [EXT] PMI collocation mining — rank corpus bigrams by pointwise
    // mutual information ln(p(ab) / (p(a)·p(b))), the phrase-mining
    // statistic (raw frequency surfaces "of the"; PMI surfaces pairs
    // that co-occur far above chance — the collocations worth
    // protecting from tokenizer splits or indexing as units). One
    // tokenize pass is PINNED (it feeds the unigram AND bigram
    // counts — the self-join rule); both count tables are
    // vocabulary-bounded hash aggregates, their totals one-row
    // broadcasts, and the two unigram probability lookups join on the
    // term key (vocabulary-sized — the planner broadcasts at any
    // realistic vocab, and AQE falls back to a shuffle join when a
    // web-scale vocab outgrows that). The support floor (cnt ≥
    // [[PmiMinCount]]) is applied BEFORE the joins — low-count pairs
    // both dominate PMI spuriously and inflate the join — and the
    // ratio is assembled in doubles with one fixed operand order so
    // both engines round the same 4dp value.
    "q_pmi_bigrams" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val tk = graft.Pins.ambient(Tables.documents(s, dir)
        .select(tokens($"text").as("tk")))
      val uni = tk.select(explode($"tk").as("t"))
        .groupBy($"t").agg(count(lit(1)).as("c"))
      val uniTot = uni.agg(sum($"c").cast("double").as("n"))
      val bi = tk.select(explode(bigrams($"tk")).as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("cab"))
      val biTot = bi.agg(sum($"cab").cast("double").as("nb"))
      bi.filter($"cab" >= PmiMinCount)
        .withColumn("t1", split($"bigram", " ").getItem(0))
        .withColumn("t2", split($"bigram", " ").getItem(1))
        .join(uni.select($"t".as("t1"), $"c".as("ca")), Seq("t1"))
        .join(uni.select($"t".as("t2"), $"c".as("cb")), Seq("t2"))
        .crossJoin(broadcast(uniTot)).crossJoin(broadcast(biTot))
        .select($"bigram", $"cab",
          round(log(($"cab".cast("double") * $"n" * $"n") /
            ($"nb" * $"ca".cast("double") * $"cb".cast("double"))), 4).as("pmi"))
        .orderBy($"pmi".desc, $"bigram".asc)
        .limit(PmiTopK)
    }),

    // [EXT] BPE pair counting — the inner loop of tokenizer TRAINING
    // at corpus scale: adjacent character-pair frequencies within
    // words (the statistic each BPE merge step maximizes; Sennrich
    // '16). Two linear explodes (words, then in-word pairs) into a
    // hash agg whose state is bounded by the pair vocabulary
    // (alphabet², independent of corpus size), TakeOrdered top-k.
    // Learning a full merge table = re-running this loop with the
    // previous merges applied — each iteration is this same bounded
    // shape, which is what makes corpus-scale BPE training feasible.
    // The `length < 2` guard is load-bearing: sequence(1, 0) would
    // generate DESCENDING [1, 0] (the q_dup_span_coverage trap), and
    // Column.substr keeps the pair extraction character-based, so
    // multi-byte scripts (the zh slice) count correctly in both
    // engines.
    "q_bpe_pairs" -> ((s, dir) => {
      import s.implicits._
      // Pair counts are additive over a word's occurrences, so the
      // pair explode runs over the word-frequency AGGREGATE
      // (vocabulary-bounded — the q_bpe_merges corpus-touched-once
      // trick, and SCALING.md's keyed-aggregate sketch rule) with
      // counts weighted by freq: identical totals, but the substr
      // transform + explode run |vocab| times, not once per word
      // occurrence. The measured win at sf0.1 is modest (quad 0.77 →
      // 0.69 s — the linear tokenize scan dominates at this corpus),
      // but at 100 TB the pair stage's row inflation rides on |vocab|
      // instead of the token stream.
      Tables.documents(s, dir)
        .select(explode(tokens(lower($"text"))).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("freq"))
        .select($"freq",
          explode(when(length($"w") < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), length($"w") - 1),
              i => $"w".substr(i, lit(2))))).as("pair"))
        .groupBy($"pair")
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"pair".asc)
        .limit(30)
    }),

    // [EXT] iterative BPE merge training — the full tokenizer-training
    // loop q_bpe_pairs is one round of (Sennrich '16): learn BpeRounds
    // merges, each round = count adjacent symbol pairs, adopt the most
    // frequent, rewrite the vocabulary. See [[bpeMerges]] for why every
    // round is vocabulary-sized, not corpus-sized, and how the greedy
    // merge stays codegen'd.
    "q_bpe_merges" -> ((s, dir) => bpeMerges(Tables.documents(s, dir))),

    // [EXT] BPE ENCODE — the apply half of the tokenizer (train with
    // q_bpe_merges, then tokenize the corpus with the learned table):
    // per doc, the whitespace-token count and the subword-symbol count
    // after all merges. DICTIONARY-CODED for scale: merges apply to
    // the DISTINCT-WORD vocabulary (bounded, ≪ corpus — the same
    // reason training is vocab-sized per round), one broadcast one-row
    // join per learned step, and per-doc counts come from joining the
    // tiny (word → n_sym) table back to the corpus word stream — the
    // corpus is touched exactly twice (tokenize, join), never
    // re-rewritten per merge.
    "q_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      docs.select($"doc_id", explode(tokens(lower($"text"))).as("w"))
        .join(bpeEncodedWords(docs), Seq("w"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"n_sym").as("n_symbols"))
        .orderBy($"doc_id")
    }),

    // [EXT r18] BPE compression fairness by language — the
    // multilingual tokenizer-equity audit (Petrov et al. 2023,
    // "Language Model Tokenizers Introduce Unfairness Between
    // Languages"): after training the corpus BPE (the q_bpe_merges
    // chain), how many symbols per word and characters per symbol
    // each LANGUAGE pays. A language whose words stay near-character
    // fragments pays proportionally more sequence length — so more
    // compute and less effective context — for the same text; this
    // report is the number that justifies per-language vocabulary
    // budgets. Same dictionary-coded shape as q_bpe_encode (merges
    // train once, encode the DISTINCT-word vocabulary, join the tiny
    // word→n_sym table back to the lang-carrying word stream), ending
    // in ONE |langs|-bounded aggregate. Character counts reuse the
    // proven code-point split (bpeVocab's v0 identity, hash-matched
    // across engines since r11, surrogate-safe) rather than length()
    // — DuckDB's length counts grapheme clusters, not code points.
    // Exact integer sums; the two 4-dp ratios are half-up INTEGER
    // divisions (the q_cross_dup rounding rule — both engines' ROUND
    // disagree on .00005-boundary quotients, and ratios of exact
    // longs land there in practice). No divide guards: a lang group
    // exists only with ≥1 word, and BPE only merges, so
    // n_symbols ≥ n_words ≥ 1 by construction (the spec pins both).
    "q_bpe_fairness" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      docs.select($"lang", explode(tokens(lower($"text"))).as("w"))
        .join(bpeEncodedWords(docs), Seq("w"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_words"),
          sum($"n_chr").as("n_chars"),
          sum($"n_sym").as("n_symbols"))
        .select($"lang", $"n_words", $"n_chars", $"n_symbols",
          (expr("(2 * 10000 * n_symbols + n_words) div (2 * n_words)")
            / 10000.0).as("syms_per_word"),
          (expr("(2 * 10000 * n_chars + n_symbols) div (2 * n_symbols)")
            / 10000.0).as("chars_per_sym"))
        .orderBy($"lang")
    }),

    // [EXT r19] Per-language vocabulary-budget allocation — the ACTION
    // the q_bpe_fairness audit exists to drive: split a fixed
    // vocabulary budget across languages proportional to their
    // FERTILITY EXCESS (n_symbols − n_words — the count of extra
    // subword fragments the corpus tokenizer costs that language; 0
    // means every word is already one symbol and extra vocab buys
    // nothing). Apportionment is Hamilton largest-remainder in exact
    // integer arithmetic (the q_allocation machinery: B·x div N floors
    // first, remaining units to the largest B·x mod N, lang ASC
    // tiebreak), so Σ alloc = budget EXACTLY whenever any excess
    // exists. Same dictionary-coded scale shape as q_bpe_fairness
    // (corpus touched twice), then every windowed stage runs over the
    // |langs|-row aggregate. Zero-total-excess degenerates to the
    // all-zero share (the nn > 0 gate on the remainder top-up: with no
    // signal anywhere, no language earns a unit) — deterministic on
    // both engines, unreachable on real text (BPE under-merges
    // SOMETHING); the greatest(nn,1) guard only exists for it.
    "q_vocab_budget" -> ((s, dir) => {
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      // Unlike q_allocation's crossJoin(broadcast(tot)) shape, the
      // totals here are GLOBAL WINDOWS over the |langs|-row aggregate:
      // each broadcast is a sequential job barrier on top of the BPE
      // chain's ~40 jobs (measured +9 jobs / +0.9 s warm at sf0.1 for
      // the broadcast spelling), while three window stages over ≤
      // |langs| rows are one task. The single-partition WindowExec
      // warning is the |langs|-bounded case it exists to allow.
      docs.select($"lang", explode(tokens(lower($"text"))).as("w"))
        .join(bpeEncodedWords(docs), Seq("w"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_words"), sum($"n_sym").as("n_symbols"))
        .withColumn("excess", $"n_symbols" - $"n_words")
        .withColumn("nn", sum($"excess").over(W.partitionBy()))
        .withColumn("base", expr(s"($VocabBudget * excess) div greatest(nn, 1)"))
        .withColumn("rem", expr(s"($VocabBudget * excess) % greatest(nn, 1)"))
        .withColumn("used", sum($"base").over(W.partitionBy()))
        .withColumn("rk", row_number().over(W.orderBy($"rem".desc, $"lang".asc)))
        .select($"lang", $"n_words", $"n_symbols", $"excess",
          ($"base" + when($"nn" > 0 && $"rk" <= lit(VocabBudget.toLong) - $"used", 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy($"lang")
    }),

    // [EXT] Context-window chunking — the step that turns a cleaned
    // corpus into training rows: fixed-size token windows (50 tokens)
    // with overlap (stride 40 → 10-token overlap) so no span is lost
    // at a chunk boundary. Pure per-row generate + slice over the
    // projected token attribute: no shuffle, output rows ∝ tokens /
    // stride, linear at any corpus size. Empty docs yield one empty
    // chunk (sequence(0,0) = [0]) — deterministic, and the oracle
    // reproduces it.
    //
    // The last window start is bounded by size - overlap - 1, not
    // size - 1: a start within the final `overlap` tokens would emit a
    // chunk that is a strict SUBSET of the previous one (the previous
    // chunk already reached the end of the doc) — wholly duplicated
    // training rows for every doc whose length mod stride lands in the
    // overlap.
    "q_doc_chunks" -> ((s, dir) =>
      chunked(Tables.documents(s, dir))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // [EXT] PII redaction — scrub emails/phone numbers before a corpus
    // ships to training. The synthetic docs carry no PII, so each doc
    // is salted with a deterministic email + phone built from doc_id
    // (identically in the oracle) — the redaction is then verified on
    // text that genuinely contains matches. Per-row regex only
    // (codegen'd), no shuffle; counts come from regexp_extract_all and
    // the scrubbed text is fingerprinted for the compare.
    "q_pii_redact" -> ((s, dir) =>
      piiRedacted(Tables.documents(s, dir)).orderBy(col("doc_id"))),

    // [EXT] polynomial rolling-hash fingerprint — the incremental-
    // update cousin of the md5 fingerprint (q_fingerprint): h_i =
    // (h_{i-1}·31 + c_i) mod p, foldable per row with no shuffle and
    // extendable to windowed substring hashes (Rabin–Karp). Text is
    // canonicalized to printable ASCII first so both engines fold the
    // identical code-point sequence (Java split("") iterates UTF-16
    // code units, DuckDB slices characters — they diverge outside
    // ASCII). The modulus keeps every intermediate below 2^35:
    // Spark longs would wrap silently on overflow where DuckDB BIGINTs
    // raise — staying small keeps the twins exactly comparable.
    // [EXT] sequence packing — assign each chunk to a fixed-budget
    // training sequence ([[PackBudget]] tokens) by exclusive running
    // token count per doc: seq_id = floor(tokens_before / budget). The
    // distributed-friendly approximation of greedy bin packing (greedy
    // is inherently sequential; per-doc running sums are one window
    // pass, partitioned by doc — no cross-doc coordination, which is
    // also why it scales: packing decisions never leave a partition).
    "q_seq_pack" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"chunk_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      chunked(Tables.documents(s, dir))
        .select($"doc_id", $"chunk_id", $"n_chunk_tokens")
        .withColumn("cum_before",
          coalesce(sum($"n_chunk_tokens").over(w), lit(0L)).cast("long"))
        .withColumn("seq_id",
          floor($"cum_before" / PackBudget.toDouble).cast("int"))
        .orderBy($"doc_id", $"chunk_id")
    }),

    // [EXT] intra-document repetition filter (the Gopher/C4-style
    // quality rule): fraction of duplicated trigrams per doc —
    // boilerplate and generation loops repeat phrasing, organic text
    // doesn't. Pure per-row array arithmetic over the projected token
    // attribute (build trigrams once, count total vs distinct): no
    // shuffle, linear in corpus size. The keep decision compares the
    // ROUNDED ratio in both engines, so the threshold boundary can't
    // flip on a last-ulp division difference.
    "q_repetition" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", tokens($"text").as("tk"))
        .select($"doc_id", trigrams($"tk").as("tg"))
        .select($"doc_id", size($"tg").as("n_tri"), size(array_distinct($"tg")).as("n_uniq"))
        // A doc too short to HAVE trigrams repeats nothing → ratio 0
        // (length-based filtering is a separate rule); 1 - 0/1 would
        // have silently classified every short doc as maximally
        // repetitive.
        .withColumn("dup_ratio",
          when($"n_tri" === 0, lit(0.0))
            .otherwise(round(lit(1.0) - $"n_uniq" / $"n_tri".cast("double"), 4)))
        .withColumn("kept", $"dup_ratio" <= 0.2)
        .orderBy($"doc_id")
    }),

    // [EXT] deterministic shuffle + shard — the write-side step between
    // curation and training: every doc gets a shard and a position
    // within it, both pure functions of doc_id (md5-derived), so the
    // "random" training order is reproducible across runs and engines
    // and stable under incremental refresh. Scale shape: the naive
    // global row_number over the hash order is a SINGLE-REDUCER window
    // (the exact anti-pattern q_share_of_total documents) — sharding
    // first bounds every window to one shard, so the sort is
    // per-shard, the exchange is hash(shard), and N shards = N
    // training files written in parallel.
    "q_shuffle_shard" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard").orderBy($"h".asc, $"doc_id".asc)
      // Shard comes from the md5 prefix DIRECTLY (2^32 % nShards = 0 →
      // exactly uniform); routing through the mod-100 hashBucket gave
      // shards 0-3 a built-in ~8% size advantage (13 vs 12 of the 100
      // residues — a by-construction straggler, not hash variance) and
      // hashed doc_id a second time.
      Tables.documents(s, dir)
        .select($"doc_id", md5($"doc_id".cast("string")).as("h"))
        .withColumn("shard",
          (conv(substring($"h", 1, 8), 16, 10).cast("long") % ShuffleShards).cast("int"))
        .withColumn("pos", row_number().over(w))
        .select($"doc_id", $"shard", $"pos")
        .orderBy($"shard", $"pos")
    }),

    // [EXT] weighted dataset mixing — compose a training corpus from
    // sources at different sampling rates (the standard pretraining
    // mixture step: upweight curated sources, downsample the crawl).
    // Membership is a deterministic md5 hash bucket per doc (the
    // q_train_split scheme), NOT rand(): the mix is reproducible
    // across runs, engines, and incremental refreshes — a re-run with
    // more data keeps every previously selected doc. Per-row filter,
    // no shuffle; at 100 TB this is a scan that emits `weight`% of
    // each source with zero coordination.
    "q_mix_weighted" -> ((s, dir) => {
      import s.implicits._
      val weight =
        when($"source".isin("src0", "src1", "src2", "src3", "src4"), 100)
          .when($"source".isin("src5", "src6", "src7", "src8", "src9"), 50)
          .otherwise(20)
      Tables.documents(s, dir)
        .select($"doc_id", $"source",
          Buckets.hashBucket($"doc_id").as("bucket"),
          weight.as("weight"))
        .filter($"bucket" < $"weight")
        .orderBy($"doc_id")
    }),

    "q_rolling_hash" -> ((s, dir) => {
      import s.implicits._
      // codegen'd byte-fold (graft.plans.RollingHash); ExpressionSpec
      // pins exact agreement with the per-character HOF formulation on
      // the ASCII-canonicalized input.
      val canon = regexp_replace($"text", "[^\\x20-\\x7E]", "")
      Tables.documents(s, dir)
        .select($"doc_id", canon.as("s"))
        .select($"doc_id", call_function(graft.plans.RollingHash.FunctionName, $"s").as("rhash"))
        .orderBy($"doc_id")
    }),

    // [EXT r13] Language-ID confusion matrix — the accuracy report of
    // the q_lang_id heuristic against the labeled `lang` column: per
    // (actual, guessed) cell, the count and its share of the actual
    // language's row (recall when the guess matches). q_lang_id ships
    // the per-doc guesses; this is the evaluation that says whether
    // they can gate a mixture (a classifier you haven't scored against
    // labels is a rumor). One groupBy on a ≤|langs|×3 key — the share
    // window runs over that bounded aggregate, never the corpus.
    "q_lang_confusion" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"lang", langGuess($"text").as("lang_guess"))
        .groupBy($"lang", $"lang_guess")
        .agg(count(lit(1)).as("n"))
        .withColumn("row_share", round($"n" / sum($"n").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"lang"))
          .cast("double"), 4))
        .orderBy($"lang", $"lang_guess")
    }),

    // [EXT r13] Packing-efficiency report — the utilization audit of
    // the q_seq_pack assignment: per packed sequence the chunk tokens
    // sum, then ONE global row: sequence count, token total, mean
    // tokens per [[PackBudget]]-token sequence, utilization (a
    // sequence's tokens can exceed the budget — the chunk that crosses
    // the boundary closes it — so utilization is honest, not clamped),
    // and the underfull share (< 80% of budget — each doc's LAST
    // sequence is the padding the packer exists to amortize). This is
    // the number that decides whether the chunk/budget geometry wastes
    // accelerator hours. Shape: the q_seq_pack pipeline, one
    // map-side-combined (doc, seq) aggregate, one 1-row global
    // aggregate; exact integer sums, doubles only in the final ratios.
    "q_pack_efficiency" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"chunk_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val seqs = chunked(Tables.documents(s, dir))
        .select($"doc_id", $"chunk_id", $"n_chunk_tokens")
        .withColumn("cum_before",
          coalesce(sum($"n_chunk_tokens").over(w), lit(0L)).cast("long"))
        .withColumn("seq_id", floor($"cum_before" / PackBudget.toDouble).cast("int"))
        .groupBy($"doc_id", $"seq_id")
        .agg(sum($"n_chunk_tokens").cast("long").as("seq_tokens"))
      seqs.agg(
          count(lit(1)).as("n_seqs"),
          sum($"seq_tokens").cast("long").as("n_tokens"),
          count(when($"seq_tokens" < (PackBudget * 4 / 5), lit(1)))
            .as("n_underfull"))
        // nullif(0) guards the empty corpus: ANSI division by a zero
        // sequence count must yield a NULL report row, not an error.
        .select($"n_seqs", $"n_tokens", $"n_underfull",
          round($"n_tokens" / nullif(
            ($"n_seqs" * PackBudget.toLong).cast("double"), lit(0.0)), 4)
            .as("utilization"),
          round($"n_underfull" / nullif($"n_seqs".cast("double"), lit(0.0)), 4)
            .as("underfull_share"))
    }),

    // [EXT r14] Tokenizer fertility by language — subwords-per-token
    // and bytes-per-token per guessed-language bucket, the multilingual
    // tokenizer-efficiency audit (a language with high fertility pays
    // more sequence budget per word — the standard signal that a
    // tokenizer's vocabulary underserves a script, cf. the fertility
    // tables in multilingual-tokenizer evaluations). Subwords use the
    // q_text_tokens BPE-ish proxy and the q_lang_id bucket — the same
    // SQL-expressible stand-ins those operators document — so the
    // whole audit is oracle-checked; a trained tokenizer/classifier
    // slots into the same frame. Shape: one linear scan (three
    // codegen'd per-row counters, no shuffle until the ≤|langs|-key
    // aggregate), exact integer sums, doubles only in the final two
    // ratios. At 100 TB this is a map-combined scan like
    // q_text_tokens; the aggregate state is three rows.
    "q_token_fertility" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(langGuess($"text").as("lang_guess"),
          tokenCount($"text").as("nt"),
          subwordCount($"text").as("nsw"),
          octet_length($"text").cast("long").as("nb"))
        .groupBy($"lang_guess")
        .agg(count(lit(1)).as("n_docs"),
          sum($"nt").cast("long").as("n_tokens"),
          sum($"nsw").cast("long").as("n_subwords"),
          sum($"nb").cast("long").as("n_bytes"))
        .select($"lang_guess", $"n_docs", $"n_tokens", $"n_subwords",
          $"n_bytes",
          round($"n_subwords".cast("double") /
            greatest($"n_tokens", lit(1L)).cast("double"), 4).as("fertility"),
          round($"n_bytes".cast("double") /
            greatest($"n_tokens", lit(1L)).cast("double"), 4)
            .as("bytes_per_token"))
        .orderBy($"lang_guess")
    }),

    // [EXT r14] Truncation-loss profile — for each candidate
    // max-sequence-length budget, the share of corpus tokens lost and
    // documents cut if every document truncates there: THE curve read
    // before fixing a training sequence length (too short wastes the
    // corpus tail, too long wastes padding — q_pack_efficiency's
    // utilization is the other half of that trade). Shape: one
    // tokenize scan projected to a per-doc count, replicated across
    // the [[TruncBudgets]] rows by a broadcast cross join (the count
    // is computed BEFORE the join, so the regex runs once per doc,
    // not once per budget), then a |budgets|-key aggregate; exact
    // integer sums, doubles only in the final shares.
    "q_trunc_loss" -> ((s, dir) => {
      import s.implicits._
      val n = Tables.documents(s, dir).select(tokenCount($"text").as("n"))
      val budgets = TruncBudgets.toDF("budget")
      n.crossJoin(broadcast(budgets))
        .groupBy($"budget")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n").cast("long").as("n_tokens"),
          sum(when($"n" > $"budget", 1L).otherwise(0L)).as("n_docs_truncated"),
          sum(greatest($"n" - $"budget", lit(0))).cast("long")
            .as("n_tokens_lost"))
        .select($"budget", $"n_docs_truncated", $"n_tokens_lost",
          round($"n_tokens_lost".cast("double") /
            greatest($"n_tokens", lit(1L)).cast("double"), 4)
            .as("token_loss_share"),
          round($"n_docs_truncated".cast("double") /
            greatest($"n_docs", lit(1L)).cast("double"), 4)
            .as("doc_trunc_share"))
        .orderBy($"budget")
    }),

    // [EXT r16] vocabulary coverage / byte-fallback audit — the OOV
    // companion of q_token_fertility: fix the vocabulary at the top
    // [[VocabSize]] corpus terms (cnt DESC, term ASC — the
    // q_approx_top_terms total order, deterministic at the boundary)
    // and report, per guessed language, how much of the token stream
    // that vocabulary covers and what a byte-fallback tokenizer would
    // spend on the rest: an in-vocab occurrence encodes as ONE
    // symbol, an OOV occurrence as its UTF-8 byte count (the
    // SentencePiece byte-fallback contract), so byte_fallback_share
    // is the share of the encoded stream burned on fallback — high
    // for a language means the vocabulary underserves that script
    // (fertility says the same thing from the subword side). Shape:
    // ONE pinned tokenize pass feeds both the vocabulary aggregate
    // (vocabulary-bounded, map-side combined) and the coverage join;
    // the top-V cut is a TakeOrdered over the term aggregate, and the
    // ≤[[VocabSize]]-row vocabulary arrives at the stream by
    // BROADCAST — the corpus-sized side never reshuffles. Integer
    // counts stay exact; doubles only in the two final shares.
    "q_vocab_coverage" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      // lang_guess is projected to an attribute BELOW the explode —
      // in one select the Project lands ABOVE the Generate and the
      // two full-text rlikes run once per TERM row instead of once
      // per doc (measured 2.8 → 1.1 s warm at sf0.1; the SCALING.md
      // rule-1 trap in its Generate form).
      val terms = graft.Pins.ambient(Tables.documents(s, dir)
        .select(langGuess($"text").as("lang_guess"),
          tokens(lower($"text")).as("tk"))
        .select($"lang_guess", explode($"tk").as("term")))
      val vocab = terms.groupBy($"term").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"term".asc).limit(VocabSize)
        .select($"term", lit(1).as("iv"))
      terms.join(broadcast(vocab), Seq("term"), "left")
        .groupBy($"lang_guess")
        .agg(count(lit(1)).as("n_tokens"),
          count(when($"iv".isNull, lit(1))).as("n_oov"),
          coalesce(sum(when($"iv".isNull, octet_length($"term"))), lit(0))
            .cast("long").as("n_oov_bytes"))
        .select($"lang_guess", $"n_tokens", $"n_oov", $"n_oov_bytes",
          round($"n_oov".cast("double") /
            greatest($"n_tokens", lit(1L)).cast("double"), 4).as("oov_rate"),
          round($"n_oov_bytes".cast("double") /
            greatest($"n_tokens" - $"n_oov" + $"n_oov_bytes", lit(1L))
              .cast("double"), 4).as("byte_fallback_share"))
        .orderBy($"lang_guess")
    }),
  )

  /** q_seq_pack / q_pack_efficiency token budget per packed sequence. */
  val PackBudget = 512

  /** q_trunc_loss candidate max-sequence-length budgets (interpolated
    * into the twin SQL so the two engines cannot desync). The largest
    * equals [[PackBudget]] on purpose: the loss curve's last point is
    * the budget the packer actually uses.
    */
  val TruncBudgets: Seq[Int] = Seq(64, 128, 256, PackBudget)

  /** q_vocab_coverage vocabulary size — the top-V corpus terms kept
    * in-vocabulary. The fixture corpus draws from a ~31-term
    * generator vocabulary (probed at all three SFs), so V must
    * undercut it for the audit to have a real OOV tail; 16 leaves
    * about half the term stream out-of-vocabulary, including a
    * deterministic count-tie at the boundary that exercises the
    * (cnt DESC, term ASC) total order. Interpolated into the twin
    * SQL so the engines share the cut.
    */
  val VocabSize = 16

  /** Merge rounds learned by q_bpe_merges. */
  val BpeRounds = 6

  /** q_vocab_budget's vocabulary units to apportion across languages
    * (a per-language share of a production tokenizer's slot budget).
    */
  val VocabBudget = 4096

  /** Distributed BPE merge training: `rounds` iterations of
    * count-pairs → adopt-argmax → rewrite, returning the learned merge
    * table `(step, left, right, cnt)`.
    *
    * The corpus is touched ONCE — the word-frequency aggregation —
    * and every round after that runs over the VOCABULARY (one row per
    * distinct word, frequency-weighted), the classic trick that makes
    * corpus-scale BPE feasible: pair counts are identical whether
    * counted over words × freq or over raw text, and the vocabulary
    * is bounded by language, not data size.
    *
    * Per round, all in codegen'd built-ins (no UDF, no interpreted
    * higher-order fold in the rewrite):
    *   - pair counts: explode adjacent symbol pairs weighted by word
    *     freq — agg state bounded by the symbol-pair vocabulary;
    *   - argmax pair: exact integer counts with (cnt desc, left asc,
    *     right asc) total-order tiebreak — deterministic, and it
    *     arrives at the rewrite by BROADCAST (one row), never a
    *     driver-side collect, so the loop plans end-to-end lazily
    *     like q_pagerank's rounds;
    *   - rewrite: words are kept as sentinel-padded double-spaced
    *     symbol strings `" s1  s2  … "`, so greedy leftmost
    *     non-overlapping BPE merging is a PLAIN string replace of
    *     `" l  r "` with `" lr "`: the surrounding single spaces
    *     anchor symbol boundaries (no substring false-match), the
    *     double separator keeps back-to-back merges adjacent
    *     (`" a  a  a  a "` → `" aa  aa "` in one pass, exactly
    *     leftmost-greedy), and no regex means no metacharacter
    *     escaping for symbols mined from arbitrary text. Tokens are
    *     whitespace-split, so the space sentinel can never collide
    *     with symbol content.
    *
    * Each round TRUNCATES its lineage with [[CheckpointStrategy]]
    * (the connectedComponents discipline, not the q_pagerank pin):
    * the round-k vocabulary is referenced TWICE downstream — by the
    * argmax and by the rewrite that embeds that argmax — so a lazy
    * loop's logical plan DOUBLES per round, and analysis, cache-
    * lookup normalization, AQE re-planning, and codegen all walk the
    * O(2^rounds) tree on every one of the loop's ~2·rounds actions.
    * Measured at sf0.1: 50–180 s per invocation lazy vs ~5 s
    * truncated — the round-9 warm-gate flag was exactly this.
    * Persist alone does NOT fix it (caching replaces subtrees only
    * AFTER the full tree is analyzed and normalized per lookup);
    * eager checkpointing cuts the plan to an O(1) leaf per round.
    * TextDedupVectorSpec pins parity against an independent
    * driver-side merge walk, the classic hand fixture, and
    * supplementary-plane symbols; PropertiesSpec sweeps random
    * corpora against a full reference walk; PlanSpec pins the
    * TakeOrdered argmax / one-row-broadcast rewrite / partial-agg
    * shapes on the per-round builders and leaf-only lineage on the
    * assembled result.
    */
  private[graft] def bpeMerges(docs: DataFrame,
                               rounds: Int = BpeRounds,
                               strategy: CheckpointStrategy =
                                 CheckpointStrategy.Local): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    // Lifecycle (the shared Generations discipline): the vocabulary
    // is the carried generation — stage truncates the rewrite while
    // the old generation is still its reader, advance releases it —
    // and each round's 1-row argmax is a KEPT side output, alive
    // until the merge table is assembled. The finally's releaseAll
    // covers success AND failure: without it the rounds × 1-row
    // frames (and, on a failed round, the current vocabulary) outlive
    // the query as unreleasable checkpoint blocks (clearCache cannot
    // reach them), one leak per invocation in a long-lived session.
    // On success the merge table truncates FIRST, so the returned
    // frame depends on none of the released storage (the final
    // generation feeds nothing — only the argmax rows do).
    val gen = new Generations(strategy)
    val tops = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      var vocab = gen.init(bpeVocab(docs))
      for (step <- 1 to rounds) {
        val top = gen.keep(bpeArgmax(vocab, step))
        tops += top
        gen.stage(bpeRewrite(vocab, top))
        vocab = gen.advance()
      }
      strategy.truncate(
        tops.reduce(_ unionByName _)
          .select($"step", $"l".as("left"), $"r".as("right"), $"cnt")
          .orderBy($"step"))
    } finally gen.releaseAll()
  }

  /** Apply a learned merge table to a `(w, syms)` vocabulary — the
    * ENCODE half of BPE: the SAME sentinel-padded single replace as
    * training's [[bpeRewrite]], one broadcast one-row join per learned
    * step, in step order (BPE application must replay merges in the
    * order they were learned). A step with no surviving merge row (a
    * corpus that ran out of pairs early) is an identity pass — the
    * left join + isNull guard keeps the vocabulary intact instead of
    * cross-joining it away.
    */
  private[graft] def bpeApply(wsyms: DataFrame, merges: DataFrame,
                              rounds: Int): DataFrame =
    (1 to rounds).foldLeft(wsyms) { (v, step) =>
      val m = merges.filter(col("step") === step)
        .select(col("left").as("_l"), col("right").as("_r"))
      v.join(broadcast(m), lit(true), "left")
        .select(col("w"),
          when(col("_l").isNull, col("syms")).otherwise(
            replace(col("syms"),
              concat(lit(" "), col("_l"), lit("  "), col("_r"), lit(" ")),
              concat(lit(" "), col("_l"), col("_r"), lit(" ")))).as("syms"))
    }

  /** Corpus-trained BPE applied to the DISTINCT-word vocabulary:
    * `(w, n_chr, n_sym)` — code-point and encoded-symbol counts per
    * word. The ONE definition of the dictionary-coded encode table
    * that q_bpe_encode and q_bpe_fairness join their word streams
    * against (a sentinel-format or tokenizer change edits one place);
    * the sentinel syms construction is bpeVocab's v0 identity.
    */
  private def bpeEncodedWords(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val wsyms = docs.select(explode(tokens(lower($"text"))).as("w")).distinct()
      .select($"w",
        concat(lit(" "), array_join(split($"w", ""), "  "), lit(" ")).as("syms"))
    bpeApply(wsyms, bpeMerges(docs), BpeRounds)
      .select($"w", size(split($"w", "")).cast("long").as("n_chr"),
        size(split(trim($"syms"), "  ")).cast("long").as("n_sym"))
  }

  /** Corpus → weighted symbol vocabulary `(syms, freq)`: the ONE
    * corpus-sized pass of BPE training.
    */
  private[graft] def bpeVocab(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs
      .select(explode(tokens(lower($"text"))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      // code-point split: zero-width regex boundaries never split a
      // surrogate pair, so supplementary-plane text merges correctly
      .select(concat(lit(" "), array_join(split($"w", ""), "  "), lit(" "))
        .as("syms"), $"freq")
  }

  /** One round's most-frequent adjacent symbol pair as a ONE-ROW
    * DataFrame `(l, r, cnt, step)` — TakeOrdered top-1 with a total-
    * order tiebreak, never a full sort or a driver collect.
    */
  private[graft] def bpeArgmax(vocab: DataFrame, step: Int): DataFrame = {
    val ss = vocab.sparkSession
    import ss.implicits._
    vocab
      .select($"freq", split(trim($"syms"), "  ").as("a"))
      .select($"freq", explode(when(size($"a") < 2,
          array().cast("array<struct<l:string,r:string>>"))
        .otherwise(transform(sequence(lit(1), size($"a") - 1),
          i => struct(element_at($"a", i).as("l"),
            element_at($"a", i + 1).as("r"))))).as("p"))
      .groupBy($"p.l".as("l"), $"p.r".as("r"))
      .agg(sum($"freq").as("cnt"))
      .orderBy($"cnt".desc, $"l".asc, $"r".asc)
      .limit(1)
      .withColumn("step", lit(step))
  }

  /** Apply one adopted merge to the vocabulary: the one-row argmax
    * arrives by BROADCAST (a deliberate one-row BNLJ, like
    * q_cosine_topk's query vector) and the sentinel-padded string
    * replace performs exact leftmost-greedy merging (see
    * [[bpeMerges]]).
    */
  private[graft] def bpeRewrite(vocab: DataFrame, top: DataFrame): DataFrame = {
    val ss = vocab.sparkSession
    import ss.implicits._
    vocab
      .crossJoin(broadcast(top.select($"l", $"r")))
      .select(replace($"syms",
          concat(lit(" "), $"l", lit("  "), $"r", lit(" ")),
          concat(lit(" "), $"l", $"r", lit(" "))).as("syms"),
        $"freq")
  }

  /** Language-ID as a reusable stateless transform (see [[chunked]]
    * for the streaming-parity story): the n-gram/stopword heuristic is
    * pure per-row column math, so incremental corpus ingestion runs
    * the SAME body under `readStream`.
    */
  def langIdentified(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langGuess(col("text")).as("lang_guess"),
      col("lang"))

  /** Quality scoring as a reusable stateless transform (see
    * [[chunked]]). Tokens are projected ONCE to an attribute, then the
    * formula's three token reads and two text reads are all attribute
    * reads — the inline helpers would re-run the regex split per
    * metric (the per-element trap, see Dedup.shinglesFromTokens).
    */
  def qualityScored(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), {
        val nTok = size(col("tk")).cast("double")
        val lenScore = least(nTok / 100.0, lit(1.0))
        val stopRatio = size(filter(col("tk"),
            t => t.isin(Stopwords.map(lit): _*)))
          .cast("double") / greatest(nTok, lit(1.0))
        val punctRatio = punctCount(col("text")).cast("double") /
          greatest(length(col("text")).cast("double"), lit(1.0))
        round(lenScore * (lit(1.0) - punctRatio) *
          least(stopRatio * 5.0, lit(1.0)), 4).as("quality")
      })

  /** Context-window chunking as a reusable `DataFrame => DataFrame`
    * transform (stateless, per-row) — the same function runs under
    * `readStream` unchanged; StreamingTextSpec pins the parity.
    */
  def chunked(docs: DataFrame, chunkLen: Int = 50, stride: Int = 40): DataFrame = {
    require(stride > 0 && stride <= chunkLen,
      s"stride must be in (0, chunkLen=$chunkLen]; got $stride — a larger " +
        "stride would silently drop the tokens between chunk end and next start")
    val overlap = chunkLen - stride
    docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0),
          greatest(size(col("tk")) - overlap - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"),
        size(slice(col("tk"), col("start") + 1, lit(chunkLen))).as("n_chunk_tokens"),
        array_join(slice(col("tk"), col("start") + 1, lit(chunkLen)), " ").as("chunk_text"))
  }

  /** PII redaction as a reusable stateless transform (see [[chunked]]
    * for the streaming-parity story). Docs are salted with
    * deterministic doc_id-derived PII so the scrub verifiably fires.
    */
  def piiRedacted(docs: DataFrame): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    docs
      .select(col("doc_id"),
        concat(col("text"), lit(" Contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" now.")).as("salted"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("salted"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("salted"), lit(phoneRe), lit(0))).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("salted"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("redacted_fp"))
  }

  private val stopList = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The q_lang_id CASE expression — ONE spelling shared by every twin
    * that buckets rows by guessed language (q_lang_id,
    * q_lang_confusion, q_token_fertility), so the SQL mirror of
    * [[langGuess]] cannot drift between its consumers. Defined as a
    * plain (non-interpolated) literal because the regex contains
    * `( |$)`.
    */
  private val langCaseSql: String =
    """CASE WHEN regexp_matches(text, '[^\x00-\x7F]') THEN 'other'
      |       WHEN regexp_matches(text, '(^| )(the|a|of|and|is)( |$)') THEN 'en'
      |       ELSE 'unknown' END""".stripMargin

  /** One BPE training round as SQL CTEs — the DuckDB mirror of
    * [[bpeArgmax]] + [[bpeRewrite]], unrolled [[BpeRounds]] times by
    * the q_bpe_merges oracle below (the q_pagerank roundCte pattern:
    * generated from the same constants the Spark loop uses, so the
    * engines cannot drift). Round i reads vocabulary v(i-1), adopts
    * the most frequent adjacent pair as t_i (cnt DESC, l, r — the
    * identical total-order tiebreak, binary collation both sides) and
    * rewrites into v_i with the same sentinel-padded single replace;
    * DuckDB's `replace` is leftmost non-overlapping continuing after
    * the replacement, exactly Spark's (probed: ' a  a  a  a ' →
    * ' aa  aa ').
    */
  private def bpeRoundCte(i: Int): String = {
    val prev = s"v${i - 1}"
    s"""p$i AS (
       |  SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(list_transform(range(1, len(a)), x -> [a[x], a[x+1]])) AS pr, freq
       |    FROM (SELECT string_split(trim(syms), '  ') AS a, freq FROM $prev))
       |  GROUP BY 1, 2),
       |t$i AS (SELECT $i AS step, l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
       |v$i AS (
       |  SELECT replace(syms, ' ' || t.l || '  ' || t.r || ' ',
       |                       ' ' || t.l || t.r || ' ') AS syms, freq
       |  FROM $prev CROSS JOIN t$i t)""".stripMargin
  }

  /** One ENCODE round as a SQL CTE — [[bpeApply]]'s step i mirrored:
    * the adopted merge arrives as scalar subqueries on t_i, and the
    * CASE guard reproduces the identity pass for a step that adopted
    * nothing (scalar subquery over an empty t_i is NULL, which would
    * otherwise NULL the whole replace).
    */
  private def bpeEncodeCte(i: Int): String =
    s"""e$i AS (
       |  SELECT w, CASE WHEN (SELECT l FROM t$i) IS NULL THEN syms
       |    ELSE replace(syms, ' ' || (SELECT l FROM t$i) || '  ' || (SELECT r FROM t$i) || ' ',
       |                       ' ' || (SELECT l FROM t$i) || (SELECT r FROM t$i) || ' ') END AS syms
       |  FROM e${i - 1})""".stripMargin

  /** The train+encode chain as CTEs, parameterized on the word
    * stream's carried key (doc_id / lang) — ONE spelling of
    * dw/v0/rounds/e0/enc shared by the q_bpe_encode and
    * q_bpe_fairness twins, the SQL mirror of [[bpeEncodedWords]].
    * `enc` carries both the symbol count and the code-point count
    * (NOT length() — DuckDB's counts grapheme clusters).
    */
  private def bpeEncodeChainCtes(keyCol: String): String =
    s"""WITH dw AS (
       |  SELECT $keyCol, unnest(list_filter(string_split_regex(lower(text), '$Ws+'),
       |    t -> length(t) > 0)) AS w
       |  FROM documents),
       |v0 AS (
       |  SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS syms,
       |    COUNT(*) AS freq
       |  FROM dw GROUP BY w),
       |${(1 to BpeRounds).map(bpeRoundCte).mkString(",\n")},
       |e0 AS (SELECT w, ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS syms
       |       FROM (SELECT DISTINCT w FROM dw)),
       |${(1 to BpeRounds).map(bpeEncodeCte).mkString(",\n")},
       |enc AS (SELECT w, CAST(len(string_split(w, '')) AS BIGINT) AS n_chr,
       |          CAST(len(string_split(trim(syms), '  ')) AS BIGINT) AS n_sym
       |        FROM e$BpeRounds)""".stripMargin

  override def oracles: Map[String, String] = Map(
    // Train (the q_bpe_merges chain, fed from the doc_id-carrying word
    // stream) then encode the distinct-word vocabulary and join counts
    // back per doc — the same dictionary-coded shape as the query.
    "q_bpe_encode" ->
      s"""${bpeEncodeChainCtes("doc_id")}
         |SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(n_sym) AS BIGINT) AS n_symbols
         |FROM dw JOIN enc USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The same chain lang-keyed with a |langs|-bounded final
    // aggregate; the 4-dp ratios are half-up integer divisions (the
    // q_cross_dup rounding rule).
    "q_bpe_fairness" ->
      s"""${bpeEncodeChainCtes("lang")},
         |agg AS (
         |  SELECT lang, COUNT(*) AS n_words,
         |    CAST(SUM(n_chr) AS BIGINT) AS n_chars,
         |    CAST(SUM(n_sym) AS BIGINT) AS n_symbols
         |  FROM dw JOIN enc USING (w) GROUP BY lang)
         |SELECT lang, n_words, n_chars, n_symbols,
         |  ((2 * 10000 * n_symbols + n_words) // (2 * n_words)) / 10000.0
         |    AS syms_per_word,
         |  ((2 * 10000 * n_chars + n_symbols) // (2 * n_symbols)) / 10000.0
         |    AS chars_per_sym
         |FROM agg ORDER BY lang""".stripMargin,
    // The fairness chain's excess signal feeding the q_allocation
    // largest-remainder CTE shape — exact integer arithmetic
    // throughout, lang ASC remainder tiebreak.
    "q_vocab_budget" ->
      s"""${bpeEncodeChainCtes("lang")},
         |agg AS (
         |  SELECT lang, COUNT(*) AS n_words,
         |    CAST(SUM(n_sym) AS BIGINT) AS n_symbols
         |  FROM dw JOIN enc USING (w) GROUP BY lang),
         |exc AS (SELECT lang, n_words, n_symbols,
         |          n_symbols - n_words AS excess FROM agg),
         |tot AS (SELECT CAST(SUM(excess) AS BIGINT) AS nn FROM exc),
         |based AS (
         |  SELECT lang, n_words, n_symbols, excess, nn,
         |    ($VocabBudget * excess) // GREATEST(nn, 1) AS base,
         |    ($VocabBudget * excess) % GREATEST(nn, 1) AS rem
         |  FROM exc CROSS JOIN tot),
         |spent AS (SELECT CAST(SUM(base) AS BIGINT) AS used FROM based),
         |ranked AS (
         |  SELECT lang, n_words, n_symbols, excess, nn, base,
         |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rk
         |  FROM based)
         |SELECT lang, n_words, n_symbols, CAST(excess AS BIGINT) AS excess,
         |  CAST(base + CASE WHEN nn > 0 AND rk <= $VocabBudget - used
         |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM ranked CROSS JOIN spent
         |ORDER BY lang""".stripMargin,
    // Verified end-to-end since round 11: the loop is deterministic
    // (checkpoint truncation changes plans, never values) and short
    // enough to unroll. v0 is bpeVocab (code-point split — DuckDB's
    // string_split(w, '') is per-character like Spark's zero-width
    // regex split), then BpeRounds argmax+rewrite rounds.
    "q_bpe_merges" ->
      s"""WITH w AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '$Ws+'),
         |    t -> length(t) > 0)) AS w
         |  FROM documents),
         |v0 AS (
         |  SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS syms,
         |    COUNT(*) AS freq
         |  FROM w GROUP BY w),
         |${(1 to BpeRounds).map(bpeRoundCte).mkString(",\n")}
         |SELECT step, l AS "left", r AS "right", cnt
         |FROM (${(1 to BpeRounds).map(i => s"SELECT * FROM t$i").mkString(" UNION ALL ")})
         |ORDER BY step""".stripMargin,
    // Exact-count twin of the over-fetched sketch: valid because the
    // tracker (10000) exceeds this corpus's vocabulary, so sketch
    // counts are exact and the shared (cnt DESC, term) re-rank makes
    // both engines pick the identical 20 rows.
    "q_approx_top_terms" ->
      s"""WITH terms AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '$Ws+'),
         |    t -> length(t) > 0)) AS term
         |  FROM documents)
         |SELECT term, COUNT(*) AS cnt FROM terms
         |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,
    "q_bpe_pairs" ->
      s"""WITH w AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '$Ws+'),
        |    t -> length(t) > 0)) AS w
        |  FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, i, 2))) AS pair
        |  FROM w)
        |SELECT pair, COUNT(*) AS cnt FROM p
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    "q_text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(length(list_filter(string_split_regex(text, '$Ws+'), t -> length(t) > 0)) AS INT) AS n_tokens,
         |  CAST(length(list_filter(string_split_regex(
         |    regexp_replace(text, '([0-9])', ' \\1', 'g'), '[$WsChars.,;:!?]+'),
         |    t -> length(t) > 0)) AS INT) AS n_subwords,
         |  CAST(length(list_filter(string_split_regex(text, '$Ws+'), t -> t IN $stopList)) AS INT) AS n_stop,
         |  CAST(length(text) AS INT) AS len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"""SELECT doc_id,
         |  $langCaseSql AS lang_guess,
         |  lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    // The q_lang_id CASE + the q_text_tokens token/subword spellings,
    // aggregated per language bucket; strlen = byte length (DuckDB's
    // length() counts characters, Spark's octet_length counts bytes).
    "q_token_fertility" ->
      s"""WITH d AS (
         |  SELECT $langCaseSql AS lang_guess,
         |    length(list_filter(string_split_regex(text, '$Ws+'),
         |      t -> length(t) > 0)) AS nt,
         |    length(list_filter(string_split_regex(
         |      regexp_replace(text, '([0-9])', ' \\1', 'g'), '[$WsChars.,;:!?]+'),
         |      t -> length(t) > 0)) AS nsw,
         |    strlen(text) AS nb
         |  FROM documents)
         |SELECT lang_guess, COUNT(*) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(nsw) AS BIGINT) AS n_subwords,
         |  CAST(SUM(nb) AS BIGINT) AS n_bytes,
         |  ROUND(SUM(nsw) / GREATEST(CAST(SUM(nt) AS DOUBLE), 1.0), 4)
         |    AS fertility,
         |  ROUND(SUM(nb) / GREATEST(CAST(SUM(nt) AS DOUBLE), 1.0), 4)
         |    AS bytes_per_token
         |FROM d GROUP BY lang_guess ORDER BY lang_guess""".stripMargin,
    // One lowercased tokenize CTE feeds both the top-V vocabulary cut
    // (the q_approx_top_terms total order) and the coverage aggregate;
    // strlen = UTF-8 bytes, matching Spark's octet_length.
    "q_vocab_coverage" ->
      s"""WITH terms AS (
         |  SELECT $langCaseSql AS lang_guess,
         |    unnest(list_filter(string_split_regex(lower(text), '$Ws+'),
         |      t -> length(t) > 0)) AS term
         |  FROM documents),
         |vocab AS (
         |  SELECT term FROM (
         |    SELECT term, COUNT(*) AS cnt FROM terms
         |    GROUP BY term ORDER BY cnt DESC, term LIMIT $VocabSize)),
         |j AS (
         |  SELECT lang_guess, term,
         |    term IN (SELECT term FROM vocab) AS iv
         |  FROM terms)
         |SELECT lang_guess,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) FILTER (WHERE NOT iv) AS BIGINT) AS n_oov,
         |  CAST(COALESCE(SUM(strlen(term)) FILTER (WHERE NOT iv), 0)
         |    AS BIGINT) AS n_oov_bytes,
         |  ROUND((COUNT(*) FILTER (WHERE NOT iv))
         |    / GREATEST(CAST(COUNT(*) AS DOUBLE), 1.0), 4) AS oov_rate,
         |  ROUND(COALESCE(SUM(strlen(term)) FILTER (WHERE NOT iv), 0)
         |    / GREATEST(CAST(COUNT(*) - COUNT(*) FILTER (WHERE NOT iv)
         |        + COALESCE(SUM(strlen(term)) FILTER (WHERE NOT iv), 0)
         |      AS DOUBLE), 1.0), 4) AS byte_fallback_share
         |FROM j GROUP BY lang_guess ORDER BY lang_guess""".stripMargin,
    // One tokenize CTE crossed with the budget list — the loss curve.
    "q_trunc_loss" ->
      s"""WITH n AS (
         |  SELECT length(list_filter(string_split_regex(text, '$Ws+'),
         |    t -> length(t) > 0)) AS n
         |  FROM documents),
         |b AS (SELECT unnest([${TruncBudgets.mkString(", ")}]) AS budget)
         |SELECT budget,
         |  CAST(COUNT(*) FILTER (WHERE n > budget) AS BIGINT)
         |    AS n_docs_truncated,
         |  CAST(SUM(GREATEST(n - budget, 0)) AS BIGINT) AS n_tokens_lost,
         |  ROUND(SUM(GREATEST(n - budget, 0))
         |    / GREATEST(CAST(SUM(n) AS DOUBLE), 1.0), 4) AS token_loss_share,
         |  ROUND((COUNT(*) FILTER (WHERE n > budget))
         |    / GREATEST(CAST(COUNT(*) AS DOUBLE), 1.0), 4) AS doc_trunc_share
         |FROM n, b GROUP BY budget ORDER BY budget""".stripMargin,
    "q_quality_score" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split_regex(text, '$Ws+'), t -> length(t) > 0) AS tk
         |  FROM documents)
         |SELECT doc_id, ROUND(
         |    LEAST(CAST(length(tk) AS DOUBLE) / 100.0, 1.0)
         |    * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |        / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
         |    * LEAST(CAST(length(list_filter(tk, t -> t IN $stopList)) AS DOUBLE)
         |        / GREATEST(CAST(length(tk) AS DOUBLE), 1.0) * 5.0, 1.0),
         |  4) AS quality
         |FROM toks ORDER BY doc_id""".stripMargin,
    // Same exact-integer rule arithmetic as the Spark side — the
    // thresholds interpolate from the shared constants so the two
    // spellings cannot drift.
    "q_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '$Ws+'), x -> length(x) > 0) AS tk
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(length(array_to_string(tk, '')) AS BIGINT) AS sum_len,
         |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
         |      AS n_alpha,
         |    CAST(len(list_filter(tk, x -> x IN $stopList)) AS BIGINT) AS n_stop
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  CAST(n_tokens >= $GopherMinTokens AND n_tokens <= $GopherMaxTokens
         |    AS INT) AS r_len,
         |  CAST(sum_len >= n_tokens * $GopherMinMeanLen
         |    AND sum_len <= n_tokens * $GopherMaxMeanLen AS INT) AS r_mean_len,
         |  CAST(n_alpha * 5 >= n_tokens * 4 AS INT) AS r_alpha,
         |  CAST(n_stop >= $GopherMinStops AS INT) AS r_stop,
         |  CAST(n_tokens >= $GopherMinTokens AND n_tokens <= $GopherMaxTokens
         |    AND sum_len >= n_tokens * $GopherMinMeanLen
         |    AND sum_len <= n_tokens * $GopherMaxMeanLen
         |    AND n_alpha * 5 >= n_tokens * 4
         |    AND n_stop >= $GopherMinStops AS INT) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      s"""SELECT doc_id,
        |  ${fingerprintSql("text")} AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      s"""WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '$Ws+'), t -> length(t) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.term,
        |  ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
        |FROM tf JOIN df USING (term), n
        |ORDER BY tfidf DESC, term, doc_id LIMIT 50""".stripMargin,
    "q_edit_distance" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(substr(a.text, 1, 50), substr(b.text, 1, 50)) AS INT)
        |    AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.lang = 'en' AND b.lang = 'en'
        |ORDER BY id_a""".stripMargin,
    "q_top_bigrams" ->
      s"""WITH toks AS (
        |  SELECT list_filter(string_split_regex(text, '$Ws+'),
        |                     t -> length(t) > 0) AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT tk[i] || ' ' || tk[i+1] AS bigram
        |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks))
        |SELECT bigram, COUNT(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    "q_pmi_bigrams" ->
      s"""WITH toks AS (
        |  SELECT list_filter(string_split_regex(text, '$Ws+'),
        |                     t -> length(t) > 0) AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT t, COUNT(*) AS c
        |  FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t),
        |n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
        |bi AS (
        |  SELECT bigram, COUNT(*) AS cab FROM (
        |    SELECT tk[i] || ' ' || tk[i+1] AS bigram
        |    FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks))
        |  GROUP BY bigram),
        |nb AS (SELECT CAST(SUM(cab) AS DOUBLE) AS nb FROM bi)
        |SELECT bi.bigram, bi.cab,
        |  ROUND(ln((CAST(bi.cab AS DOUBLE) * n.n * n.n) /
        |    (nb.nb * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi
        |FROM bi
        |JOIN uni u1 ON u1.t = string_split(bi.bigram, ' ')[1]
        |JOIN uni u2 ON u2.t = string_split(bi.bigram, ' ')[2]
        |CROSS JOIN n CROSS JOIN nb
        |WHERE bi.cab >= $PmiMinCount
        |ORDER BY pmi DESC, bi.bigram LIMIT $PmiTopK""".stripMargin,
    "q_doc_chunks" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '$Ws+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk) - 10, 1), 40)) AS start
        |  FROM t)
        |SELECT doc_id, CAST(start // 40 AS INT) AS chunk_id,
        |  CAST(len(list_slice(tk, start + 1, start + 50)) AS INT) AS n_chunk_tokens,
        |  array_to_string(list_slice(tk, start + 1, start + 50), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q_seq_pack" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '$Ws+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk) - 10, 1), 40)) AS start
        |  FROM t),
        |c AS (
        |  SELECT doc_id, CAST(start // 40 AS INT) AS chunk_id,
        |    CAST(len(list_slice(tk, start + 1, start + 50)) AS INT) AS n_chunk_tokens
        |  FROM s)
        |SELECT doc_id, chunk_id, n_chunk_tokens,
        |  CAST(COALESCE(SUM(n_chunk_tokens) OVER (PARTITION BY doc_id
        |    ORDER BY chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS cum_before,
        |  CAST(FLOOR(COALESCE(SUM(n_chunk_tokens) OVER (PARTITION BY doc_id
        |    ORDER BY chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) / $PackBudget.0) AS INT) AS seq_id
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_repetition" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '$Ws+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tg
        |  FROM t),
        |r AS (
        |  SELECT doc_id, CAST(len(tg) AS INT) AS n_tri,
        |    CAST(len(list_distinct(tg)) AS INT) AS n_uniq,
        |    CASE WHEN len(tg) = 0 THEN 0.0
        |         ELSE ROUND(1.0 - len(list_distinct(tg))
        |                / CAST(len(tg) AS DOUBLE), 4) END AS dup_ratio
        |  FROM g)
        |SELECT doc_id, n_tri, n_uniq, dup_ratio, (dup_ratio <= 0.2) AS kept
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_shuffle_shard" ->
      s"""WITH h AS (
         |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |s AS (
         |  SELECT doc_id, h,
         |    CAST(CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % $ShuffleShards AS INT) AS shard
         |  FROM h)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos
         |FROM s ORDER BY shard, pos""".stripMargin,
    "q_mix_weighted" ->
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |    ${Buckets.hashBucketSql("doc_id")} AS bucket,
         |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 100
         |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 50
         |         ELSE 20 END AS weight
         |  FROM documents)
         |SELECT doc_id, source, bucket, CAST(weight AS INT) AS weight
         |FROM w WHERE bucket < weight ORDER BY doc_id""".stripMargin,
    "q_rolling_hash" ->
      """WITH c AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x20-\x7E]', '', 'g') AS s
        |  FROM documents)
        |SELECT doc_id, list_reduce(
        |  list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(s) + 1),
        |                   i -> CAST(ord(s[i:i]) AS BIGINT))),
        |  (a, x) -> (a * 31 + x) % 1000000007) AS rhash
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pii_redact" ->
      """WITH salted AS (
        |  SELECT doc_id,
        |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.' AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(s, '\+1-555-[0-9]{4}')) AS INT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp
        |FROM salted ORDER BY doc_id""".stripMargin,
    // The q_lang_id CASE expression (shared spelling), aggregated to
    // the confusion matrix.
    "q_lang_confusion" ->
      s"""WITH g AS (
        |  SELECT lang,
        |    $langCaseSql AS lang_guess
        |  FROM documents)
        |SELECT lang, lang_guess, COUNT(*) AS n,
        |  ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang)
        |    AS DOUBLE), 4) AS row_share
        |FROM g GROUP BY lang, lang_guess
        |ORDER BY lang, lang_guess""".stripMargin,
    // The q_seq_pack CTE chain verbatim, then the (doc, seq) token
    // aggregate and the one-row utilization report.
    "q_pack_efficiency" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '$Ws+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk) - 10, 1), 40)) AS start
        |  FROM t),
        |c AS (
        |  SELECT doc_id, CAST(start // 40 AS INT) AS chunk_id,
        |    CAST(len(list_slice(tk, start + 1, start + 50)) AS INT) AS n_chunk_tokens
        |  FROM s),
        |p AS (
        |  SELECT doc_id, n_chunk_tokens,
        |    CAST(FLOOR(COALESCE(SUM(n_chunk_tokens) OVER (PARTITION BY doc_id
        |      ORDER BY chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) / $PackBudget.0) AS INT) AS seq_id
        |  FROM c),
        |seqs AS (
        |  SELECT doc_id, seq_id, CAST(SUM(n_chunk_tokens) AS BIGINT) AS seq_tokens
        |  FROM p GROUP BY doc_id, seq_id),
        |g AS (
        |  SELECT COUNT(*) AS n_seqs, CAST(SUM(seq_tokens) AS BIGINT) AS n_tokens,
        |    COUNT(*) FILTER (WHERE seq_tokens < ${PackBudget * 4 / 5}) AS n_underfull
        |  FROM seqs)
        |SELECT n_seqs, n_tokens, n_underfull,
        |  ROUND(n_tokens / NULLIF(CAST(n_seqs * $PackBudget AS DOUBLE), 0.0), 4) AS utilization,
        |  ROUND(n_underfull / NULLIF(CAST(n_seqs AS DOUBLE), 0.0), 4) AS underfull_share
        |FROM g""".stripMargin,
  )
}
