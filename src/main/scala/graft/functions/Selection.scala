package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Corpus SELECTION operators — the "which documents make the
  * training set" step that consumes the quality/novelty signals
  * `Curation` and `Text` produce:
  *
  *   - weight-proportional sampling (`q_weighted_sample`): draw a
  *     size-k sample where inclusion probability is proportional to a
  *     per-doc weight — systematic sampling over the cumulative weight
  *     axis, EXACT integer arithmetic end to end.
  *   - importance resampling scores (`q_dsir_select`): DSIR (Xie et
  *     al. '23, arXiv:2302.03169) — score each document by how much
  *     more likely its tokens are under a TARGET-domain hashed n-gram
  *     LM than under the raw-corpus LM; training-set selection then
  *     keeps the top-scoring docs, up-weighting data that looks like
  *     the target distribution.
  *   - stable global sequence ids (`q_global_index`): the
  *     zipWithIndex replacement for numbering selected examples,
  *     built on the same prefix-sum hierarchy as the sampler.
  *
  * Scale shape: all three are linear scans plus bounded aggregations — the
  * DSIR LMs have HASHED vocabularies (fixed bucket count, so agg state
  * is O(buckets) regardless of corpus size — the paper's own trick),
  * and the sampler's only global state is one prefix-sum hierarchy.
  */
object Selection extends QueryModule {

  /** Sample size for q_weighted_sample. */
  val SampleK = 50

  /** Docs per prefix-sum bucket (q_weighted_sample). */
  val PrefixBucket = 64

  /** Hashed-vocabulary size for the DSIR LMs. */
  val DsirBuckets = 256

  /** Sample size for q_priority_sample. */
  val PriorityK = 50

  /** Feature dimension for the hashing-trick vectorizer. */
  val FeatureBuckets = 64

  /** Fixed-point scale of the priority key: h < 2²⁸ (7 md5 hex chars)
    * and scale 2³⁴ keep h·scale < 2⁶² — no signed-64 overflow for any
    * weight ≥ 1.
    */
  val PriorityScale = 1L << 34

  /** Hash bucket of a term for the DSIR LMs — md5-prefix scheme (the
    * [[Buckets]] idea at a different modulus), emitted identically by
    * [[dsirBucketSql]] so the two engines can never drift.
    */
  private def dsirBucket(term: org.apache.spark.sql.Column) =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % DsirBuckets

  private def dsirBucketSql(termExpr: String): String =
    s"CAST(('0x' || substr(md5($termExpr), 1, 8)) AS BIGINT) % $DsirBuckets"

  /** Exclusive prefix offsets of a per-bucket total table `(bkt, v)` —
    * the upper levels of the distributed prefix-sum hierarchy, shared
    * by the sampler and the global indexer so the hierarchy has
    * exactly one implementation.
    *
    * RECURSIVE: while the subtotal table is wider than [[PrefixBucket]]
    * rows, it is itself bucketed (`bkt div PrefixBucket`) and this
    * function computes the super-bucket offsets one level up; only a
    * table of ≤ PrefixBucket rows ever runs through the terminal
    * single-partition window. Depth is log_PrefixBucket(n) — 5 levels
    * covers 10^9 subtotal rows — so NO single-partition step grows
    * with corpus size (the q_share_of_total rule, applied to the
    * hierarchy itself; a 2-level version windowed the whole subtotal
    * table on one partition, which at 100 TB is 10^8–10^9 rows).
    *
    * The input is pinned before the one driver-side `count()` that
    * picks the level shape (the same cheap size read AQE's join
    * planning does) — the count materializes the pinned table, so the
    * aggregation lineage behind it runs once, not once per consumer.
    * Level-k offsets re-enter level k-1 by an un-hinted equi-join on
    * the super-bucket key: the offset side is 1/PrefixBucket the size
    * of its input, so the planner broadcasts it at any realistic
    * scale and can fall back to a co-partitioned shuffle when even
    * the offset table is huge.
    */
  private[graft] def exclusiveOffsets(btot: org.apache.spark.sql.DataFrame,
                                      valCol: String): org.apache.spark.sql.DataFrame = {
    val pinned = btot.transform(graft.Pins.ambient)
    if (pinned.count() <= PrefixBucket) {
      val wB = Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)
      pinned.withColumn("off", coalesce(sum(col(valCol)).over(wB), lit(0L)))
        .select(col("bkt"), col("off"))
    } else {
      val sup = pinned.groupBy(expr(s"bkt div $PrefixBucket").as("bkt"))
        .agg(sum(col(valCol)).as("sv"))
      val soff = exclusiveOffsets(sup, "sv")
        .select(col("bkt").as("sup"), col("off").as("soff"))
      val wIn = Window.partitionBy(col("sup")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      pinned.withColumn("sup", expr(s"bkt div $PrefixBucket"))
        .join(soff, Seq("sup"))
        .withColumn("off", col("soff") + coalesce(sum(col(valCol)).over(wIn), lit(0L)))
        .select(col("bkt"), col("off"))
    }
  }

  override def queries: Map[String, Query] = Map(
    // [EXT] weight-proportional systematic sampling — pick ≈K docs
    // with probability ∝ n_chars (sampling by length ≈ sampling by
    // token budget share). Method: lay every doc on the cumulative
    // weight axis in doc_id order; a doc is picked once per multiple
    // of step=total/K its interval [cum, cum+w) covers (heavy docs can
    // be picked more than once — `multiplicity` is the with-
    // replacement count). EXACT integer arithmetic throughout: no
    // float key, no RNG, no libm — the result is a pure function of
    // the data, reproducible across runs, engines, AND partitionings
    // (an Efraimidis–Spirakis float-key variant would hinge on pow()
    // ulps; this one cannot).
    //
    // The global prefix sum is the textbook DISTRIBUTED formulation,
    // not a global window: per-bucket subtotals (one shuffle,
    // map-side combined), exclusive offsets over the subtotal table
    // (exclusiveOffsets recurses while that table is wider than
    // PrefixBucket rows, so the terminal single-partition window sees
    // ≤ PrefixBucket rows at ANY corpus size), then a per-bucket
    // window seeded by the broadcast offsets. The q_share_of_total
    // rule: nothing row-scale ever passes through one partition.
    "q_weighted_sample" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", $"n_chars".as("w"),
          expr(s"doc_id div $PrefixBucket").as("bkt"))
      val boff = exclusiveOffsets(docs.groupBy($"bkt").agg(sum($"w").as("bw")), "bw")
      val tot = docs.agg(coalesce(sum($"w"), lit(0L)).as("total"))
      val wIn = Window.partitionBy($"bkt").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(broadcast(boff), Seq("bkt"))
        .withColumn("cum_before", $"off" + coalesce(sum($"w").over(wIn), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("step", greatest(expr(s"total div $SampleK"), lit(1L)))
        .withColumn("multiplicity",
          (expr("(cum_before + w) div step") - expr("cum_before div step")).cast("int"))
        .filter($"multiplicity" > 0)
        .select($"doc_id", $"w", $"cum_before", $"multiplicity")
        .orderBy($"doc_id")
    }),

    // [EXT] stable global sequence ids — the zipWithIndex shape a
    // training pipeline needs to number examples (shard manifests,
    // resume tokens) WITHOUT a single-reducer sort: per-bucket counts,
    // exclusive offsets over the tiny subtotal table, offset +
    // per-bucket row_number. idx is dense 1..n in doc_id order, a pure
    // function of the data — invariant under partitioning, where
    // RDD.zipWithIndex depends on partition layout by construction.
    "q_global_index" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", expr(s"doc_id div $PrefixBucket").as("bkt"))
      val boff = exclusiveOffsets(
        docs.groupBy($"bkt").agg(count(lit(1)).as("bn")), "bn")
      val wIn = Window.partitionBy($"bkt").orderBy($"doc_id")
      docs.join(broadcast(boff), Seq("bkt"))
        .select($"doc_id", ($"off" + row_number().over(wIn)).as("idx"))
        .orderBy($"doc_id")
    }),

    // [EXT] hashing-trick feature vectorization (Weinberger et al.
    // '09) — per-doc sparse bag-of-words features over a FIXED
    // [[FeatureBuckets]]-dimensional hashed vocabulary, the
    // vectorizer that needs no fitted dictionary: bucket = md5(term)
    // mod D, so feature extraction is a pure map and the model side
    // never ships a vocab file. Output is the sparse COO triple
    // (doc_id, bucket, cnt) — one explode into one map-side-combined
    // hash aggregate whose per-doc state is ≤ D however large the
    // vocabulary, the same fixed-memory property the DSIR LMs above
    // exploit. Dense assembly is q_vec_assemble's job; sparse rows
    // are what survive 100 TB.
    "q_feature_hash" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", explode(Text.tokens(lower($"text"))).as("term"))
        .select($"doc_id",
          (conv(substring(md5($"term"), 1, 8), 16, 10).cast("long")
            % FeatureBuckets).as("bucket"))
        .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("cnt"))
        .orderBy($"doc_id", $"bucket")
    }),

    // [EXT] Priority sampling (Duffield–Lund–Thorup, JACM '07) — a
    // weight-sensitive size-K sample WITHOUT replacement, the
    // one-pass/mergeable complement to q_weighted_sample's systematic
    // (with-replacement) draw: each item gets priority w/u for a
    // per-item uniform u, and the K highest priorities win —
    // equivalently the K SMALLEST u/w, which is how it's computed
    // here. Everything stays exact integer arithmetic (the
    // q_weighted_sample rule — no RNG, no libm, no pow ulps): u is a
    // 28-bit md5-derived hash, the comparison key is (h·2³⁴) div w —
    // a fixed-point rational whose truncation is identical in both
    // engines — and ties break on doc_id. Plan shape: a pure per-row
    // projection into TakeOrdered top-K; nothing shuffles but the
    // per-partition K candidates, which is exactly why bottom-K
    // priority sampling is the production choice for weighted
    // sampling at 100 TB (and the per-partition top-Ks merge — the
    // sketch is mergeable across shards by construction).
    "q_priority_sample" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", greatest($"n_chars", lit(1L)).as("w"))
        .withColumn("h",
          conv(substring(md5(concat(lit("ps"), $"doc_id")), 1, 7), 16, 10)
            .cast("long"))
        .select($"doc_id", $"w",
          expr(s"(h * $PriorityScale) div w").as("pkey"))
        .orderBy($"pkey".asc, $"doc_id".asc)
        .limit(PriorityK)
    }),

    // [EXT] DSIR importance scores — data selection via importance
    // resampling (Xie et al. '23): fit two unigram LMs over a HASHED
    // vocabulary (DsirBuckets buckets, add-1 smoothing) — one on the
    // TARGET slice (lang='en' plays the high-quality target corpus),
    // one on the raw corpus — and score each doc by the mean
    // per-token log-likelihood ratio log p_target(t) − log p_raw(t).
    // Positive ⇒ looks like the target; selection keeps the top
    // scores. Hashing is the paper's own fixed-memory trick: agg
    // state is O(buckets) however large the vocabulary grows. Three
    // bounded stages over one tokenize pass (persisted — bucket
    // counts, totals, and scoring all read it): bucket counts with
    // map-side combine, two one-row totals broadcast into the scoring
    // projection, a per-doc avg. Rounded to 4dp — avg order differs
    // across engines/partitionings (the q_unigram_lm contract).
    "q_dsir_select" -> ((s, dir) => graft.Pins.scoped { _ =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val terms = docs
        .select($"doc_id", $"lang",
          explode(Text.tokens(lower($"text"))).as("term"))
        .withColumn("b", dsirBucket($"term"))
        .transform(graft.Pins.ambient)
      val tgtCnt = terms.filter($"lang" === "en")
        .groupBy($"b").agg(count(lit(1)).as("tc"))
      val rawCnt = terms.groupBy($"b").agg(count(lit(1)).as("rc"))
      val tots = terms.agg(
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("tt"),
        count(lit(1)).as("rt"))
      val scored = terms
        .join(rawCnt, Seq("b"))
        .join(tgtCnt, Seq("b"), "left")
        .crossJoin(broadcast(tots))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_toks"),
          avg(log((coalesce($"tc", lit(0L)) + 1) / ($"tt" + DsirBuckets).cast("double"))
            - log(($"rc" + 1) / ($"rt" + DsirBuckets).cast("double"))).as("s"))
      docs.select($"doc_id", $"lang")
        .join(scored, Seq("doc_id"), "left")
        .select($"doc_id", $"lang",
          coalesce($"n_toks", lit(0L)).cast("int").as("n_toks"),
          round(coalesce($"s", lit(0.0)), 4).as("dsir_score"))
        .orderBy($"doc_id")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, n_chars AS w FROM documents),
         |t AS (SELECT GREATEST(COALESCE(SUM(w), 0) // $SampleK, 1) AS step FROM d),
         |c AS (
         |  SELECT doc_id, w,
         |    CAST(COALESCE(SUM(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cum_before
         |  FROM d)
         |SELECT doc_id, w, cum_before,
         |  CAST((cum_before + w) // step - cum_before // step AS INT) AS multiplicity
         |FROM c, t
         |WHERE (cum_before + w) // step - cum_before // step > 0
         |ORDER BY doc_id""".stripMargin,
    "q_global_index" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) AS idx
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_feature_hash" ->
      s"""SELECT doc_id,
         |  CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT)
         |    % $FeatureBuckets AS bucket,
         |  COUNT(*) AS cnt
         |FROM (SELECT doc_id, unnest(list_filter(
         |  string_split_regex(lower(text), '${Text.Ws}+'),
         |  t -> length(t) > 0)) AS term FROM documents)
         |GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin,
    "q_priority_sample" ->
      s"""WITH k AS (
         |  SELECT doc_id, GREATEST(n_chars, 1) AS w,
         |    CAST(('0x' || substr(md5('ps' || doc_id), 1, 7)) AS BIGINT) AS h
         |  FROM documents)
         |SELECT doc_id, w, (h * $PriorityScale) // w AS pkey
         |FROM k ORDER BY pkey, doc_id LIMIT $PriorityK""".stripMargin,
    "q_dsir_select" ->
      s"""WITH terms AS (
         |  SELECT doc_id, lang,
         |    ${dsirBucketSql(s"unnest(list_filter(string_split_regex(lower(text), '${Text.Ws}+'), t -> length(t) > 0))")} AS b
         |  FROM documents),
         |tc AS (SELECT b, COUNT(*) AS tc FROM terms WHERE lang = 'en' GROUP BY b),
         |rc AS (SELECT b, COUNT(*) AS rc FROM terms GROUP BY b),
         |tots AS (
         |  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt,
         |    COUNT(*) AS rt
         |  FROM terms),
         |sc AS (
         |  SELECT terms.doc_id, COUNT(*) AS n_toks,
         |    AVG(ln((COALESCE(tc.tc, 0) + 1) / CAST(tots.tt + $DsirBuckets AS DOUBLE))
         |      - ln((rc.rc + 1) / CAST(tots.rt + $DsirBuckets AS DOUBLE))) AS s
         |  FROM terms
         |  JOIN rc USING (b)
         |  LEFT JOIN tc USING (b)
         |  CROSS JOIN tots
         |  GROUP BY terms.doc_id)
         |SELECT d.doc_id, d.lang,
         |  CAST(COALESCE(sc.n_toks, 0) AS INT) AS n_toks,
         |  ROUND(COALESCE(sc.s, 0.0), 4) AS dsir_score
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,
  )
}
