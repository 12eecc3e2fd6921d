package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** [EXT] Rule mining, profiling & entity resolution (SURVEY §2.13) —
  * the feature-engineering and data-audit operators between raw
  * ingest and model input: association rules over order baskets
  * (support/confidence/lift — the directed stage after
  * `q_copurchase`'s pair counting), rare-category collapse, blocked
  * fuzzy matching (the blocking trick that keeps entity resolution
  * out of all-pairs territory), per-column null/distinct audits, and
  * χ² term-class association for supervised feature selection.
  *
  * Scale discipline: baskets self-join on the order key with bounded
  * per-order width (never all-pairs across orders); fuzzy matching
  * compares only within blocking-key buckets; category and term
  * statistics shuffle (key, partial count) pairs with map-side
  * combine; parameter tables (category counts, class totals)
  * broadcast back to the row stream.
  */
object Mining extends QueryModule {

  /** Minimum basket co-occurrence count for a rule (absolute — the
    * fixture's basket width is fixed, so support counts scale with
    * row count and the threshold prunes the n_ab=1-2 noise floor).
    */
  val MinPairSupport = 3

  /** Rules kept, by descending lift. */
  val RulesTopK = 40

  /** A category is rare when its share is below 1/27 of rows — a
    * RELATIVE cut, so the collapse is scale-invariant (an absolute
    * count threshold would collapse everything at sf0.001 and nothing
    * at sf1).
    */
  val RareDenom = 27

  /** Maximum edit distance for a fuzzy block match. */
  val FuzzyMaxDist = 2

  /** Width of the length-band half of the fuzzy blocking key. Must be
    * ≥ [[FuzzyMaxDist]]: a pair within edit distance d differs in
    * length by ≤ d, so with band width ≥ d its two lengths fall in
    * the same or an adjacent band and the ±1 band expansion of the
    * probe side loses no true pair.
    */
  val FuzzyBandWidth = 4
  require(FuzzyBandWidth >= FuzzyMaxDist,
    "length-band blocking would drop true near-pairs")

  /** Minimum document frequency for a χ²-scored term. */
  val ChisqMinDf = 5

  /** Terms kept by descending χ². */
  val ChisqTopK = 30

  /** Target-encoding smoothing pseudo-count. */
  val EncodeSmoothing = 10.0

  /** Count-min sketch geometry: [[CmsRows]] independent md5-seeded
    * hash rows of [[CmsWidth]] buckets (ε ≈ e/w, δ ≈ e^−d). Width is
    * deliberately small so collisions are OBSERVABLE at test scale —
    * the estimate-vs-exact overcount column is the point.
    */
  val CmsRows = 4
  val CmsWidth = 256

  /** Keys scored against the sketch (the exact top-K heavy hitters). */
  val CmsTopK = 20

  /** CMS bucket of a key under seed row `r`: the [[Buckets]] md5
    * scheme with the row index salted into the digest input —
    * engine-portable (the oracle spells the same digest-parse chain)
    * and independent across rows as far as md5 mixes.
    */
  private def cmsBucket(r: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function(graft.plans.Md5Prefix.FunctionName,
      concat(r.cast("string"), lit(":"), key.cast("string")), lit(8)) % CmsWidth

  private def cmsBucketSql(rExpr: String, keyExpr: String): String =
    s"CAST(('0x' || substr(md5(CAST($rExpr AS VARCHAR) || ':' || " +
      s"CAST($keyExpr AS VARCHAR)), 1, 8)) AS BIGINT) % $CmsWidth"

  override def queries: Map[String, Query] = Map(
    // Association rules a⇒b over order baskets: support n_ab/n_orders,
    // confidence n_ab/n_a, lift conf/(n_b/n_orders). The pair join is
    // the A-Priori candidate stage — an equi-self-join on l_orderkey
    // whose cost is Σ width², bounded by the per-order line count
    // (≤7 in TPC-H shape), never |items|². Item and order totals are
    // integer counts; ratios are computed identically in both engines
    // from exact integers. Directed pairs (a≠b, both directions) so
    // confidence is per-antecedent.
    "q_assoc_rules" -> ((s, dir) => {
      import s.implicits._
      // NOT pinned, although the basket-item distinct is consumed
      // four times: a pin was measured and REJECTED at sf0.1 (quad
      // 3.2/2.8/2.7 unpinned vs 2.9/4.4/3.6 pinned — the ~560k-row
      // cache write costs more than the recomputes it saves, and
      // ReuseExchange already dedups the self-join's two sides).
      // The r14 pin-where-it-executes rule, negative branch.
      val items = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_partkey").distinct()
      val nOrders = items.agg(countDistinct($"l_orderkey").as("n_orders"))
      val itemCnt = items.groupBy($"l_partkey").agg(count(lit(1)).as("n_item"))
      val pairs = items.select($"l_orderkey", $"l_partkey".as("antecedent"))
        .join(items.select($"l_orderkey", $"l_partkey".as("consequent")),
          Seq("l_orderkey"))
        .filter($"antecedent" =!= $"consequent")
        .groupBy($"antecedent", $"consequent").agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= MinPairSupport)
      pairs
        .join(itemCnt.select($"l_partkey".as("antecedent"), $"n_item".as("n_a")),
          Seq("antecedent"))
        .join(itemCnt.select($"l_partkey".as("consequent"), $"n_item".as("n_b")),
          Seq("consequent"))
        .crossJoin(broadcast(nOrders))
        .select($"antecedent", $"consequent", $"n_ab",
          round($"n_ab".cast("double") / $"n_orders", 6).as("support"),
          round($"n_ab".cast("double") / $"n_a", 6).as("confidence"),
          round($"n_ab".cast("double") * $"n_orders"
            / ($"n_a".cast("double") * $"n_b"), 6).as("lift"))
        .orderBy($"lift".desc, $"antecedent", $"consequent")
        .limit(RulesTopK)
    }),

    // Rare-category collapse: brands under a RELATIVE frequency cut
    // fold into 'OTHER' before re-aggregation — the cardinality-
    // control step before one-hot/target encoding. The count table is
    // |categories| rows, broadcast back to the row stream; the
    // collapse itself is a codegen'd when/otherwise, no second
    // shuffle wider than the collapsed key domain.
    "q_rare_collapse" -> ((s, dir) => {
      import s.implicits._
      val p = Tables.part(s, dir)
      val counts = p.groupBy($"p_brand").agg(count(lit(1)).as("cnt"))
        .withColumn("total", sum($"cnt").over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
      p.join(broadcast(counts), "p_brand")
        .withColumn("brand_c",
          when($"cnt" * RareDenom < $"total", lit("OTHER")).otherwise($"p_brand"))
        .groupBy($"brand_c")
        .agg(count(lit(1)).as("n"), countDistinct($"p_brand").as("n_brands"))
        .orderBy($"brand_c")
    }),

    // Blocked fuzzy matching over part names — entity resolution's
    // blocking pattern: candidate pairs form ONLY within a blocking
    // key, then an edit-distance filter keeps near-matches. Work is
    // Σ block², bounded by the blocking-key distribution, never
    // |names|² — the same never-all-pairs argument as the MinHash
    // band join. Orientation n1 < n2 emits each pair once.
    //
    // TWO-key blocking (the standard multi-pass ER discipline): the
    // final name word alone leaves Σ block² quadratic in the largest
    // block, so a coarse word distribution at 100 TB concentrates the
    // join on one hot key. A length band (width [[FuzzyBandWidth]])
    // conjoins into the key: dist ≤ d forces |len₁ − len₂| ≤ d, and
    // with band width ≥ d the two lengths land in the same or an
    // ADJACENT band — the n1 side therefore emits each name under
    // bands {b−1, b, b+1} and the n2 side under its own band, so
    // every true near-pair meets on EXACTLY one (word, band) key
    // (the three emissions carry distinct bands — no dedup pass) and
    // the candidate set stays a superset of the true result: the
    // post-filter output, and hence the oracle, is unchanged. Cost:
    // 3× one side of the hash join's build input; gain: hot blocks
    // split by name length.
    "q_fuzzy_block_join" -> ((s, dir) => {
      import s.implicits._
      fuzzyCandidates(Tables.part(s, dir))
        .withColumn("dist", levenshtein($"n1", $"n2"))
        .filter($"dist" <= FuzzyMaxDist)
        .select($"block", $"n1", $"n2", $"dist")
        .orderBy($"block", $"n1", $"n2")
    }),

    // Per-column audit of the events table: row count, nulls,
    // exact distinct — the schema-drift / completeness gate a
    // pipeline runs on every new batch. ONE aggregation pass computes
    // every statistic (Catalyst expands the multi-distinct), then a
    // stack() generator unpivots the single row into one row per
    // column — the audit never scans the table per column.
    "q_null_audit" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .agg(
          count(lit(1)).as("n"),
          count($"event_type").as("nn_et"), countDistinct($"event_type").as("nd_et"),
          count($"user_id").as("nn_uid"), countDistinct($"user_id").as("nd_uid"),
          count($"value").as("nn_val"), countDistinct($"value").as("nd_val"),
          count($"props").as("nn_pr"), countDistinct($"props").as("nd_pr"))
        .selectExpr(
          """stack(4,
            |  'event_type', n - nn_et, nd_et,
            |  'props',      n - nn_pr, nd_pr,
            |  'user_id',    n - nn_uid, nd_uid,
            |  'value',      n - nn_val, nd_val
            |) as (column_name, n_null, n_distinct)""".stripMargin,
          "n")
        .select($"column_name", $"n", $"n_null", $"n_distinct",
          // NULLIF guard: an audited table CAN be empty (n = 0), and
          // ANSI mode makes 0/0 an error, not NaN.
          round($"n_null".cast("double") / nullif($"n", lit(0L)), 6).as("frac_null"))
        .orderBy($"column_name")
    }),

    // χ² term–class association (en vs rest) — supervised feature
    // selection over document presence counts. Presence (not raw
    // frequency): distinct (doc, term) after the shared tokenizer.
    // The 2×2 table per term comes from one groupBy over exploded
    // presence rows; class totals are a 1-row broadcast. χ² =
    // N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) in doubles (the integer
    // products overflow a long past ~1e5 docs; both engines run the
    // identical double formula on exact integer inputs).
    "q_chisq_terms" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", ($"lang" === "en").as("pos"),
          explode(array_distinct(Text.tokens(lower($"text")))).as("term"))
      val totals = Tables.documents(s, dir).agg(
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("np"),
        sum(when($"lang" === "en", 0L).otherwise(1L)).as("nn"))
      docs.groupBy($"term")
        .agg(sum(when($"pos", 1L).otherwise(0L)).as("a"),
          sum(when($"pos", 0L).otherwise(1L)).as("b"))
        .filter($"a" + $"b" >= ChisqMinDf)
        .crossJoin(broadcast(totals))
        .withColumn("c", ($"np" - $"a").cast("double"))
        .withColumn("d", ($"nn" - $"b").cast("double"))
        .withColumn("ad", $"a".cast("double"))
        .withColumn("bd", $"b".cast("double"))
        .select($"term", ($"a" + $"b").as("df"),
          round(($"np" + $"nn").cast("double")
            * pow($"ad" * $"d" - $"bd" * $"c", 2)
            / (($"ad" + $"bd") * ($"c" + $"d")
              * ($"ad" + $"c") * ($"bd" + $"d")), 4).as("chi2"))
        .orderBy($"chi2".desc, $"term")
        .limit(ChisqTopK)
    }),

    // Smoothed target-mean encoding of brand → retail price: enc =
    // (Σy + m·μ)/(n + m) — the high-cardinality categorical encoder
    // (smoothing pulls thin categories toward the global mean μ).
    // One per-category aggregate plus a 1-row global broadcast. The
    // target is fixed to integer cents PER ROW (exact under any
    // partitioning/order — a raw double Σy flipped a 4-dp rounding
    // boundary in the 1-vs-7-partition sweep), so doubles appear only
    // in the final closed form.
    "q_target_encode" -> ((s, dir) => {
      import s.implicits._
      val p = Tables.part(s, dir)
        .select($"p_brand",
          round($"p_retailprice" * 100).cast("long").as("cents"))
      val g = p.agg(sum($"cents").as("sy"), count(lit(1)).as("ny"))
      p.groupBy($"p_brand")
        .agg(sum($"cents").as("sb"), count(lit(1)).as("n"))
        .crossJoin(broadcast(g))
        .select($"p_brand", $"n",
          round(($"sb" / 100.0 + lit(EncodeSmoothing) * ($"sy" / 100.0 / $"ny"))
            / ($"n" + lit(EncodeSmoothing)), 4).as("enc"))
        .orderBy($"p_brand")
    }),

    // Equal-frequency decile binning of order totals: the 9 interior
    // cut points come from ONE exact-percentile aggregate (an agg,
    // never a sort), broadcast as a 1-row array; assignment is
    // "count of edges ≤ x" over that 9-element array per row. The
    // discretization step before monotone-feature models and
    // histogram drift checks.
    "q_quantile_bins" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir).select($"o_totalprice")
      val edges = o.agg(expr(
        "percentile(o_totalprice, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("edges"))
      o.crossJoin(broadcast(edges))
        .select(size(filter($"edges", e => $"o_totalprice" >= e)).as("bin"),
          $"o_totalprice")
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"))
        .orderBy($"bin")
    }),

    // Count-min sketch with an exact ground truth: CmsRows md5-seeded
    // hash rows × CmsWidth counters (sketch state is rows × width
    // counters — CONSTANT however large the stream, and buckets merge
    // by addition across shards/batches); the exact top-K heavy
    // hitters then read their estimate back (min over rows) and
    // report the collision overcount. est ≥ exact always — the
    // one-sided CMS guarantee — pinned by spec; the whole chain is
    // md5-deterministic, so the oracle replays it exactly.
    //
    // The sketch is built over the per-key EXACT-count aggregate
    // (which the ground-truth side needs anyway, pinned once), not
    // the raw stream: summing counts into buckets is identical to
    // counting bucket hits, but the d-way explode and its d md5
    // evaluations then run over the key-bounded table instead of
    // every stream row — ~30× fewer md5s at sf0.1 (measured 2.5 →
    // 0.9 s warm), and at 100 TB the d× row inflation rides on
    // |keys|, not the corpus.
    "q_count_min" -> ((s, dir) => graft.Pins.scoped { pins =>
      import s.implicits._
      val kcnt = pins(Tables.lineitem(s, dir)
        .groupBy($"l_partkey").agg(count(lit(1)).as("n_exact")))
      val cms = kcnt
        .select($"l_partkey", $"n_exact",
          explode(sequence(lit(0), lit(CmsRows - 1))).as("r"))
        .select($"r", cmsBucket($"r", $"l_partkey").as("bucket"), $"n_exact")
        .groupBy($"r", $"bucket").agg(sum($"n_exact").as("cnt"))
      val top = kcnt.orderBy($"n_exact".desc, $"l_partkey".asc).limit(CmsTopK)
      top
        .select($"l_partkey", $"n_exact",
          explode(sequence(lit(0), lit(CmsRows - 1))).as("r"))
        .withColumn("bucket", cmsBucket($"r", $"l_partkey"))
        .join(cms, Seq("r", "bucket"))
        .groupBy($"l_partkey")
        .agg(max($"n_exact").as("n_exact"), min($"cnt").as("n_est"))
        .select($"l_partkey", $"n_exact", $"n_est",
          ($"n_est" - $"n_exact").as("overcount"))
        .orderBy($"n_exact".desc, $"l_partkey".asc)
    }),

    // [EXT r12] Referential-integrity audit across the star schema —
    // the orphan-rate completeness gate next to q_null_audit's
    // per-column audit: for each FK relation, child rows whose key
    // has no parent. Plan per relation: keys-only pruned scans, the
    // parent key distinct'd (correctness under a non-unique parent —
    // a plain join would multiply counts), ONE left join + one
    // aggregate counting null-parent hits — the shuffle moves keys,
    // never rows. Four relations union four 1-row aggregates.
    "q_fk_audit" -> ((s, dir) => {
      import s.implicits._
      def rel(name: String, child: org.apache.spark.sql.DataFrame,
          key: String, parent: org.apache.spark.sql.DataFrame,
          pkey: String) =
        child.select(col(key).as("k"))
          .join(parent.select(col(pkey).as("k")).distinct()
            .withColumn("hit", lit(1)), Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when($"hit".isNull, 1L).otherwise(0L)).as("n_orphan"))
          .select(lit(name).as("relation"), $"n_child", $"n_orphan",
            round($"n_orphan".cast("double") / $"n_child", 6)
              .as("orphan_rate"))
      rel("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")
        .unionAll(rel("lineitem->part", Tables.lineitem(s, dir), "l_partkey",
          Tables.part(s, dir), "p_partkey"))
        .unionAll(rel("lineitem->supplier", Tables.lineitem(s, dir),
          "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
        .unionAll(rel("orders->customer", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .orderBy($"relation")
    }),

    // [EXT r13] Entity consolidation — the step AFTER
    // q_fuzzy_block_join that makes it entity resolution: the matched
    // name pairs form a graph whose CONNECTED COMPONENTS are the
    // entities (A~B and B~C put A,C in one entity even when their
    // direct distance exceeds the threshold — transitive merge, the
    // standard ER clustering rule). Names map to stable integer node
    // ids (min p_partkey per name — a names-bounded aggregate), the
    // components come from the same large-star/small-star alternation
    // as q_dedup_groups (O(log n) checkpoint-truncated rounds, fully
    // distributed), and the report is one bounded aggregate per
    // entity: member count + lexicographic-min canonical name (the
    // survivorship pick). Singleton names never enter (only matched
    // pairs carry edges) — the q_dedup_groups rule.
    "q_er_entities" -> ((s, dir) => {
      import s.implicits._
      val parts = Tables.part(s, dir)
      val ids = parts.groupBy($"p_name").agg(min($"p_partkey").as("nid"))
      val edges = fuzzyCandidates(parts)
        .filter(levenshtein($"n1", $"n2") <= FuzzyMaxDist)
        .join(ids.select($"p_name".as("n1"), $"nid".as("src")), Seq("n1"))
        .join(ids.select($"p_name".as("n2"), $"nid".as("dst")), Seq("n2"))
        .select($"src", $"dst")
      graft.functions.Dedup.connectedComponents(edges)
        .join(ids.select($"nid".as("id"), $"p_name"), Seq("id"))
        .groupBy($"label".as("entity_id"))
        .agg(count(lit(1)).as("n_names"), min($"p_name").as("canonical_name"))
        .orderBy($"entity_id")
    }),
  )

  /** Candidate pairs of `q_fuzzy_block_join`'s two-key blocking
    * (final name word × length band ±1), BEFORE the edit-distance
    * filter — split out so the spec can assert the candidate-count
    * bound on an adversarially skewed fixture (one dominant final
    * word) instead of the shape merely being asserted in comments.
    * Input: any frame with a `p_name` string column.
    */
  private[graft] def fuzzyCandidates(
      parts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import parts.sparkSession.implicits._
    val names = parts.select($"p_name").distinct()
      .withColumn("block", element_at(split($"p_name", " "), -1))
      .withColumn("band", (length($"p_name") / FuzzyBandWidth).cast("int"))
    val probe = names.select($"block", $"p_name".as("n1"),
        explode(array($"band" - 1, $"band", $"band" + 1)).as("band"))
    probe
      .join(names.select($"block", $"band", $"p_name".as("n2")),
        Seq("block", "band"))
      .filter($"n1" < $"n2")
  }

  override def oracles: Map[String, String] = Map(
    "q_fk_audit" ->
      """WITH r1 AS (
        |  SELECT 'lineitem->orders' AS relation, COUNT(*) AS n_child,
        |    CAST(COUNT(*) FILTER (WHERE p.k IS NULL) AS BIGINT) AS n_orphan
        |  FROM lineitem c LEFT JOIN
        |    (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON c.l_orderkey = p.k),
        |r2 AS (
        |  SELECT 'lineitem->part', COUNT(*),
        |    CAST(COUNT(*) FILTER (WHERE p.k IS NULL) AS BIGINT)
        |  FROM lineitem c LEFT JOIN
        |    (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON c.l_partkey = p.k),
        |r3 AS (
        |  SELECT 'lineitem->supplier', COUNT(*),
        |    CAST(COUNT(*) FILTER (WHERE p.k IS NULL) AS BIGINT)
        |  FROM lineitem c LEFT JOIN
        |    (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |    ON c.l_suppkey = p.k),
        |r4 AS (
        |  SELECT 'orders->customer', COUNT(*),
        |    CAST(COUNT(*) FILTER (WHERE p.k IS NULL) AS BIGINT)
        |  FROM orders c LEFT JOIN
        |    (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON c.o_custkey = p.k),
        |u AS (
        |  SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |  UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4)
        |SELECT relation, n_child, n_orphan,
        |  ROUND(CAST(n_orphan AS DOUBLE) / n_child, 6) AS orphan_rate
        |FROM u ORDER BY relation""".stripMargin,
    "q_assoc_rules" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
         |item_cnt AS (
         |  SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY l_partkey),
         |pairs AS (
         |  SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
         |    COUNT(*) AS n_ab
         |  FROM items a JOIN items b USING (l_orderkey)
         |  WHERE a.l_partkey <> b.l_partkey
         |  GROUP BY 1, 2
         |  HAVING COUNT(*) >= $MinPairSupport)
         |SELECT antecedent, consequent, n_ab,
         |  ROUND(CAST(n_ab AS DOUBLE) / n_orders, 6) AS support,
         |  ROUND(CAST(n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
         |  ROUND(CAST(n_ab AS DOUBLE) * n_orders
         |    / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
         |FROM pairs
         |JOIN item_cnt ia ON ia.l_partkey = antecedent
         |JOIN item_cnt ib ON ib.l_partkey = consequent
         |CROSS JOIN n_orders
         |ORDER BY lift DESC, antecedent, consequent
         |LIMIT $RulesTopK""".stripMargin,
    "q_rare_collapse" ->
      s"""WITH counts AS (
         |  SELECT p_brand, COUNT(*) AS cnt, SUM(COUNT(*)) OVER () AS total
         |  FROM part GROUP BY p_brand)
         |SELECT CASE WHEN c.cnt * $RareDenom < c.total
         |    THEN 'OTHER' ELSE p.p_brand END AS brand_c,
         |  COUNT(*) AS n,
         |  COUNT(DISTINCT p.p_brand) AS n_brands
         |FROM part p JOIN counts c USING (p_brand)
         |GROUP BY 1 ORDER BY brand_c""".stripMargin,
    "q_fuzzy_block_join" ->
      s"""WITH names AS (
         |  SELECT DISTINCT p_name,
         |    string_split(p_name, ' ')[-1] AS block
         |  FROM part)
         |SELECT a.block, a.p_name AS n1, b.p_name AS n2,
         |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         |FROM names a JOIN names b
         |  ON a.block = b.block AND a.p_name < b.p_name
         |WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
         |ORDER BY a.block, n1, n2""".stripMargin,
    "q_null_audit" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(event_type) AS nn_et, COUNT(DISTINCT event_type) AS nd_et,
        |    COUNT(user_id) AS nn_uid, COUNT(DISTINCT user_id) AS nd_uid,
        |    COUNT("value") AS nn_val, COUNT(DISTINCT "value") AS nd_val,
        |    COUNT(props) AS nn_pr, COUNT(DISTINCT props) AS nd_pr
        |  FROM events),
        |u AS (
        |  SELECT 'event_type' AS column_name, n, n - nn_et AS n_null, nd_et AS n_distinct FROM a
        |  UNION ALL SELECT 'props', n, n - nn_pr, nd_pr FROM a
        |  UNION ALL SELECT 'user_id', n, n - nn_uid, nd_uid FROM a
        |  UNION ALL SELECT 'value', n, n - nn_val, nd_val FROM a)
        |SELECT column_name, n, n_null, n_distinct,
        |  ROUND(CAST(n_null AS DOUBLE) / NULLIF(n, 0), 6) AS frac_null
        |FROM u ORDER BY column_name""".stripMargin,
    "q_chisq_terms" ->
      s"""WITH pres AS (
         |  SELECT DISTINCT doc_id, lang = 'en' AS pos,
         |    unnest(list_filter(string_split_regex(lower(text), '${Text.Ws}+'),
         |      t -> length(t) > 0)) AS term
         |  FROM documents),
         |totals AS (
         |  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
         |    SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
         |  FROM documents),
         |cnt AS (
         |  SELECT term,
         |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS b
         |  FROM pres GROUP BY term
         |  HAVING SUM(CASE WHEN pos THEN 1 ELSE 0 END)
         |    + SUM(CASE WHEN pos THEN 0 ELSE 1 END) >= $ChisqMinDf)
         |SELECT term, CAST(a + b AS BIGINT) AS df,
         |  ROUND(CAST(np + nn AS DOUBLE)
         |    * POWER(CAST(a AS DOUBLE) * (nn - b) - CAST(b AS DOUBLE) * (np - a), 2)
         |    / ((CAST(a AS DOUBLE) + b) * ((np - a) + CAST(nn - b AS DOUBLE))
         |      * (CAST(a AS DOUBLE) + (np - a)) * (CAST(b AS DOUBLE) + (nn - b))), 4)
         |    AS chi2
         |FROM cnt CROSS JOIN totals
         |ORDER BY chi2 DESC, term LIMIT $ChisqTopK""".stripMargin,
    "q_target_encode" ->
      s"""WITH c AS (
         |  SELECT p_brand,
         |    CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents
         |  FROM part),
         |g AS (SELECT CAST(SUM(cents) AS BIGINT) AS sy, COUNT(*) AS ny FROM c),
         |b AS (
         |  SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS sb, COUNT(*) AS n
         |  FROM c GROUP BY p_brand)
         |SELECT p_brand, n,
         |  ROUND((sb / 100.0 + $EncodeSmoothing * (sy / 100.0 / ny))
         |    / (n + $EncodeSmoothing), 4) AS enc
         |FROM b CROSS JOIN g ORDER BY p_brand""".stripMargin,
    "q_quantile_bins" ->
      """WITH e AS (
        |  SELECT quantile_cont(o_totalprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
        |  FROM orders),
        |b AS (
        |  SELECT CAST(len(list_filter(e.edges, x -> o_totalprice >= x)) AS INT)
        |    AS bin, o_totalprice
        |  FROM orders CROSS JOIN e)
        |SELECT bin, COUNT(*) AS n,
        |  ROUND(MIN(o_totalprice), 2) AS lo,
        |  ROUND(MAX(o_totalprice), 2) AS hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_count_min" ->
      s"""WITH seeds AS (SELECT unnest(range(0, $CmsRows)) AS r),
         |cms AS (
         |  SELECT s.r, ${cmsBucketSql("s.r", "l_partkey")} AS bucket,
         |    COUNT(*) AS cnt
         |  FROM lineitem CROSS JOIN seeds s
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT l_partkey, COUNT(*) AS n_exact FROM lineitem
         |  GROUP BY 1 ORDER BY n_exact DESC, l_partkey ASC LIMIT $CmsTopK),
         |est AS (
         |  SELECT t.l_partkey, MAX(t.n_exact) AS n_exact, MIN(c.cnt) AS n_est
         |  FROM top t CROSS JOIN seeds s
         |  JOIN cms c ON c.r = s.r
         |    AND c.bucket = ${cmsBucketSql("s.r", "t.l_partkey")}
         |  GROUP BY t.l_partkey)
         |SELECT l_partkey, n_exact, n_est, n_est - n_exact AS overcount
         |FROM est ORDER BY n_exact DESC, l_partkey ASC""".stripMargin,
    // Entity components as a reachability fixpoint — the
    // q_dedup_groups recursive-CTE pattern over the fuzzy-matched
    // name graph (blocking is a candidate-generation optimization;
    // the matched PAIR set, and hence the components, are exactly
    // the block-equal dist≤d pairs this twin spells).
    "q_er_entities" ->
      s"""WITH RECURSIVE names AS (
         |  SELECT DISTINCT p_name,
         |    string_split(p_name, ' ')[-1] AS block
         |  FROM part),
         |ids AS (SELECT p_name, MIN(p_partkey) AS nid FROM part
         |        GROUP BY p_name),
         |pr AS (
         |  SELECT ia.nid AS a, ib.nid AS b
         |  FROM names x JOIN names y
         |    ON x.block = y.block AND x.p_name < y.p_name
         |  JOIN ids ia ON ia.p_name = x.p_name
         |  JOIN ids ib ON ib.p_name = y.p_name
         |  WHERE levenshtein(x.p_name, y.p_name) <= $FuzzyMaxDist),
         |ed AS (SELECT a, b FROM pr UNION SELECT b AS a, a AS b FROM pr),
         |nodes AS (SELECT DISTINCT a AS id FROM ed),
         |reach(id, label) AS (
         |  SELECT id, id AS label FROM nodes
         |  UNION
         |  SELECT e.a AS id, r.label FROM ed e JOIN reach r ON r.id = e.b),
         |comp AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id)
         |SELECT comp.label AS entity_id, COUNT(*) AS n_names,
         |  MIN(i.p_name) AS canonical_name
         |FROM comp JOIN ids i ON i.nid = comp.id
         |GROUP BY comp.label ORDER BY entity_id""".stripMargin,
  )
}
