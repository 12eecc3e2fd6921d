package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational spine: scan/project, cast chains, null fill,
  * dictionary-driven CASE-WHEN labeling, equality filter + top-K
  * group-count, literal-membership filter, local-rows source.
  *
  * Mirrors the reference's cleaning + analytics shapes
  * (`Code/flight_analysis.py:15-126,188-220`) re-expressed on the
  * testdata tables. All operators are pure `DataFrame => DataFrame`
  * compositions of Catalyst built-ins: projections collapse, filters
  * push to the parquet scan, the top-K plans as
  * `TakeOrderedAndProjectExec` (per-partition top-K, no global sort).
  */
object Relational extends QueryModule {

  /** Dictionary → CASE-WHEN compiler: the reference builds a SQL CASE
    * expression string from a Python dict (`Code/flight_analysis.py:29-41`);
    * here the same partial-evaluation trick folds a Map into chained
    * `when` columns at plan-build time (Catalyst constant-folds it).
    */
  def caseWhenMap(key: Column, mapping: Seq[(String, String)], default: String): Column =
    mapping.foldLeft(lit(default)) { case (acc, (k, v)) => when(key === k, lit(v)).otherwise(acc) }

  /** Top-K by group count: filter → groupBy → count → orderBy desc →
    * limit. The reference's signature query (`Code/flight_analysis.py:197-208`)
    * with a deterministic tiebreaker added (the reference's count-only
    * sort is nondeterministic across partitionings). Catalyst plans the
    * sort+limit as TakeOrderedAndProject — no full shuffle sort.
    */
  def topKByCount(df: DataFrame, filterCol: Column, groupCol: String, k: Int): DataFrame =
    df.filter(filterCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(groupCol).asc)
      .limit(k)

  /** Morton (Z-order) interleave of two 8-bit bucketed dims: x bits on
    * even positions, y bits on odd. Shared by the `q_zorder` query and
    * the layout-payoff evidence in SinkSpec — a table SORTED by this
    * value clusters rows that are close in BOTH dims into the same
    * parquet row groups, so per-row-group min/max stats prune a 2-D
    * range predicate on either dim (a lexicographic sort only prunes
    * the leading one). Pure codegen'd shift/mask arithmetic.
    */
  private[graft] def mortonZ(gx: Column, gy: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The reference's priority-code → readable-reason dictionary shape
    * (`Code/flight_analysis.py:29-41`), keyed on order priority.
    */
  private val priorityLabels = Seq(
    "1-URGENT"        -> "Carrier Caused",
    "2-HIGH"          -> "Weather",
    "3-MEDIUM"        -> "National Aviation System",
    "4-NOT SPECIFIED" -> "Security")

  override def queries: Map[String, Query] = Map(
    // Scan + projection + pushed filter (SURVEY §2.1/§2.2).
    "q_scan_project" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .filter($"l_quantity" > 45)
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Local-rows source: the reference's in-memory scoring table
    // (`Code/flight_analysis.py:188-194`).
    "q_local_rows" -> ((s, _) => {
      import s.implicits._
      Seq(
        (1, 10, 6, 500, "Delta"),
        (2, 14, 7, 800, "United"),
        (3, 9, 3, 1200, "Southwest Airlines"),
        (5, 16, 12, 2400, "American Airlines"),
        (6, 21, 9, 300, "Frontier Airlines"))
        .toDF("dow", "dep_hour", "mon", "distance", "airline")
        .orderBy($"dow")
    }),

    // Cast chains: double→int (via floor: Spark truncates, DuckDB
    // rounds — floor first makes both agree), int→boolean-ish
    // predicate, int→string→double round-trip
    // (`Code/flight_analysis.py:56-63,82-87,102`).
    "q_cast_clean" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).select(
        $"l_orderkey", $"l_linenumber",
        floor($"l_quantity").cast("int").as("qty_int"),
        floor($"l_extendedprice" / 100).cast("int").as("price_h"),
        ($"l_linenumber" % 2 === 1).as("odd_line"),
        $"l_orderkey".cast("string").cast("double").as("key_d"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Null fill with numeric + string defaults via na.fill
    // (`Code/flight_analysis.py:44-53,73-80`); nulls are manufactured
    // deterministically since testdata has none.
    "q_null_fill" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).select(
        $"o_orderkey",
        when($"o_orderpriority" === "1-URGENT", lit(null)).otherwise($"o_totalprice").as("price_n"),
        when($"o_orderstatus" === "F", lit(null)).otherwise($"o_orderstatus").as("status_n"))
        .na.fill(Map("price_n" -> 0.0, "status_n" -> "None"))
        .orderBy($"o_orderkey")
    }),

    // Dictionary-driven CASE-WHEN mapping + binary threshold label
    // (`Code/flight_analysis.py:29-41,64,123-125`).
    "q_case_label" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).select(
        $"o_orderkey",
        caseWhenMap($"o_orderpriority", priorityLabels, "No Cancellation").as("priority_label"),
        when($"o_totalprice" > 150000, 1).otherwise(0).as("is_big"))
        .orderBy($"o_orderkey")
    }),

    // Flagship: filter → group-count → top-K (`Code/flight_analysis.py:197-208`).
    "q_filter_topk_count" -> ((s, dir) => {
      import s.implicits._
      topKByCount(Tables.orders(s, dir), $"o_orderstatus" === "F", "o_custkey", 5)
    }),

    // Literal membership filter (`Code/flight_analysis.py:219-220`).
    // Kept for parity with the reference's collect+isin idiom; the
    // scale-correct version of the same semantics is q_join_semi.
    "q_isin_filter" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // [EXT] distributed TOTAL sort — the one §2.6 shape top-K can't
    // substitute: a globally ordered result without a LIMIT. Spark
    // plans this as a sampled range-partitioning exchange + per-
    // partition sort (PlanSpec pins `Exchange rangepartitioning`):
    // every reducer receives a disjoint key range and sorts locally,
    // so there is NO single-reducer stage and output ordering is
    // global by partition concatenation — the only scalable shape for
    // "write the corpus ordered by X" (e.g. laying out parquet sorted
    // for min-max pruning). Tiebreakers make the order total, so the
    // result is deterministic row-for-row.
    "q_global_sort" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    }),

    // [EXT] Z-order (Morton) interleaving — the data-layout primitive
    // behind multi-dimensional clustering: interleave the bits of two
    // bucketed dimensions so rows close in (customer, price) land
    // close in z-value; sorting/bucketing the table by `zval` at write
    // time then gives min-max row-group pruning on BOTH dimensions at
    // read time, where a lexicographic sort only prunes the leading
    // one. Pure per-row integer bit arithmetic (codegen'd shifts), no
    // shuffle; the companion q_global_sort is the write-side ordering
    // pass.
    "q_zorder" -> ((s, dir) => {
      import s.implicits._
      val x = ($"o_custkey" % 256).cast("long")
      val y = floor($"o_totalprice" / lit(2000.0)).cast("long") % 256
      Tables.orders(s, dir)
        .select($"o_orderkey", x.as("gx"), y.as("gy"))
        .withColumn("zval", mortonZ($"gx", $"gy"))
        .orderBy($"o_orderkey")
    }),

    // [EXT] SQL-string entry path: the same engine surface through
    // `spark.sql` over registered temp views — Catalyst receives the
    // identical unresolved plan either way (SURVEY §3's lifecycle
    // point), so a user can mix the DataFrame API and raw ANSI SQL
    // freely. The query itself is a dim-join + aggregate whose oracle
    // is literally the same SQL text.
    "q_sql_api" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS n_orders,
          |  ROUND(SUM(o_totalprice), 4) AS revenue
          |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    // [EXT] stratified sampling — the training-data downsampler
    // (per-language quotas when rebalancing a corpus). Per-stratum
    // rates via SALTED md5 hash buckets instead of `stat.sampleBy`'s
    // Bernoulli RNG: one scan, no shuffle, and membership is a pure
    // function of the key — stable across runs, engines, AND
    // incremental corpus refreshes (re-sampling an appended corpus
    // keeps every historical decision), which RNG sampling cannot
    // promise. The salt decorrelates this decision from the other
    // hash-bucket consumers (q_train_split / q_mix_weighted bucket the
    // raw id: an unsalted reuse would glue "sampled" to "test split").
    // Engine-portable ⇒ fully oracle-checked — the kept SET, not just
    // its size (`stat.sampleBy` itself stays exercised in
    // OperatorBreadthSpec as API surface).
    "q_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val rate = StratRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
        when($"lang" === l, lit(r)).otherwise(acc)
      }
      Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          graft.functions.Buckets.hashBucket(
            concat(lit(StratSalt), $"doc_id".cast("string"))).as("bucket"),
          rate.as("rate"))
        .filter($"bucket" < $"rate")
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // [EXT r12] Sampling audit of the stratified sampler: per
    // language, the realized sample count against the nominal
    // expectation n·rate/100, with the χ² contribution that says
    // whether the md5 buckets delivered the advertised rates — the
    // gate a pipeline runs on its OWN sampler before trusting a
    // mixture (rates and salt shared verbatim with
    // q_sample_stratified, so the audit can never test a different
    // sampler than the one shipping). ONE aggregate over the corpus:
    // per-lang counts and in-sample counts in the same pass; the χ²
    // arithmetic runs on the |langs|-row result.
    "q_sample_audit" -> ((s, dir) => {
      import s.implicits._
      val rate = StratRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
        when($"lang" === l, lit(r)).otherwise(acc)
      }
      Tables.documents(s, dir)
        .select($"lang",
          (graft.functions.Buckets.hashBucket(
            concat(lit(StratSalt), $"doc_id".cast("string"))) < rate)
            .as("in_sample"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_full"),
          sum(when($"in_sample", 1L).otherwise(0L)).as("n_sample"))
        .withColumn("rate", StratRates.foldLeft(lit(0)) {
          case (acc, (l, r)) => when($"lang" === l, lit(r)).otherwise(acc)
        })
        // A zero-rate language has expectation 0 and an undefined χ²
        // term — excluded, the q_psi empty-bin convention.
        .filter($"rate" > 0)
        .withColumn("e", $"n_full".cast("double") * $"rate" / 100)
        .select($"lang", $"n_full", $"n_sample",
          round($"e", 2).as("expected"),
          round(($"n_sample" - $"e") * ($"n_sample" - $"e") / $"e", 4)
            .as("chi2_contrib"))
        .orderBy($"lang")
    }),

    // [EXT] deterministic train/val/test split — hash-bucket
    // assignment (98/1/1) from md5 of the key, so the split is stable
    // across runs, machines, and engines (unlike RNG-based sampling):
    // a doc's destination is a pure function of its id, which is what
    // makes incremental corpus refreshes keep historical membership.
    // Pure per-row projection, no shuffle.
    "q_train_split" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          graft.functions.Buckets.hashBucket($"doc_id").as("bucket"))
        .withColumn("split",
          when($"bucket" < 98, "train")
            .when($"bucket" < 99, "val")
            .otherwise("test"))
        .orderBy($"doc_id")
    }),
  )

  /** Morton-interleave SQL terms generated from the SAME loop bounds
    * the Spark query uses, so the two engines can never drift.
    */
  private val zorderTerms: String = (0 until 8).map { i =>
    s"(((gx >> $i) & 1) << ${2 * i}) + (((gy >> $i) & 1) << ${2 * i + 1})"
  }.mkString(" + ")

  /** Per-language sampling rates in bucket points (of 100) and the
    * decision salt — shared verbatim by the Spark query and its SQL
    * twin so the two can never drift. Ordered (ListMap-like Seq) so
    * the generated CASE chain is deterministic.
    */
  private val StratRates: Seq[(String, Int)] =
    Seq("en" -> 50, "de" -> 25, "fr" -> 25, "es" -> 25, "zh" -> 25)
  private val StratSalt = "strat:"

  private def stratRateCaseSql: String =
    StratRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", " ELSE 0 END")

  override def oracles: Map[String, String] = Map(
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${graft.functions.Buckets.hashBucketSql(s"'$StratSalt' || doc_id")}
         |  < $stratRateCaseSql
         |ORDER BY doc_id""".stripMargin,
    "q_sample_audit" ->
      s"""WITH flags AS (
         |  SELECT lang,
         |    ${graft.functions.Buckets.hashBucketSql(s"'$StratSalt' || doc_id")}
         |      < $stratRateCaseSql AS in_sample
         |  FROM documents),
         |cnt AS (
         |  SELECT lang, COUNT(*) AS n_full,
         |    CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_sample,
         |    $stratRateCaseSql AS rate
         |  FROM flags GROUP BY lang),
         |ex AS (
         |  SELECT lang, n_full, n_sample,
         |    CAST(n_full AS DOUBLE) * rate / 100 AS e
         |  FROM cnt WHERE rate > 0)
         |SELECT lang, n_full, n_sample,
         |  ROUND(e, 2) AS expected,
         |  ROUND((n_sample - e) * (n_sample - e) / e, 4) AS chi2_contrib
         |FROM ex ORDER BY lang""".stripMargin,
    "q_global_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,
    "q_zorder" ->
      s"""WITH g AS (
         |  SELECT o_orderkey, o_custkey % 256 AS gx,
         |    CAST(FLOOR(o_totalprice / 2000.0) AS BIGINT) % 256 AS gy
         |  FROM orders)
         |SELECT o_orderkey, gx, gy, ($zorderTerms) AS zval
         |FROM g ORDER BY o_orderkey""".stripMargin,
    "q_sql_api" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 4) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_train_split" ->
      s"""SELECT doc_id,
         |  ${graft.functions.Buckets.hashBucketSql("doc_id")} AS bucket,
         |  CASE WHEN ${graft.functions.Buckets.hashBucketSql("doc_id")} < 98 THEN 'train'
         |       WHEN ${graft.functions.Buckets.hashBucketSql("doc_id")} < 99 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_local_rows" ->
      """SELECT * FROM (VALUES
        |  (1, 10, 6, 500, 'Delta'),
        |  (2, 14, 7, 800, 'United'),
        |  (3, 9, 3, 1200, 'Southwest Airlines'),
        |  (5, 16, 12, 2400, 'American Airlines'),
        |  (6, 21, 9, 300, 'Frontier Airlines'))
        |  AS t(dow, dep_hour, mon, distance, airline)
        |ORDER BY dow""".stripMargin,
    "q_cast_clean" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(FLOOR(l_quantity) AS INT) AS qty_int,
        |  CAST(FLOOR(l_extendedprice / 100) AS INT) AS price_h,
        |  (l_linenumber % 2 = 1) AS odd_line,
        |  CAST(CAST(l_orderkey AS VARCHAR) AS DOUBLE) AS key_d
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_null_fill" ->
      """SELECT o_orderkey,
        |  COALESCE(CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_totalprice END, 0.0) AS price_n,
        |  COALESCE(CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END, 'None') AS status_n
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_case_label" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'Carrier Caused'
        |       WHEN o_orderpriority = '2-HIGH' THEN 'Weather'
        |       WHEN o_orderpriority = '3-MEDIUM' THEN 'National Aviation System'
        |       WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'Security'
        |       ELSE 'No Cancellation' END AS priority_label,
        |  CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS is_big
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_filter_topk_count" ->
      """SELECT o_custkey, COUNT(*) AS cnt
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_custkey
        |ORDER BY cnt DESC, o_custkey LIMIT 5""".stripMargin,
    "q_isin_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |ORDER BY c_custkey""".stripMargin,
  )
}
