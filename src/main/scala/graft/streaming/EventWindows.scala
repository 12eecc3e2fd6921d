package graft.streaming

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Time-window analytics on `events` (SURVEY §2.11), batch-first
  * so the DuckDB oracle can check the semantics, with Structured
  * Streaming twins of the same logic for stream execution (tested via
  * file/memory sources in the spec suite).
  *
  * Window aggregation shuffles once on (window, key) — with a
  * watermark in streaming mode state is bounded and late rows beyond
  * the watermark are dropped.
  */
object EventWindows extends QueryModule {

  /** Tumbling 1-hour counts per event type (batch). The window struct
    * is rendered as a formatted string so oracle comparison is
    * type-stable across engines.
    */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("cnt"))
      .orderBy(col("bucket"), col("event_type"))

  /** Sliding 1-hour windows every 15 minutes (batch). */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("cnt"))
      .orderBy(col("bucket"), col("event_type"))

  /** Session windows (30-minute gap) per user (batch). */
  def sessionCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** Streaming twin of tumblingCounts with a 10-minute watermark —
    * identical transform chain over readStream; used by the streaming
    * parity tests (MemoryStream / file source → memory sink).
    */
  def streamingTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("cnt"))

  /** Streaming dedup by event id within the watermark horizon —
    * exactly-once semantics over an at-least-once transport. State
    * holds one key per event inside the watermark window and is
    * GC'd as the watermark advances, so memory is bounded by event
    * rate × horizon, not stream length.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Static enrichment dim: event_type → weight. The small reference
    * table a stream joins against; in streaming mode Spark plans a
    * stream-static BROADCAST join — the static side ships to every
    * task once per batch, the stream side never shuffles and no join
    * state accumulates (unlike stream-stream joins).
    */
  def typeWeights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0))
      .toDF("event_type", "weight")
  }

  /** Stream-static enrichment: weight each event by its type and
    * aggregate weighted value per user bucket. Used identically by the
    * batch query (DuckDB oracle) and the streaming parity spec.
    */
  def enriched(events: DataFrame, weights: DataFrame): DataFrame =
    events
      .join(broadcast(weights), Seq("event_type"))
      .withColumn("weighted", col("value") * col("weight"))

  /** Batch twin for the oracle: per-type weighted totals. */
  def enrichedTotals(spark: SparkSession, dir: String): DataFrame =
    enriched(Tables.events(spark, dir), typeWeights(spark))
      .groupBy(col("event_type"))
      .agg(round(sum(col("weighted")), 4).as("sum_weighted"),
        count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** Batch interval join: views in the trailing hour before each
    * purchase, every purchase kept (left join; `n_views` = 0 when no
    * view preceded). The equi-key (user) carries the shuffle; the time
    * range is the post-join predicate — same shape the streaming twin
    * runs.
    */
  def purchaseViewCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    purchases.join(views,
        col("user_id") === col("v_user") &&
          col("view_ts").between(col("ts") - expr("INTERVAL 1 HOUR"), col("ts")),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("view_ts")).as("n_views"))
      .orderBy(col("event_id"))
  }

  /** STREAM-STREAM interval join — the streaming twin of
    * `purchaseViewCounts`'s core. Both sides carry a watermark and the
    * join condition bounds event-time distance, which is what makes
    * state finite: each side buffers only rows within
    * watermark + interval horizon, and rows age out as the watermark
    * advances. Without the time-range condition Spark would have to
    * buffer both streams forever.
    */
  def streamingViewsBeforePurchase(purchases: DataFrame, views: DataFrame): DataFrame =
    purchases.withWatermark("ts", "1 hour")
      .join(views.withWatermark("view_ts", "1 hour"),
        expr("user_id = v_user AND view_ts BETWEEN ts - INTERVAL 1 HOUR AND ts"))

  /** Batch twin of the dedup: double-delivered input collapses back to
    * per-type counts of the original stream (the oracle-checkable
    * statement of "dedup removes redelivery, nothing else").
    */
  def dedupDoubledCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"))
    ev.unionAll(ev)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** Per-user value-budget admission (cents = 100000). Integer cents,
    * never double dollars: the admission predicate compares a running
    * sum against the budget, and exact arithmetic means the boundary
    * decision is identical in Spark, DuckDB, and the streaming twin
    * (`Stateful.budgetAdmit` — one Long of state per user replaces
    * this window when the input is a stream). cum_before is the
    * EXCLUSIVE prefix in (ts, event_id) order, so the event that
    * crosses the budget is admitted — each user lands within one event
    * of budget. One per-user window, one hash(user_id) exchange.
    */
  val AdmitBudgetCents = 100000L

  def budgetAdmitted(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("cum_before", coalesce(sum(col("cents")).over(w), lit(0L)))
      .filter(col("cum_before") < AdmitBudgetCents)
      .select(col("event_id"), col("user_id"), col("cents"), col("cum_before"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** [EXT] sessionized event sequences — the behavioral twin of
    * q_doc_chunks: turn each user's 30-minute-gap session into ONE
    * training row holding the ordered event-type sequence (what a
    * recommender / agent-behavior model consumes). One shuffle on
    * (user, session); per-session order is imposed INSIDE the
    * aggregate — `sort_array` over (ts, event_id, type) structs — so
    * the result is deterministic no matter which partition each event
    * arrives from, and no second window pass is needed. Agg state is
    * bounded by session content (fine for bounded sessions; an
    * unbounded-session corpus would cap or chunk first, the
    * q_group_concat note).
    */
  def sessionSequences(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        size(col("evs")).cast("long").as("n_events"),
        concat_ws(">", transform(col("evs"), e => e.getField("event_type"))).as("seq"))
      .orderBy(col("user_id"), col("session_start"))

  override def queries: Map[String, Query] = Map(
    "q_window_tumbling" -> ((s, dir) => tumblingCounts(s, dir)),
    "q_stream_admit" -> ((s, dir) => budgetAdmitted(s, dir)),
    "q_session_seq" -> ((s, dir) => sessionSequences(s, dir)),
    "q_window_sliding" -> ((s, dir) => slidingCounts(s, dir)),
    "q_window_session" -> ((s, dir) => sessionCounts(s, dir)),
    "q_stream_dedup" -> ((s, dir) => dedupDoubledCounts(s, dir)),
    "q_stream_enrich" -> ((s, dir) => enrichedTotals(s, dir)),
    "q_stream_join" -> ((s, dir) => purchaseViewCounts(s, dir)),
  )

  override def oracles: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    // sliding windows: each event lands in 4 overlapping windows —
    // express via generate_series offsets in DuckDB.
    "q_window_sliding" ->
      """SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, COUNT(*) AS cnt
        |FROM (
        |  SELECT e.event_type,
        |    to_timestamp(CAST(FLOOR(epoch(e.ts) / 900) AS BIGINT) * 900 - g.o * 900) AS w_start
        |  FROM events e, (SELECT unnest(generate_series(0, 3)) AS o) g
        |  WHERE epoch(e.ts) - (CAST(FLOOR(epoch(e.ts) / 900) AS BIGINT) * 900 - g.o * 900) < 3600)
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    "q_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_stream_admit" ->
      s"""WITH c AS (
        |  SELECT event_id, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents, ts
        |  FROM events),
        |r AS (
        |  SELECT event_id, user_id, cents,
        |    CAST(COALESCE(SUM(cents) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS cum_before
        |  FROM c)
         |SELECT event_id, user_id, cents, cum_before FROM r
         |WHERE cum_before < $AdmitBudgetCents ORDER BY user_id, event_id""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id, COUNT(v.ts) AS n_views
        |FROM events p
        |LEFT JOIN events v ON v.event_type = 'view'
        |  AND v.user_id = p.user_id
        |  AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_stream_enrich" ->
      """SELECT e.event_type,
        |  ROUND(SUM(e.value * w.weight), 4) AS sum_weighted,
        |  COUNT(*) AS cnt
        |FROM events e
        |JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
        |             ('signup', 5.0), ('error', 0.0)) AS w(event_type, weight)
        |  ON e.event_type = w.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // DuckDB has no session_window, but session semantics ARE
    // ANSI-expressible: a session break is a gap >= the 30-minute
    // horizon (Spark extends a session while the next event is
    // strictly inside last_ts + gap), sessions are numbered with a
    // running sum of breaks, then grouped.
    "q_window_session" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_session_seq" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
