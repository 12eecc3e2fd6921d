package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Parquet scans only — parquet carries its own schema, so there is no
  * inference pass (the reference's all-string CSV read +
  * cast-everything pattern, `Code/flight_analysis.py:15-16`, is
  * replaced by declared-schema columnar scans; at 100 TB schema is
  * declared, not sniffed). Column pruning and predicate pushdown reach
  * the scan automatically because every downstream operator stays in
  * the DataFrame API.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Memoized table row count (a parquet-metadata-only job). Plan-
    * sizing decisions made at query-construction time (LSH plane
    * counts) need the corpus size on the driver; memoizing per
    * (dir, table) keeps that to one job per session instead of one per
    * query construction. Counts of the immutable testdata never go
    * stale within a session.
    */
  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate(s"$dir/$name", table(spark, dir, name).count())

  /** `events.ts` normalization — the testdata generator has shipped
    * two physical types for it, so the loader branches on the READ
    * schema rather than assuming either:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; the
    *     session builders set `spark.sql.legacy.parquet.nanosAsLong=
    *     true` so it arrives as a raw LONG, rebuilt here with exact
    *     integer arithmetic — `ts div 1000` keeps full precision (a
    *     double round-trip would not: epoch-nanos exceeds 2^53).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ; cast to the session-zone TIMESTAMP every
    *     downstream query and oracle was written against — value-
    *     preserving because the sessions pin UTC.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }

  /** Batch index of a documents row, decoded from its source name
    * (src0 → 0, src17 → 17). Indices below [[HistoryBatches]] play the
    * historical corpus, the rest the newly ingested batch — ONE
    * definition shared by every incremental operator
    * (q_dedup_incremental, q_agg_incremental) and mirrored by
    * [[docBatchIdxSql]] for their oracles, so the history/new boundary
    * cannot drift between queries.
    */
  val HistoryBatches = 10
  def docBatchIdx(source: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.substring(source, 4, 10).cast("int")
  def docBatchIdxSql(sourceExpr: String): String =
    s"CAST(substr($sourceExpr, 4) AS INT)"

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = eventsRaw(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
