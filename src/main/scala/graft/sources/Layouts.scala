package graft.sources

import graft.{QueryModule, Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** [EXT] Storage-layout operators — the physical-design surfaces that
  * decide scan and shuffle cost at 100 TB, promoted from spec-only
  * evidence (SinkSpec) into first-class driver-gated queries:
  *
  *   - '''Dynamic partition pruning''' (`q_partition_prune`): a fact
  *     table laid out as `o_month=N/` directories joined through a
  *     selective dimension. Static pushdown cannot prune here — the
  *     filter is on the DIM (`quarter = 'Q1'`), not the fact — so
  *     Catalyst turns the dim join keys into a runtime
  *     `dynamicpruning#` subquery evaluated against the fact scan's
  *     partition column: only the matching `o_month=` directories are
  *     ever listed and read. At 100 TB this is the single biggest scan
  *     saver after static pushdown (a date-dim-filtered query reads
  *     days, not years). The broadcast that the join needs anyway is
  *     REUSED as the pruning subquery, so the filter is free.
  *     PlanSpec pins the `dynamicpruning#` filter AND that the scan's
  *     partition-read metric stays below the 12 months on disk.
  *
  *   - '''Bucketed co-located join''' (`q_bucket_join`): both join
  *     sides pre-hashed into the same number of buckets on the join
  *     key at WRITE time, so the sort-merge join consumes the bucket
  *     layout as its required distribution and plans NO exchange on
  *     either side. At 100 TB this converts every recurring
  *     fact-to-fact join on the bucket key from a full two-sided
  *     shuffle into a local merge — the write-once, join-many trade.
  *     The join is merge-hinted for the same reason as `q_join_smj`:
  *     at test scale AQE would broadcast the small side and the
  *     co-location evidence would be vacuous.
  *
  *   - '''Small-file compaction''' (`q_compact`): the
  *     streaming-ingest tax — one file per microbatch per partition —
  *     rewritten to `ceil(bytes / 128 MB)` right-sized files. The
  *     data is untouched (the oracle reads the original table); what
  *     changes is the open count and listing cost of every later
  *     scan.
  *
  * The reference has no storage-layout surface at all (its one I/O
  * format is headered CSV, `Code/flight_analysis.py:15,244-246`) —
  * these operators are [EXT] additions its pipeline would need first
  * at scale. Layouts are derived from the immutable testdata, written
  * once per (session, sf-dir) into session-unique scratch space
  * ([[graft.Scratch]]) or the warehouse, and memoized so repeated runs
  * (Verify, Bench cold+warm, PlanSpec) re-read instead of re-write.
  */
object Layouts extends QueryModule {

  /** One write per (JVM, sf-dir); concurrent first calls are
    * idempotent (same data, overwrite mode) so TrieMap's lock-free
    * getOrElseUpdate race is harmless.
    */
  private val built = TrieMap.empty[String, String]

  /** Full-length content hash of the source dir: two distinct sf dirs
    * in one JVM must never collide and silently reuse each other's
    * layout (a truncated hashCode could).
    */
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Orders re-laid-out as `o_month=1..12/` parquet directories. */
  private def monthPartitionedOrders(s: SparkSession, dir: String): String =
    built.getOrElseUpdate(s"dpp:$dir", {
      val path = Scratch.dir(s"dpp_orders_${dirTag(dir)}")
      Tables.orders(s, dir)
        .withColumn("o_month", month(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_month").parquet(path)
      path
    })

  /** Month dimension: month → quarter. Tiny by nature (12 rows), but
    * it must live as a FILE-backed table, not a local Seq: Catalyst
    * constant-folds a Filter over a LocalRelation into the relation
    * itself, and with no Filter node left the partition-pruning rule
    * sees no selective predicate to derive the runtime filter from —
    * exactly how a real catalog date dimension is stored anyway.
    */
  private def monthDim(s: SparkSession): DataFrame = {
    import s.implicits._
    val path = built.getOrElseUpdate("monthdim", {
      val p = Scratch.dir("month_dim")
      (1 to 12).map(m => (m, s"Q${(m - 1) / 3 + 1}")).toDF("m", "quarter")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** `saveAsTable` into the session warehouse fails with
    * LOCATION_ALREADY_EXISTS if a previous JVM left files behind — the
    * in-memory catalog forgets the table but not the directory.
    */
  private def dropManaged(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    // The warehouse root comes from the session conf and the leftover
    // directory is removed through the Hadoop FileSystem of whatever
    // store backs it — local fs here, HDFS/object store on a cluster.
    val root = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), table)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
  }

  /** Lineitem + orders bucketed by their join key into the same bucket
    * count. 8 buckets stands in for the hundreds a real deployment
    * sizes to its executor count; what matters is both sides AGREE, so
    * the SMJ's required hash distribution is satisfied by the layout.
    */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) =
    synchronized {
      val names = built.getOrElseUpdate(s"bkt:$dir", {
        val tag = dirTag(dir)
        val li = s"graft_li_b_$tag"
        val ord = s"graft_ord_b_$tag"
        dropManaged(s, li)
        dropManaged(s, ord)
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
          .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(li)
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(ord)
        s"$li,$ord"
      })
      val Array(li, ord) = names.split(",")
      (li, ord)
    }

  /** Compaction target. 128 MB in production (one HDFS/object-store
    * block, the sweet spot between task overhead and parallelism);
    * the SIZE-DERIVED file count is what the operator demonstrates —
    * at test scale the formula correctly compacts tiny input to one
    * file, at 100 TB the same formula yields ~800k files instead of
    * the tens of millions a streaming ingest leaves behind.
    */
  val TargetFileBytes: Long = 128L << 20

  private def dirBytes(s: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** A deliberately fragmented documents layout (64 small files — the
    * shape a per-microbatch streaming sink leaves behind) and its
    * compacted twin, sized by bytes/target, both memoized per dir.
    */
  private[graft] def fragmentedDocs(s: SparkSession, dir: String): String =
    built.getOrElseUpdate(s"frag:$dir", {
      val path = Scratch.dir(s"frag_docs_${dirTag(dir)}")
      Tables.documents(s, dir).repartition(64)
        .write.mode("overwrite").parquet(path)
      path
    })

  private[graft] def compactedDocs(s: SparkSession, dir: String): String =
    built.getOrElseUpdate(s"cmp:$dir", {
      val frag = fragmentedDocs(s, dir)
      val target = math.max(1L, (dirBytes(s, frag) + TargetFileBytes - 1) / TargetFileBytes)
      val path = Scratch.dir(s"cmp_docs_${dirTag(dir)}")
      // Schema-declared read (the source table's schema, a metadata
      // lookup): a zero-row ingest leaves a layout with no parquet
      // parts, and schema INFERENCE over that dir throws — the empty
      // corpus must compact to an empty corpus, not an error.
      s.read.schema(Tables.documents(s, dir).schema).parquet(frag)
        .repartition(target.toInt)
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Build every memoized layout for `dir` without running the
    * queries. Bench calls this UNTIMED before its cold pass: the
    * layouts are the write-once side of write-once/join-many, so
    * timing them inside the first query run would measure the layout
    * write, not the query (round-6 ADVICE).
    */
  def prime(s: SparkSession, dir: String): Unit = {
    monthPartitionedOrders(s, dir)
    monthDim(s)
    bucketedTables(s, dir)
    compactedDocs(s, dir)
  }

  override def queries: Map[String, Query] = Map(
    "q_partition_prune" -> ((s, dir) => {
      import s.implicits._
      // Declared schema (source schema + the partition column) for the
      // same reason as compactedDocs: an empty fact writes no
      // `o_month=` directories and inference over the bare root
      // throws. Partition values still come from directory names.
      val factSchema = Tables.orders(s, dir)
        .withColumn("o_month", month(col("o_orderdate"))).schema
      val fact = s.read.schema(factSchema).parquet(monthPartitionedOrders(s, dir))
      val dim = monthDim(s).filter($"quarter" === "Q1")
      fact.join(dim, $"o_month" === $"m")
        .groupBy($"o_month")
        .agg(count(lit(1)).as("cnt"),
          round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"o_month")
    }),

    "q_bucket_join" -> ((s, dir) => {
      import s.implicits._
      val (li, ord) = bucketedTables(s, dir)
      s.table(li).hint("merge")
        .join(s.table(ord), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 4).as("sum_qty"))
        .orderBy($"o_orderpriority")
    }),

    // [EXT] Small-file compaction: a streaming sink leaves one file
    // per microbatch per partition; reading that layout at 100 TB
    // pays millions of opens and a metadata-listing tax before the
    // first row. Compaction rewrites to ceil(bytes / 128 MB) files —
    // a pure repartition+write whose only shuffle is the round-robin
    // exchange doing the re-binning. The oracle reads the ORIGINAL
    // table: compaction must be invisible in the data (SinkSpec pins
    // the file counts, 64 → size-derived).
    "q_compact" -> ((s, dir) => {
      import s.implicits._
      s.read.schema(Tables.documents(s, dir).schema)
        .parquet(compactedDocs(s, dir))
        .select($"doc_id", $"lang", $"n_chars")
        .orderBy($"doc_id")
    }),
  )

  override def oracles: Map[String, String] = Map(
    // The oracle is the PLAIN query over the original table: pruning
    // must be invisible in the result, visible only in the plan.
    "q_partition_prune" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS o_month, COUNT(*) AS cnt,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE month(o_orderdate) BETWEEN 1 AND 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bucket_join" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  ROUND(SUM(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_compact" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
