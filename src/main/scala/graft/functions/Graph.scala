package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Iterative link analysis — PageRank over the customer↔supplier
  * trade graph (who bought from whom, via orders⋈lineitem). Web-graph
  * centrality is a standard corpus-quality signal (link-based quality
  * weighting of crawl data — the harmonic-centrality filtering in
  * Common Crawl derivatives), and PageRank is the canonical ITERATIVE
  * join+aggregate shape a batch engine must execute well: the same
  * plan k times over an invariant edge table.
  *
  * FIXED-POINT INTEGER arithmetic throughout: ranks are scaled to
  * 1e12, contributions are integer-divided by out-degree, and the
  * damping blend is (15·init)/100 + (85·Σin)/100 in BIGINTs. Float
  * PageRank sums partial contributions in shuffle arrival order —
  * non-associative, so the result would differ run to run and engine
  * to engine; integer sums are exact and order-free, which is what
  * makes this the one PageRank formulation a DuckDB oracle can verify
  * hash-for-hash (and PartitionInvarianceSpec can sweep). The cost is
  * ≤1 unit of truncation per in-edge per round — invisible at the
  * 1e12 scale factor.
  *
  * Scale shape: the edge table is built once, persisted, and reused
  * by every round (the loop invariant); each round is one broadcast
  * join of the rank table into the edges (ranks are |nodes| rows —
  * broadcastable whenever nodes ≪ edges; on a web-scale graph this
  * becomes a co-partitioned shuffle join on src with both sides
  * pre-partitioned once) plus one map-side-combined groupBy(dst).
  * Iterations are a FIXED count (3) — no convergence check reads
  * data back to the driver, so the loop is one lazily-composed plan
  * whose only materialization points are the per-round rank
  * broadcasts over the persisted edges.
  */
object Graph extends QueryModule {

  /** Rank scale factor (fixed-point), damping = 85/100, 3 rounds. */
  val RankScale = 1000000000000L
  val Rounds = 3
  val TopK = 20

  /** Fixed-point PageRank over a directed `(src, dst)` edge table in
    * which every node has at least one out-edge (callers union both
    * directions, so there is no dangling-mass term). Returns the full
    * `(node, rank)` table after [[Rounds]] rounds.
    */
  private[graft] def pagerank(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // Pin discipline: the RAW edge build (join, distinct, union — the
    // expensive part at 100 TB) is pinned because BOTH deg's lineage
    // and edged's probe side read it; without the pin it executes
    // twice at first materialization. edged and the per-node base are
    // pinned because every round references them through the nested
    // broadcast subtrees — at sf0.1 Spark's exchange reuse already
    // dedupes identical subtrees (pinning measured time-neutral), but
    // reuse is a planner optimization, not a contract, and the pins
    // make "one cached-edge join + one groupBy + one cached base join
    // per round" guaranteed rather than plan-shape-dependent. deg
    // itself stays unpinned: its two consumers (edged, base) are both
    // cached after first fill, so it re-derives at most twice from
    // the pinned edges — a 16k-row groupBy over a cache hit.
    val pinnedEdges = edges
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = pinnedEdges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val edged = pinnedEdges.join(deg, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = deg.select($"src".as("node"))
    val nb = broadcast(nodes.agg(count(lit(1)).as("n")))
    val base = nodes.crossJoin(nb)
      .select($"node", expr(s"$RankScale div n").as("init"),
        expr(s"(15 * ($RankScale div n)) div 100").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r0 = base.select($"node", $"init".as("rank"))
    (1 to Rounds).foldLeft(r0) { (r, _) =>
      val inc = edged
        .join(broadcast(r.withColumnRenamed("node", "src")), Seq("src"))
        .select($"dst", expr("rank div outdeg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("inc"))
      base.join(inc, $"node" === $"dst", "left")
        .select($"node",
          ($"b" + expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
    }
  }

  /** The trade graph: one undirected edge per distinct
    * (customer, supplier) pair that ever traded, as two directed rows.
    */
  private[graft] def tradeEdges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"l_orderkey" === $"o_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("a"),
        concat(lit("s"), $"l_suppkey").as("b"))
      .distinct()
    pairs.select($"a".as("src"), $"b".as("dst"))
      .union(pairs.select($"b".as("src"), $"a".as("dst")))
  }

  override def queries: Map[String, Query] = Map(
    "q_pagerank" -> ((s, dir) => {
      import s.implicits._
      pagerank(tradeEdges(s, dir)).orderBy($"rank".desc, $"node").limit(TopK)
    }),
  )

  /** One PageRank round as a SQL CTE pair — generated from the SAME
    * constants the Spark loop uses, unrolled [[Rounds]] times, so the
    * two engines can never drift.
    */
  private def roundCte(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""c$i AS (
       |  SELECT e.dst, SUM($prev.rank // e.outdeg) AS inc
       |  FROM e JOIN $prev ON $prev.node = e.src GROUP BY e.dst),
       |r$i AS (
       |  SELECT nodes.node,
       |    (15 * ($RankScale // nn.n)) // 100
       |      + (85 * COALESCE(c$i.inc, 0)) // 100 AS rank
       |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = nodes.node)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |eraw AS (SELECT a AS src, b AS dst FROM pairs
         |         UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM eraw GROUP BY src),
         |e AS (SELECT eraw.src, eraw.dst, deg.outdeg FROM eraw JOIN deg USING (src)),
         |nodes AS (SELECT src AS node FROM deg),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS (SELECT node, $RankScale // n AS rank FROM nodes CROSS JOIN nn),
         |${(1 to Rounds).map(roundCte).mkString(",\n")}
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$Rounds
         |ORDER BY rank DESC, node LIMIT $TopK""".stripMargin,
  )
}
