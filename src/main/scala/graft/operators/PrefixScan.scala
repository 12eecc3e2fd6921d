package graft.operators

import graft.Pins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group prefix scan — the shared machinery behind
  * every "running total in a global order within few groups" query
  * (`q_window_ntile`'s rank reconstruction, `q_token_budget`'s budget
  * cut). A plain `sum/row_number OVER (PARTITION BY group ORDER BY …)`
  * puts each group on ONE task; with a low-cardinality group key that
  * is the scale-killer full-distribution window (`q_share_of_total`'s
  * global-window trap, per-group edition — and unlike per-group top-K,
  * a prefix scan needs every row, so WindowGroupLimit cannot save it).
  *
  * Structure (the same shape at every level):
  *
  *   1. range-partition on (group ++ sort): each task holds one
  *      contiguous chunk of the global order, sized by data/tasks,
  *      never by group size;
  *   2. aggregate the weight per (chunk, group) — a subtotal table of
  *      at most chunks × groups rows;
  *   3. window over that TINY table: each chunk's exclusive offset
  *      within its group and the group total (partitions of this
  *      window are ≤ #chunks rows — bounded by cluster size, not data
  *      size; were chunks × groups ever to outgrow one task, the
  *      recursion of [[graft.functions.Selection.exclusiveOffsets]]
  *      applies verbatim);
  *   4. join the offsets back by broadcast and finish with a window
  *      partitioned by (chunk, group) — single chunks. The broadcast
  *      carries the same chunks × groups rows as the subtotal table —
  *      bounded by cluster size × group cardinality, not data size —
  *      so it holds exactly when step 3's window does; if group
  *      cardinality ever grows past broadcast range, this join (and
  *      step 3) switch to a shuffle on (chunk, group), which the
  *      range partitioning of step 1 already co-locates.
  *
  * The result is partition-count invariant by construction: chunk ids
  * cancel out of (offset + within-chunk position).
  */
object PrefixScan {

  /** Adds to `df`:
    *
    *   - `cum_before` — the exclusive running sum of `weight` over
    *     rows of the same `group` that precede this row in the total
    *     order `sort` (0 for each group's first row);
    *   - `grp_total`  — the group's total `weight`.
    *
    * Callers with an EXPENSIVE upstream (regex tokenization, hashing)
    * should persist `df` before calling: `repartitionByRange` runs a
    * range-bound sampling job that executes its whole child plan, so
    * an unpersisted expensive projection is computed twice over the
    * data (see `Curation.tokenBudgetScaled` for the staged pattern).
    *
    * `sort` must be a total order (unique tiebreak) or `cum_before`
    * is nondeterministic. `weight` must be non-negative for
    * `chunkPrune` to be sound: a chunk whose starting offset already
    * fails a monotone keep-predicate (e.g. `off < budget`) can be
    * dropped wholesale BEFORE its rows reach the window — pass the
    * predicate as `chunkPrune` and only the qualifying prefix of
    * chunks does any per-row work at all.
    *
    * `pins` owns the range pin's lifecycle: callers thread their own
    * [[Pins]] scope and hand the FINAL query frame to
    * [[Pins.releaseOnMaterialize]], so the pin is released by the
    * query's own first action instead of waiting on harness hygiene
    * (`Storage.releaseAll`) — the long-lived-session leak class the
    * round-10 pagerank regression came from. The default orphan
    * scope preserves the old harness-released behavior for callers
    * that have not adopted the discipline.
    */
  def scan(df: DataFrame, group: Seq[String], sort: Seq[Column],
           weight: Column,
           chunkPrune: Column => Column = _ => lit(true),
           pins: Pins = new Pins): DataFrame = {
    val gCols = group.map(col)
    // pinned: the subtotal pass and the scan pass must see ONE
    // materialization — chunk ids are deterministic for a given
    // input, but two executions would still range-sample twice
    val ranged = pins(df
      .repartitionByRange((gCols ++ sort): _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_w", weight))
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gCols: _*)
    val meta = ranged.groupBy((col("_pid") +: gCols): _*)
      .agg(sum(col("_w")).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wTot))
      .filter(chunkPrune(col("_off")))
      .select(col("_pid") +: gCols :+ col("_off") :+ col("_n"): _*)
    val wChunk = Window.partitionBy(col("_pid") +: gCols: _*).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(meta), "_pid" +: group)
      .withColumn("cum_before",
        col("_off") + coalesce(sum(col("_w")).over(wChunk), lit(0L)))
      .withColumn("grp_total", col("_n"))
      .drop("_pid", "_w", "_off", "_n")
  }

  /** Exact NTILE(k) bucket (1..k) from a 1-based rank `i` within a
    * group of `n` rows — the SQL-standard assignment (the first
    * n mod k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋). ONE home for
    * the formula shared by `Windows.distributionScaled` (k = 4) and
    * Curation's q_ccnet_buckets (k = 3); AggJoinWindowSpec and
    * CurationSpec pin it against the native ntile window. The else
    * branch divides by q = n div k, which is 0 only when n < k — and
    * then i ≤ n = r·(q+1) makes the first branch taken for every
    * row, so the division never evaluates (CASE is lazy in both
    * engines). Ranks/counts stay well under 2⁵³, so the
    * floor-of-double divisions are exact integer division.
    */
  def ntileOf(i: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long")
    val r = n % k
    (when(i <= r * (q + 1), floor((i - 1) / (q + 1)))
      .otherwise(r + floor((i - r * (q + 1) - 1) / q))
      .cast("int") + 1)
  }
}
