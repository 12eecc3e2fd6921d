package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Within-query storage lifecycle (the round-10 verdict's item 5).
  *
  * Two leak classes motivated this:
  *
  *   1. Query-internal `persist` pins (q_pagerank's edge/degree/base
  *      tables, the banded self-join signature tables) used to rely on
  *      the HARNESS calling `spark.catalog.clearCache()` after the
  *      query — correct for Bench/Verify, but a long-lived session
  *      interleaving queries accumulates every pin of every query in
  *      one block-manager budget. [[Pins]] makes release part of the
  *      query itself: the builder pins through the tracker and frees
  *      everything it created the moment its result is materialized.
  *   2. Eagerly checkpointed FINAL results (connected components, BPE
  *      merge tables, pagerank's rank table) live OUTSIDE the SQL
  *      cache manager — `clearCache()` never reaches a
  *      `localCheckpoint`'s RDD blocks, so a sweep leaks one
  *      materialized result per iterative query until the
  *      ContextCleaner's GC hook happens to fire. [[Storage.releaseAll]]
  *      drops both classes deterministically and is what Bench/QBench/
  *      Verify now call between queries.
  */
object Storage {

  /** Release EVERY block this session still holds: SQL-cache entries
    * (`persist`/`cache`) and context-registered persistent RDDs — the
    * superset that includes `localCheckpoint`/`checkpoint` block
    * storage, which `clearCache` alone cannot reach. Harness-side
    * hygiene between independent queries; blocking=false keeps it off
    * the measured path.
    */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Count of storage entries still registered with the context —
    * the observable StorageLifecycleSpec asserts on. Includes SQL-cache
    * backing RDDs and checkpoint blocks alike.
    */
  def residentRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}

/** Tracks the pins a single query builds so they can be released as
  * one unit once the query's result no longer needs them (after an
  * eager truncation of the final frame, or after the caller's own
  * materialization). Query builders thread one [[Pins]] through their
  * helpers instead of calling `persist` directly; the owner calls
  * [[releaseAll]] exactly once.
  */
final class Pins(level: StorageLevel = StorageLevel.MEMORY_AND_DISK) {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at the scope's level and remember it for release. */
  def apply(df: DataFrame): DataFrame = {
    tracked += df
    df.persist(level)
  }

  /** Unpersist every tracked frame (non-blocking) and forget them. */
  def releaseAll(): Unit = {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}
