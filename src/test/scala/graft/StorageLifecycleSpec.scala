package graft

/** Within-query storage lifecycle (round-10 verdict item 5): every
  * registered query, executed end-to-end with the harness's own noop
  * materialization, must leave at most a small bounded number of
  * storage entries behind (its truncated final result plus the
  * self-join pins the harness owns), and [[Storage.releaseAll]] must
  * drain the block manager to ZERO between queries — including the
  * checkpoint blocks `spark.catalog.clearCache()` cannot see. The
  * round-10 sweep leaked one materialized result per iterative query
  * plus four pinned tables per q_pagerank invocation; this spec is the
  * regression gate for that class.
  *
  * Suites run sequentially in sbt's forked test JVM (fork := true
  * without testForkedParallel), so the global resident-RDD counts here
  * cannot race another suite's caching.
  */
class StorageLifecycleSpec extends SparkSpec {

  /** Generous per-query allowance: a query may keep its own truncated
    * result (1) plus harness-released self-join pins (the minhash
    * band/signature tables, PrefixScan's range pin, the corpus pins of
    * the curation family — at most a handful). Anything above this is
    * the unbounded-accumulation bug class, not a design choice.
    */
  private val MaxResidentPerQuery = 6

  test("every query: bounded storage after materialization; releaseAll drains to zero") {
    Storage.releaseAll(spark)
    val over = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val undrained = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val left = Storage.residentRddCount(spark)
      if (left > MaxResidentPerQuery) over += name -> left
      Storage.releaseAll(spark)
      val drained = Storage.residentRddCount(spark)
      if (drained != 0) undrained += name -> drained
    }
    assert(over.isEmpty,
      s"queries leaving more than $MaxResidentPerQuery storage entries " +
        s"after their noop write: ${over.mkString(", ")}")
    assert(undrained.isEmpty,
      s"releaseAll failed to drain storage after: ${undrained.mkString(", ")}")
  }

  test("q_pagerank releases its edge/degree/base pins itself (long-lived-session discipline)") {
    // The query's own lifecycle, no harness help: after the result is
    // materialized, the four MEMORY_AND_DISK pins and the pairs pin
    // are gone; only the |nodes|-row truncated rank table remains.
    Storage.releaseAll(spark)
    run("q_pagerank").write.format("noop").mode("overwrite").save()
    val left = Storage.residentRddCount(spark)
    assert(left <= 1,
      s"q_pagerank must release its pins at materialization; $left entries resident")
    Storage.releaseAll(spark)
  }
}
