package graft

/** Empty-input robustness sweep: every oracle-eligible query must
  * EXECUTE on zero-row inputs and return the SAME schema as its
  * non-empty run. This is the degenerate case every 100 TB pipeline
  * hits constantly — an empty partition, a filter that matches
  * nothing, a fresh ingest directory — and the class of failure
  * (collect().head on an assumed-nonempty stats row, schema inference
  * off written files, divide-by-count) that sf0.01 hash checks can
  * never reach.
  *
  * Exclusions are the documented no-oracle set (ML fits legitimately
  * reject empty training sets) plus the layout/roundtrip queries,
  * which WRITE a layout derived from the input dir before reading it
  * back — zero-row twins of those are covered by SinkSpec's
  * empty-roundtrip cases instead of a shared empty warehouse.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val d = Scratch.dir("empty_sf")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // limit(0) keeps the exact schema (parquet writes a footer-only
    // file), so Tables.* loaders — including the events nanos
    // rebuild — behave identically to the real dirs.
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  /** The one query that reads no table dir — identical on any input,
    * so sweeping it would assert nothing. Everything else runs,
    * including the write-then-read roundtrips and the layout builders
    * (their re-reads are schema-declared precisely so a zero-row
    * ingest yields an empty layout, not an inference error).
    */
  private val skip: Set[String] = Set("q_local_rows")

  /** Deterministic no-oracle keys must also survive empty input —
    * none of them is a model fit. Shared with
    * PartitionInvarianceSpec via [[SparkSpec.DeterministicNoOracle]].
    */
  private val deterministicNoOracle: Set[String] =
    SparkSpec.DeterministicNoOracle.toSet

  test("every oracle-eligible query runs on zero-row tables with an unchanged schema") {
    val keys = (SparkEntry.oracleSql.keySet ++ deterministicNoOracle) -- skip
    val failures = keys.toSeq.sorted.flatMap { k =>
      try {
        val fn = SparkEntry.queries(k)
        val fullSchema = fn(spark, sf).schema
        val onEmpty = fn(spark, emptyDir)
        val got = onEmpty.schema
        onEmpty.collect() // must execute, not just plan
        if (got != fullSchema)
          Some(s"$k: schema drift on empty input\n  full:  $fullSchema\n  empty: $got")
        else None
      } catch {
        case e: Throwable =>
          Some(s"$k: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
