package graft
import org.apache.spark.sql.SparkSession

/** One session builder for every driver-contract main (Verify, Bench,
  * QBench) — the configs are load-bearing (GraftExtensions registers
  * the codegen expressions; nanosAsLong is hard-required by
  * events.parquet; UTC pins the date functions), so drift between
  * copies silently changes what a main measures or can even read.
  */
object GraftSession {
  /** The RECORDED benchmark config (BASELINE.md rule 3): every
    * committed midpoint / cold pair was taken at local[32] with 32
    * shuffle partitions. One constant, consumed by Bench, QBench and
    * SweepProbe alike — r13–r16's phantom warm flags all traced to
    * quads recorded at local[4] gating sweeps run at local[32], and
    * the residual risk after r16's per-tool pinning was a bare Bench
    * run falling back to a different default than the tools that
    * recorded its baseline. The baseline file carries a "cpus" tag
    * that [[WarmBaseline.load]] validates against the running config,
    * so a cross-config comparison is refused, not silently graded.
    *
    * This default also reaches Verify and the JobCount DIAGNOSTIC
    * main (both call [[local]] with no override) — harmless for
    * Verify (correctness is config-independent) but a caveat for
    * JobCount: AQE job counts can shift with the partition count, and
    * the committed job BUDGETS (JobBudgetSpec) are derived and
    * asserted at the test suite's own pinned local[4] (SparkSpec), so
    * reproduce a budget with SPARK_GRAFT_CPUS=4, not the default.
    */
  val RecordedCpus = "32"

  def cpusFromEnv: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", RecordedCpus)

  def local(cpus: String = cpusFromEnv): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // The AppStatus/SQL listeners retain job/stage/task/plan state
      // even with the UI off (defaults: 1000 jobs/stages, 100k tasks,
      // 1000 SQL executions with full plan graphs). A 150-query × 3-pass
      // sweep fills every one of those caps, and the retained state is
      // driver heap + linear cleanup scans billed to whatever query is
      // running — part of the round-10 "slow only inside the sweep"
      // signature. The harness never reads status APIs; keep a short
      // diagnostic window only.
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutions", "30")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run throwaway jobs so codegen/scheduler/shuffle start-up cost
    * doesn't bill to the first measured query.
    *
    * Beyond the original range+sum smoke, this warms the ITERATIVE-
    * CHAIN path with data-free miniatures of the two fixed-round
    * solvers (r20 adjudication 1 / r20 verdict item 2): a fresh JVM's
    * first multi-job chain pays ~9–13 s of whole-session JIT +
    * analyzer/optimizer work on top of its settled cost (measured
    * r21: q_pagerank run-1 13.9 s vs settled 4.9; q_kcore 16.1 vs
    * 6.8), and that floor is a property of the SESSION, not the data
    * — a 3-node pagerank and a 10-node k-core run the identical rule
    * pipeline, codegen classes, Pins/Generations lifecycle,
    * localCheckpoint machinery and AQE-off bracket, so they pay the
    * floor here, outside every timed window (the Layouts.prime
    * trick applied to JIT instead of layout I/O). Results are
    * discarded and all storage is drained — nothing here touches or
    * precomputes any benchmark input.
    */
  def warm(s: SparkSession): Unit = {
    s.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    import s.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Miniature PageRank: a 3-cycle — exercises the head() size probe,
    // the per-round broadcast join + map-combined aggregate, the
    // dangling branch selection and the eager final truncation.
    val pins = new Pins
    noop(functions.Graph.pagerank(
      Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst"),
      pins = pins))
    // Miniature k-core: K10 (every degree 9 ≥ KcoreK) — exercises the
    // composed 6-round semi-join+aggregate chain, Generations
    // staging/advance, the assert_true report and its truncation.
    val k10 = for { a <- 1 to 10; b <- 1 to 10 if a < b }
      yield (s"n$a", s"n$b")
    noop(functions.Graph.kcoreFrom(s, k10.toDF("s1", "s2")))
    // Drop the miniatures' checkpoint blocks: warm must leave the
    // session's storage exactly as it found it.
    Storage.releaseAll(s)
  }
}
