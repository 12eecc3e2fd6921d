package graft

/** Single-query bench for iteration: times one registered query N
  * times in a warm session, so a hot spot can be profiled without
  * paying the full sweep.
  *
  * CPUs default to [[GraftSession.RecordedCpus]] — the RECORDED
  * benchmark config (BASELINE.md rule 3), shared with Bench and
  * SweepProbe so the three mains cannot drift apart. The r16
  * discovery that forced this: quads taken at local[4] gated sweeps
  * run at local[32], and for driver-latency-bound queries the two
  * configs differ ~1.7× (q_kcore 4.6 s at 4 cpus vs 7.5 at 32 —
  * every "in-sweep warm amplification" flag of rounds 13–16 was this
  * mismatch, not sweep-context state; SweepProbe refuted the state
  * hypothesis directly). A midpoint recorded from a QBench quad now
  * matches the config the warm gate measures under by default;
  * override with SPARK_GRAFT_CPUS only for config experiments.
  *
  * Usage: runMain graft.QBench <query_key> [sfDir] [repeats]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QBench <query_key> [sfDir] [repeats]")
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val cpus = GraftSession.cpusFromEnv
    println(s"[qbench] config: local[$cpus], shuffle.partitions=$cpus")
    val spark = GraftSession.local(cpus)
    GraftSession.warm(spark)
    val fn = SparkEntry.queries.getOrElse(key,
      sys.error(s"unknown query '$key'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    for (i <- 1 to repeats) {
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qbench] $key run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Storage.releaseAll(spark)
    }
    spark.stop()
  }
}
