package graft

/** Diagnostic main: measure a TARGET query's warm time before and
  * after a polluting prefix of OTHER queries in one JVM — attributes
  * in-sweep warm inflation (a reading above the isolated QBench quad)
  * to accumulated session state versus the query's own plan. The
  * run discipline matches Bench/QBench exactly: noop-format write,
  * GC barrier before each timing, [[Storage.releaseAll]] after.
  *
  * Usage: runMain graft.SweepProbe <target> [nPrefix|k1,k2,...] [sfDir] [reps]
  *
  * The prefix is either the first N other keys in sorted order, or an
  * explicit comma list replicating a sweep's exact predecessor order;
  * `reps` repeats each prefix query (Bench executes every query 3×:
  * cold + two warm passes).
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("q_kcore")
    val prefixArg = if (args.length > 1) args(1) else "60"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val reps = if (args.length > 3) args(3).toInt else 1
    // Same default as QBench: the RECORDED 32-cpu config, so probe
    // readings compare to sweep readings without a config caveat.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    println(s"[probe] config: local[$cpus], shuffle.partitions=$cpus")
    val spark = GraftSession.local(cpus)
    GraftSession.warm(spark)
    sources.Layouts.prime(spark, sfDir)
    def run(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}") }
      val el = (System.nanoTime() - t0) / 1e9
      Storage.releaseAll(spark)
      el
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"[probe] $target fresh: " +
      (1 to 4).map(_ => fmt(run(target))).mkString(" "))
    val prefix: Seq[String] =
      if (prefixArg.forall(_.isDigit))
        SparkEntry.queries.keys.filterNot(_ == target)
          .toSeq.sorted.take(prefixArg.toInt)
      else prefixArg.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    prefix.foreach(k => (1 to reps).foreach(_ => run(k)))
    println(s"[probe] $target after ${prefix.size} queries x$reps: " +
      (1 to 4).map(_ => fmt(run(target))).mkString(" "))
    spark.stop()
  }
}
