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
    // Same default as QBench/Bench: the RECORDED config
    // (GraftSession.RecordedCpus), so probe readings compare to sweep
    // readings without a config caveat.
    val cpus = GraftSession.cpusFromEnv
    println(s"[probe] config: local[$cpus], shuffle.partitions=$cpus")
    val spark = GraftSession.local(cpus)
    // prime-then-warm, matching Bench (r21): the warm miniatures run
    // last so a fresh probe reading isn't re-inflated by prime's
    // layout build.
    sources.Layouts.prime(spark, sfDir)
    GraftSession.warm(spark)
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
    // JVM session-state snapshot — printed fresh and after the prefix
    // so the drag MECHANISM is named, not guessed: loaded-class count
    // and metaspace/codecache growth implicate codegen class
    // accumulation (each generated WholeStageCodegen class stays
    // loaded for the session); GC-time growth implicates heap-resident
    // state (listener retention, broadcast remnants); neither growing
    // while the reading still inflates implicates JIT profile
    // pollution (megamorphic call sites — invisible to these counters
    // but also config-bound, not fixable by bounding state).
    def jvmState(tag: String): Unit = {
      import java.lang.management.ManagementFactory
      val cls = ManagementFactory.getClassLoadingMXBean
      val gcMs = ManagementFactory.getGarbageCollectorMXBeans
        .toArray.map(_.asInstanceOf[java.lang.management.GarbageCollectorMXBean])
        .map(_.getCollectionTime).sum
      val pools = ManagementFactory.getMemoryPoolMXBeans.toArray
        .map(_.asInstanceOf[java.lang.management.MemoryPoolMXBean])
      def poolMb(name: String): Long = pools.filter(_.getName.contains(name))
        .map(_.getUsage.getUsed).sum / (1024 * 1024)
      println(s"[probe:jvm] $tag classes=${cls.getLoadedClassCount} " +
        s"metaspaceMB=${poolMb("Metaspace")} codeCacheMB=${poolMb("CodeHeap") + poolMb("Code Cache")} " +
        s"heapUsedMB=${ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed / (1024 * 1024)} " +
        s"gcTotalSec=${gcMs / 1000}")
    }
    jvmState("fresh")
    println(s"[probe] $target fresh: " +
      (1 to 4).map(_ => fmt(run(target))).mkString(" "))
    // matches("\\d+") not forall(isDigit): the latter is vacuously
    // true for "" and would crash on "".toInt instead of erroring.
    val prefix: Seq[String] =
      if (prefixArg.matches("\\d+"))
        SparkEntry.queries.keys.filterNot(_ == target)
          .toSeq.sorted.take(prefixArg.toInt)
      else if (prefixArg.contains(',') || prefixArg.startsWith("q_"))
        prefixArg.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else sys.error(
        s"bad prefix '$prefixArg': expected a count (e.g. 60) or a comma list of q_* keys")
    prefix.foreach(k => (1 to reps).foreach(_ => run(k)))
    jvmState(s"after ${prefix.size}x$reps")
    println(s"[probe] $target after ${prefix.size} queries x$reps: " +
      (1 to 4).map(_ => fmt(run(target))).mkString(" "))
    jvmState("end")
    spark.stop()
  }
}
