package graft

/** Single-query bench for iteration: times one registered query N
  * times in a warm session (same [[GraftSession]] config as [[Bench]],
  * including the SPARK_GRAFT_CPUS default), so a hot spot can be
  * profiled without paying the full sweep.
  *
  * Usage: runMain graft.QBench <query_key> [sfDir] [repeats]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QBench <query_key> [sfDir] [repeats]")
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local()
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
