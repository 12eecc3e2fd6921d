package graft

import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dump ONE registered query's `explain("formatted")` to a file — the
  * per-round optimization evidence trail (`plans/rNN/<key>_before/
  * after.txt`). [[Plans]] regenerates the whole PLANS.md; this main
  * exists so a round can commit the exact before/after plan of just
  * the queries it touched without re-dumping 130 sections.
  *
  * For the two iterative solvers whose REGISTERED plan is a
  * TakeOrdered/scan over an eagerly-truncated result (q_pagerank,
  * q_kcore), the pre-truncation solver plan (Noop strategy — the
  * round-loop shape the 100 TB argument rests on) is appended after
  * the registered plan, as in PLANS.md.
  *
  * Usage: runMain graft.PlanDump <query_key> <outFile> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <query_key> <outFile> [sfDir]")
    val key = args(0)
    val outFile = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val sb = new StringBuilder
    sb.append(s"# $key — explain(formatted) against $sfDir\n\n")
    sb.append(fmt(SparkEntry.queries(key)(spark, sfDir)))
    Storage.releaseAll(spark)
    if (key == "q_kcore") {
      sb.append("\n\n# q_kcore pre-truncation composed peel (Noop strategy)\n\n")
      sb.append(fmt(functions.Graph.kcore(spark, sfDir,
        strategy = functions.CheckpointStrategy.Noop)))
      Storage.releaseAll(spark)
    }
    if (key == "q_pagerank") {
      sb.append("\n\n# q_pagerank pre-truncation round loop (Noop strategy)\n\n")
      val pins = new Pins
      try sb.append(fmt(functions.Graph.pagerank(
          functions.Graph.tradeEdges(spark, sfDir, pins),
          strategy = functions.CheckpointStrategy.Noop, pins = pins)))
      finally pins.releaseAll()
      Storage.releaseAll(spark)
    }
    Files.createDirectories(Paths.get(outFile).getParent)
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[plandump] wrote $key to $outFile")
    spark.stop()
  }
}
