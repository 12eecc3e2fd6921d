package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import java.util.concurrent.atomic.AtomicInteger

/** Diagnostic: count driver-visible jobs + stages one query submits.
  * Usage: runMain graft.JobCount <query_key> [sfDir]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: JobCount <query_key> [sfDir]")
      sys.exit(2)
    }
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    GraftSession.warm(spark)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        println(s"[job] ${j.jobId} stages=${j.stageInfos.size} " +
          s"${j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")} :: ${desc.take(80)}")
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
    })
    if (sys.env.contains("JC_NO_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val t0 = System.nanoTime()
    SparkEntry.queries(key)(spark, sfDir).write.format("noop").mode("overwrite").save()
    // The listener bus is async — the tail of the chain's start events
    // can still be queued when save() returns; poll until the counts
    // go quiet so the printed totals (which job BUDGETS are derived
    // from) never undercount.
    var last = -1
    var ticks = 0
    while (jobs.get() + stages.get() != last && ticks < 15) {
      last = jobs.get() + stages.get(); Thread.sleep(200); ticks += 1
    }
    println(f"[jobcount] $key: jobs=${jobs.get()} stages=${stages.get()} " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
