package graft
import org.apache.spark.sql.SparkSession

/** One session builder for every driver-contract main (Verify, Bench,
  * QBench) — the configs are load-bearing (GraftExtensions registers
  * the codegen expressions; nanosAsLong is hard-required by
  * events.parquet; UTC pins the date functions), so drift between
  * copies silently changes what a main measures or can even read.
  */
object GraftSession {
  def cpusFromEnv: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def local(cpus: String = cpusFromEnv): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run one throwaway job so codegen/scheduler/shuffle start-up cost
    * doesn't bill to the first measured query.
    */
  def warm(s: SparkSession): Unit =
    s.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
}
