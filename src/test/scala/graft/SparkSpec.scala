package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites — pinned to local[4] /
  * shuffle=4 / UTC to match the driver harness (SURVEY §7: KMeans
  * determinism depends on partitioning).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf: String = "/root/testdata/sf0.001"

  /** No-oracle keys that are nonetheless fully deterministic (hashed
    * priorities, fixed planes/seeds, integer fixed-point) — the shared
    * subject of the adversarial sweeps: PartitionInvarianceSpec (1-vs-7
    * partitions) and EmptyInputSpec (zero-row robustness). One list so
    * a key added to one sweep cannot silently miss the other; the
    * genuinely partition-dependent no-oracle keys (model fits, seeded
    * samplers, order-folding sketches) are excluded here and each
    * documented in ContractSpec.
    */
  val DeterministicNoOracle: Seq[String] = Seq(
    "q_multimodal_decode", "q_approx_distinct")
}

abstract class SparkSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.Sf
  def run(key: String): org.apache.spark.sql.DataFrame =
    SparkEntry.queries(key)(spark, sf)

  // The dedup/self-join operators pin subtrees (persist) and leave
  // unpersist to the caller — drop them per suite so cached blocks
  // don't accumulate across the shared session for the whole sbt run.
  override protected def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }
}
