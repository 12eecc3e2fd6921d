package graft

import graft.ml.{Clustering, FlightPipeline}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Emits RUNREPORT.md — the engine's equivalent of the reference's
  * only published outputs, the PNG charts of one full run
  * (`/root/reference/Images/Silhoutte-Scores.png`,
  * `2019-Clusters.png`, `2023-Clusters.png`): silhouette scores for
  * both years, per-cluster × reason profiles, cluster sizes, and the
  * top airlines by cancellation — as markdown tables from one
  * deterministic run (seed 42 fixtures), so the quantitative content
  * of the reference's artifacts is reproducible and diffable instead
  * of a committed screenshot.
  *
  * Usage: runMain graft.Report [outFile]
  */
object Report {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("RUNREPORT.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // No outer pipes: the report template below is a stripMargin
    // string, which would eat a leading `|` as its margin character.
    def md(df: DataFrame, limit: Int = 25): String = {
      val cols = df.columns
      val rows = df.limit(limit).collect()
      val header = cols.mkString(" | ")
      val sep = cols.map(_ => "---").mkString(" | ")
      val body = rows.map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
        .mkString(" | "))
      (header +: sep +: body).mkString("\n")
    }

    val c19 = FlightPipeline.conciliated(
      FlightPipeline.clean2019(FlightPipeline.fixture2019(spark)), "CancellationReason")
    val c23 = FlightPipeline.conciliated(
      FlightPipeline.clean2023(FlightPipeline.fixture2023(spark)), "DelayReason")
    val (model19, p19) = FlightPipeline.fitOn(c19)
    val (_, p23) = FlightPipeline.fitOn(c23)
    val sil19 = Clustering.silhouette(p19)
    val sil23 = Clustering.silhouette(p23)

    val sizes19 = p19.groupBy("prediction").count().orderBy("prediction")
    val profile19 = Clustering.clusterProfile(p19, "Reason", 20)
    val profile23 = Clustering.clusterProfile(p23, "Reason", 20)
    val topAirlines = FlightPipeline.topAirlinesByCancellation(c19)

    val report =
      s"""# RUNREPORT — one deterministic run of the flight pipeline
         |
         |Engine twin of the reference's published artifacts
         |(`/root/reference/Images/`): same pipeline, same parameters
         |(KMeans k=${FlightPipeline.K}, seed=${FlightPipeline.Seed}, features
         |[DayofWeek, DepHour, Month, Distance], delay threshold
         |${FlightPipeline.DelayThresholdMin} min), on the seed-42 synthetic fixtures
         |(the real CSVs are git-LFS pointers in the reference repo).
         |Regenerate with `sbt "runMain graft.Report"` — byte-stable.
         |
         |## Silhouette scores (reference: Silhoutte-Scores.png, ≈0.74 / ≈0.72)
         |
         || year | silhouette (squaredEuclidean) |
         || --- | --- |
         || 2019 | ${f"$sil19%.4f"} |
         || 2023 | ${f"$sil23%.4f"} |
         |
         |Fixture-scale scores differ from the reference's full-data
         |values; `MlSpec` separately asserts the reproduced full
         |pipeline lands in the reference's ±0.05 band.
         |
         |## 2019 cluster sizes (k=${FlightPipeline.K})
         |
         |${md(sizes19)}
         |
         |Cluster centers (unscaled features — distance-dominated, the
         |reference's known skew): ${model19.clusterCenters.map(_.toString).mkString("; ")}
         |
         |## 2019 cluster × reason profile (reference: 2019-Clusters.png)
         |
         |${md(profile19)}
         |
         |## 2023 cluster × reason profile (reference: 2023-Clusters.png)
         |
         |${md(profile23)}
         |
         |## Top airlines by cancellations (reference: flight_analysis.py:197-208)
         |
         |${md(topAirlines)}
         |""".stripMargin

    Files.writeString(Paths.get(outFile), report)
    println(s"[report] wrote ${report.length} chars to $outFile")
    spark.stop()
  }
}
