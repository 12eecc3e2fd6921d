package graft

import graft.ml.{Clustering, FlightPipeline}
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  test("kmeans produces k non-trivial clusters covering all rows") {
    val sizes = run("q_kmeans_predict").collect().map(_.getLong(1))
    assert(sizes.length <= 5 && sizes.length >= 2)
    assert(sizes.sum === Tables.lineitem(spark, sf).count())
  }

  test("kmeans with fixed seed is stable across re-runs") {
    val a = run("q_kmeans_predict").collect().map(_.getLong(1)).toSeq
    val b = run("q_kmeans_predict").collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }

  test("flight pipeline end-to-end: profile bounded, silhouette matches BASELINE band") {
    val spark0 = spark
    val prepped = FlightPipeline.conciliated(
      FlightPipeline.clean2019(FlightPipeline.fixture2019(spark0)), "CancellationReason")
    val preds = FlightPipeline.clusterPredictions(prepped)
    val sil = Clustering.silhouette(preds)
    info(s"silhouette 2019 fixture = $sil")
    val sil23 = Clustering.silhouette(FlightPipeline.clusterPredictions(
      FlightPipeline.conciliated(
        FlightPipeline.clean2023(FlightPipeline.fixture2023(spark0)), "DelayReason")))
    info(s"silhouette 2023 fixture = $sil23")
    // BASELINE.md publishes ≈0.74 (2019) / ≈0.72 (2023) for the
    // reference's unscaled, distance-dominated clustering; the
    // fixtures reproduce that regime (measured 0.737 / 0.718), so
    // assert the published values within ±0.05 — not merely (0,1].
    assert(math.abs(sil - 0.74) <= 0.05, s"silhouette 2019=$sil outside 0.74±0.05")
    assert(math.abs(sil23 - 0.72) <= 0.05, s"silhouette 2023=$sil23 outside 0.72±0.05")
    val profile = Clustering.clusterProfile(preds, "Reason", 20).collect()
    assert(profile.length <= 20 && profile.nonEmpty)
    val cnts = profile.map(_.getAs[Long]("cnt"))
    assert(cnts.sameElements(cnts.sorted.reverse))
  }

  test("silhouette band holds on a SECOND fixture scale and seed (regression tripwire)") {
    // The single-fixture band above could mask a KMeans-path
    // regression that happens to leave that one (size, seed) point
    // inside its band. A second measurement at a different corpus
    // size AND a different KMeans seed pins the structural property —
    // the unscaled feature regime is distance-dominated, so the
    // silhouette is a function of the geometry, not of the init draw
    // or the row count. Bands are measured values ±0.05, same
    // tolerance discipline as the BASELINE band.
    val s = spark
    val prepped = FlightPipeline.conciliated(
      FlightPipeline.clean2019(FlightPipeline.fixture2019(s, rows = 1200)),
      "CancellationReason")
    val feats = Clustering.assembler(FlightPipeline.ClusterFeatures)
      .transform(FlightPipeline.sanitize(prepped, FlightPipeline.ClusterFeatures.toSeq))
    val model = Clustering.fitKMeans(feats, FlightPipeline.K, seed = 7L)
    val sil = Clustering.silhouette(model.transform(feats))
    info(s"silhouette 2019 fixture rows=1200 seed=7 = $sil")
    // measured 0.7322 on the pinned local[4]/shuffle=4 harness
    assert(math.abs(sil - 0.73) <= 0.05, s"silhouette=$sil outside 0.73±0.05")
  }

  test("2023 branch conciliates to the same schema as 2019") {
    val s = spark
    val c19 = FlightPipeline.conciliated(
      FlightPipeline.clean2019(FlightPipeline.fixture2019(s)), "CancellationReason")
    val c23 = FlightPipeline.conciliated(
      FlightPipeline.clean2023(FlightPipeline.fixture2023(s)), "DelayReason")
    assert(c19.schema.fieldNames.toSeq === c23.schema.fieldNames.toSeq)
    // the union the reference never did but implies
    assert(c19.unionByName(c23).count() === c19.count() + c23.count())
  }

  test("cast-then-fill actually fills (the reference's fill-then-cast was a no-op)") {
    import spark.implicits._
    val cleaned = FlightPipeline.clean2019(FlightPipeline.fixture2019(spark))
    assert(cleaned.filter($"DelayMinutes".isNull).count() === 0)
    assert(cleaned.filter($"Airline" === "Not Listed").count() > 0)
  }

  test("scoring restricts to top airlines via semi join and predicts clusters") {
    import spark.implicits._
    val s = spark
    val prepped = FlightPipeline.conciliated(
      FlightPipeline.clean2019(FlightPipeline.fixture2019(s)), "CancellationReason")
    val top = FlightPipeline.topAirlinesByCancellation(prepped, 3)
    val topNames = top.collect().map(_.getString(0)).toSet
    val future = Seq(
      (1, 10, 6, 500.0, topNames.head),
      (2, 14, 7, 800.0, "NoSuchAirline"))
      .toDF("DayofWeek", "DepHour", "Month", "Distance", "Airline")
    val (model, _) = FlightPipeline.fitOn(prepped)
    val scored = FlightPipeline.scoreFuture(future, top, model)
    val rows = scored.collect()
    assert(rows.length === 1) // NoSuchAirline filtered by the semi join
    assert(rows.head.getAs[Int]("prediction") >= 0)
  }

  test("arrayToString renders deterministic bracket form") {
    import spark.implicits._
    val out = Seq(Array(1.9, 2.0, 3.7)).toDF("a")
      .select(Clustering.arrayToString($"a")).collect().head.getString(0)
    assert(out === "[1, 2, 3]")
  }

  test("colsToString renders identically to arrayToString over the same values") {
    import spark.implicits._
    val df = Seq((1.9, 2.0, -3.7, 0.0), (41.0, 0.07, 5.5, -0.2))
      .toDF("a", "b", "c", "d")
    val rows = df.select(
      Clustering.arrayToString(array($"a", $"b", $"c", $"d")).as("viaArray"),
      Clustering.colsToString($"a", $"b", $"c", $"d").as("viaCols")).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
