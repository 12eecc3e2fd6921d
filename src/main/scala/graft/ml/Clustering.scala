package graft.ml

import graft.{QueryModule, Tables}
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's ML payload (SURVEY §2.9), Spark-ML native:
  * VectorAssembler → KMeans(k=5, seed=42) → predict → silhouette →
  * cluster profiling (`Code/flight_analysis.py:128-152`).
  *
  * KMeans.fit is inherently iterative (kmeans|| init + Lloyd): each
  * iteration broadcasts current centers and treeAggregates partial
  * sums — that is already the right distributed shape at 100 TB; the
  * input is cached by spark.ml internally for the iterations.
  *
  * The vector→string export (`Code/flight_analysis.py:227-241`) is
  * UDF-free: built from array/concat built-ins so it stays inside
  * whole-stage codegen (the reference's Python UDF forced a
  * BatchEvalPython break on every executor).
  */
object Clustering extends QueryModule {

  val FeatureCols: Array[String] =
    Array("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def assembler(inputCols: Array[String] = FeatureCols): VectorAssembler =
    new VectorAssembler()
      .setInputCols(inputCols)
      .setOutputCol("features")
      .setHandleInvalid("keep")

  def fitKMeans(df: DataFrame, k: Int = 5, seed: Long = 42L): KMeansModel =
    new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(df)

  /** Standardize features before clustering — the improvement the
    * reference needs (SURVEY §0 bug table: its raw features span
    * DayofWeek 1–7 vs Distance to ~5000, so distance dominates every
    * centroid). Two treeAggregate passes (fit stats + transform), no
    * extra shuffle.
    */
  def scaled(assembled: DataFrame): DataFrame =
    new StandardScaler()
      .setInputCol("features").setOutputCol("features_std")
      .setWithMean(true).setWithStd(true)
      .fit(assembled).transform(assembled)
      .drop("features").withColumnRenamed("features_std", "features")

  /** Embedding table → (vec_id, label, features) with the ml-Vector
    * bridge — shared by q_pca_project and PcaSpec so the spec pins the
    * SAME assembly the query runs, not a parallel copy.
    */
  def embeddingFeatures(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("features"))

  /** PCA fit shared by q_pca_project and PcaSpec (k, column names in
    * one place).
    */
  def fitPca(df: DataFrame, k: Int = 8): org.apache.spark.ml.feature.PCAModel =
    new org.apache.spark.ml.feature.PCA()
      .setInputCol("features").setOutputCol("pc").setK(k).fit(df)

  def silhouette(predictions: DataFrame): Double =
    new ClusteringEvaluator()
      .setMetricName("silhouette")
      .setDistanceMeasure("squaredEuclidean")
      .evaluate(predictions)

  /** Cluster profile: per-(cluster, key) counts, multi-key descending
    * sort, top rows (`Code/flight_analysis.py:147-152`) — with the
    * deterministic tiebreaker the reference lacks.
    */
  def clusterProfile(predictions: DataFrame, key: String, limit: Int = 20): DataFrame =
    predictions.groupBy(col("prediction"), col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("prediction").asc, col(key).asc)
      .limit(limit)

  /** UDF-free vector/array → "[1, 2, 3]" string (elements floored to
    * longs so float rendering can't differ across engines). Array
    * form; for discrete source columns prefer [[colsToString]], which
    * stays fully inside whole-stage codegen (higher-order lambdas
    * evaluate interpreted).
    */
  def arrayToString(arr: Column): Column =
    concat(lit("["),
      array_join(transform(arr, x => floor(x).cast("long").cast("string")), ", "),
      lit("]"))

  /** [[arrayToString]] over discrete columns — no array, no lambda:
    * `concat_ws` over per-column floor/cast chains, entirely
    * codegen'd. Renders identically to `arrayToString(array(cols…))`
    * (MlSpec pins the parity).
    */
  def colsToString(cols: Column*): Column =
    concat(lit("["),
      concat_ws(", ", cols.map(c => floor(c).cast("long").cast("string")): _*),
      lit("]"))

  override def queries: Map[String, Query] = Map(
    // KMeans on lineitem features; output is the per-cluster size
    // distribution (sorted by size desc — label ids are not portable,
    // sizes are). No oracle: clustering is not SQL-expressible.
    "q_kmeans_predict" -> ((s, dir) => {
      import s.implicits._
      // Deliberately UNPINNED (measured, round 14): persisting the
      // assembled frame makes KMeans.fit skip its internal
      // handlePersistence cache of the extracted instances RDD, so
      // every Lloyd round re-reads the row cache and re-extracts
      // vectors — 13.8 s warm at sf0.1 vs 5.2 s unpinned. The
      // predict pass recomputing the assemble lineage once is far
      // cheaper than the trainer losing its instance cache.
      val feats = assembler().transform(
        Tables.lineitem(s, dir).select(FeatureCols.toIndexedSeq.map(col): _*))
      val model = fitKMeans(feats)
      model.transform(feats)
        .groupBy($"prediction").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"prediction".asc)
    }),

    // KMeans on STANDARDIZED features — the scale-corrected variant of
    // q_kmeans_predict (same k/seed; cluster-size distribution output;
    // no oracle: clustering is not SQL-expressible). Unpinned for the
    // q_kmeans_predict reason (same measured regression).
    "q_kmeans_scaled" -> ((s, dir) => {
      import s.implicits._
      val feats = scaled(assembler().transform(
        Tables.lineitem(s, dir).select(FeatureCols.toIndexedSeq.map(col): _*)))
      val model = fitKMeans(feats)
      model.transform(feats)
        .groupBy($"prediction").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"prediction".asc)
    }),

    // [EXT] PCA projection of the embedding corpus — dimensionality
    // reduction before ANN/clustering, the standard embedding-pipeline
    // step. PCA.fit is one treeAggregate of the Gram matrix (64×64
    // partials merged on the driver, independent of row count) + a
    // local SVD; transform is a broadcast matrix multiply per row —
    // both the right distributed shape at any corpus size. No oracle
    // (SVD is not SQL-expressible); PcaSpec pins orthonormal
    // components and the explained-variance contract.
    "q_pca_project" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.ml.functions.vector_to_array
      val emb = embeddingFeatures(Tables.embeddings(s, dir))
      fitPca(emb).transform(emb)
        .select($"vec_id", $"label", vector_to_array($"pc").as("pc"))
        .select($"vec_id", $"label",
          round(element_at($"pc", 1), 4).as("pc1"),
          round(element_at($"pc", 2), 4).as("pc2"),
          round(sqrt(aggregate($"pc", lit(0.0), (acc, x) => acc + x * x)), 4)
            .as("pc_norm"))
        .orderBy($"vec_id")
    }),

    // Vector stringification, UDF-free (`Code/flight_analysis.py:227-241`).
    // Built from the four source columns directly — the array+transform
    // form evaluated its lambda interpreted on every row (1.9 s warm at
    // sf0.1 for a 4-element stringify); this one is plain column math.
    "q_udf_vec_str" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).select(
        $"l_orderkey", $"l_linenumber",
        colsToString($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
          .as("features_str"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_udf_vec_str" ->
      """SELECT l_orderkey, l_linenumber,
        |  '[' || array_to_string(list_transform(
        |    [l_quantity, l_extendedprice, l_discount, l_tax],
        |    x -> CAST(CAST(FLOOR(x) AS BIGINT) AS VARCHAR)), ', ') || ']' AS features_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
