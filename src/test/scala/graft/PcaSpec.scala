package graft

import org.apache.spark.sql.functions._

/** PCA contract (no SQL oracle exists for an SVD): the fitted basis
  * must be orthonormal, explained variance must be a valid
  * distribution slice, and the projection must preserve each vector's
  * norm bound (a projection never lengthens a vector).
  */
class PcaSpec extends SparkSpec {

  // The SAME assembly + fit the query runs (shared helpers), so the
  // spec pins the production model, not a parallel copy.
  private lazy val emb =
    ml.Clustering.embeddingFeatures(Tables.embeddings(spark, sf))

  private lazy val model = ml.Clustering.fitPca(emb)

  test("principal components are orthonormal") {
    val m = model.pc // 64×8 column-major
    val d = m.numRows
    val k = m.numCols
    for (i <- 0 until k; j <- i until k) {
      var dot = 0.0
      for (r <- 0 until d) dot += m(r, i) * m(r, j)
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-8, s"col $i · col $j = $dot")
    }
  }

  test("explained variance is a positive, non-increasing distribution slice") {
    val ev = model.explainedVariance.toArray
    assert(ev.length == 8)
    assert(ev.forall(_ > 0.0), ev.mkString(","))
    assert(ev.sum <= 1.0 + 1e-9, s"sum ${ev.sum}")
    ev.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12, s"variance not sorted: $a then $b") }
  }

  test("q_pca_project: projection norm never exceeds the input norm") {
    import spark.implicits._
    val proj = run("q_pca_project")
    val inputNorms = Tables.embeddings(spark, sf)
      .select($"vec_id",
        sqrt(aggregate($"embedding".cast("array<double>"), lit(0.0),
          (acc, x) => acc + x * x)).as("in_norm"))
    val bad = proj.join(inputNorms, Seq("vec_id"))
      .filter($"pc_norm" > $"in_norm" + 1e-3).count()
    assert(bad == 0, s"$bad projections longer than their inputs")
    assert(proj.count() == inputNorms.count())
  }
}
