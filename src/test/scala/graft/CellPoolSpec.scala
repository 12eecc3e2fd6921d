package graft

import graft.functions.{Graph, Vectors}
import org.apache.spark.sql.functions._

/** Pins for the within-cell comparison-pool cap
  * ([[Vectors.CellPoolCap]] — the third occupancy-cap contract, after
  * JaccardBucketCap and SimTuningBucketCap):
  *
  *   - INERTNESS below the cap: when every cell's occupancy is ≤ the
  *     cap the pool is the whole cell, so capped == capless row for
  *     row (both consumers). The fixture property that makes the
  *     check meaningful (max occupancy ≤ cap at the spec SF) is
  *     asserted, so a fixture change that silently voids the test
  *     fails loudly instead.
  *   - the EXACT capped rule above it: at a tiny forced cap (2) the
  *     semantic-dedup decisions match an independent brute-force
  *     evaluation of "dropped iff ≥τ-similar to a HIGHER-PRIORITY
  *     member of the first-2 pool", and differ from capless — the
  *     recall trade is real, deterministic, and exactly the
  *     documented rule (not an implementation accident).
  *   - STRUCTURE under the cap: the LPA kNN graph built from a
  *     2-member pool still reaches every connectable node (pool size
  *     min(occ, cap) ≥ 2 keeps every vector ≥1 edge), and the
  *     snapshot stays deterministic.
  */
class CellPoolSpec extends SparkSpec {

  test("pool cap is inert when occupancy ≤ cap: capped == capless for both consumers (fixture property asserted)") {
    import spark.implicits._
    val occ = Vectors.ivfAssigned(
        Tables.embeddings(spark, sf)
          .select($"vec_id", Vectors.asDouble($"embedding").as("v")),
        Vectors.ivfCellsFor(Tables.rowCount(spark, sf, "embeddings")))
      .groupBy($"cell").count().agg(max($"count")).collect().head.getLong(0)
    assert(occ <= Vectors.CellPoolCap,
      s"fixture max occupancy $occ exceeds the cap — this inertness test no longer tests inertness")
    val sd = Vectors.semanticDedup(spark, sf).collect().toSeq
    val sdUncapped = Vectors.semanticDedup(spark, sf, poolCap = Int.MaxValue).collect().toSeq
    assert(sd === sdUncapped, "semantic dedup must be cap-inert below occupancy")
    Storage.releaseAll(spark)
    val lp = Graph.labelProp(spark, sf).collect().toSeq
    Storage.releaseAll(spark)
    val lpUncapped = Graph.labelProp(spark, sf, poolCap = Int.MaxValue).collect().toSeq
    Storage.releaseAll(spark)
    assert(lp === lpUncapped, "label prop must be cap-inert below occupancy")
  }

  test("semantic dedup at poolCap=2 matches the independent brute-force capped rule and differs from capless") {
    import spark.implicits._
    val capped = Vectors.semanticDedup(spark, sf, poolCap = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    Storage.releaseAll(spark)
    val capless = Vectors.semanticDedup(spark, sf, poolCap = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    Storage.releaseAll(spark)
    assert(capped.toSeq !== capless.toSeq,
      "a 2-member pool must change decisions somewhere — otherwise the activation test is vacuous")

    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    capped.groupBy(_._2).values.foreach { members =>
      val pool = members.sortBy(m => (m._3, m._1)).take(2)
      for (x <- members) {
        val expectDrop = pool.exists(y => y._1 != x._1 &&
          (y._3 < x._3 || (y._3 == x._3 && y._1 < x._1)) &&
          r4(cos(vecs(x._1), vecs(y._1))) >= Vectors.SemDedupTau)
        assert((x._4 == 0) === expectDrop,
          s"vec ${x._1}: keep=${x._4} disagrees with the brute-force pool-2 rule")
      }
    }
  }

  test("refineBuckets: inert below target (bucket = cell·2^maxBits); splits a dense spread cell; cannot split a near-dup core") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def vec(): Seq[Double] = Seq.fill(64)((rnd.nextGaussian() * 100).round / 1000.0)
    // Cell 0: 100 spread vectors (≤ target → 0 bits). Cell 1: 600
    // spread vectors (→ 2 bits, hyperplanes split). Cell 2: 300
    // copies of ONE vector (dense near-dup core — same side of every
    // plane, so refinement CANNOT split it; the md5 pool cap is the
    // guard there).
    val dup = vec()
    val rows =
      (1 to 100).map(i => (i.toLong, vec(), 0)) ++
      (1000 to 1599).map(i => (i.toLong, vec(), 1)) ++
      (2000 to 2299).map(i => (i.toLong, dup, 2))
    val a = rows.toDF("vec_id", "v", "cell")
    val out = Vectors.refineBuckets(a)
      .select($"vec_id", $"cell", $"bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCell = out.groupBy(_._2)
    // Inert below target: one bucket, exactly cell·2^maxBits.
    assert(byCell(0).map(_._3).distinct.toSeq === Seq(0L << Vectors.RefineMaxBits))
    // Dense spread cell: multiple sub-buckets, all in cell 1's range,
    // and the dominant bucket is materially smaller than the cell.
    val b1 = byCell(1).map(_._3)
    assert(b1.distinct.length > 1, "hyperplanes must split a spread dense cell")
    assert(b1.forall(b => b >= (1L << Vectors.RefineMaxBits) && b < (2L << Vectors.RefineMaxBits)))
    assert(b1.groupBy(identity).values.map(_.size).max < 600)
    // Near-dup core: identical vectors share every sign bit — one
    // bucket, full occupancy (the documented can't-split case).
    assert(byCell(2).map(_._3).distinct.length === 1)
    // Determinism: same input, same buckets.
    val again = Vectors.refineBuckets(a)
      .select($"vec_id", $"cell", $"bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("LPA kNN graph from a 2-member pool still reaches every connectable node; snapshot deterministic") {
    import spark.implicits._
    val r1 = Graph.labelProp(spark, sf, poolCap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Storage.releaseAll(spark)
    val r2 = Graph.labelProp(spark, sf, poolCap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Storage.releaseAll(spark)
    assert(r1 === r2, "capped LPA must stay a pure function of the data")
    assert(r1.nonEmpty)
    val cellSizes = Vectors.ivfAssigned(
        Tables.embeddings(spark, sf)
          .select($"vec_id", Vectors.asDouble($"embedding").as("v")),
        Vectors.ivfCellsFor(Tables.rowCount(spark, sf, "embeddings")))
      .groupBy($"cell").count().collect().map(_.getLong(1))
    val connectable = cellSizes.filter(_ >= 2).sum
    if (r1.length < Graph.LpaTopK)
      assert(r1.map(_._2).sum === connectable,
        "every node in a ≥2-occupant cell must land in exactly one community under the capped pool")
  }
}
