package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the within-cell pool economics
  * ([[functions.Vectors.CellPoolCap]] — SCALING.md's r19 dense-cell
  * item): per SF dir, the corpus size, scaled cell count, max
  * occupancy, the CAPLESS within-cell pair count (Σ occ·(occ−1) — the
  * pathology being measured, quadratic in the densest cell) next to
  * the capped count (Σ occ·(min(occ,cap)−1)) the shipped consumers
  * actually pay, and the OUTPUT agreement of the capped vs capless
  * variants — the semantic-dedup keep-flag agreement rate and the
  * label-prop community-report overlap — so the recall trade is a
  * measured number, not only a documented argument (the
  * JaccardBucketCap top-100 protocol, applied to this cap).
  *
  * Usage: runMain graft.CellPoolCount <sfDir> [sfDir...]
  * The capless variants self-join full cells — run the large SF dirs
  * (the ScaleGen fixtures through sf2.0 are the proven range) only
  * when the quadratic cost is the thing being paid for on purpose.
  */
object CellPoolCount {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    GraftSession.warm(s)
    import s.implicits._
    for (d <- args) {
      val n = Tables.rowCount(s, d, "embeddings")
      val cells = functions.Vectors.ivfCellsFor(n)
      val occ = functions.Vectors.ivfAssigned(
          Tables.embeddings(s, d).select($"vec_id", functions.Vectors.asDouble($"embedding").as("v")),
          cells)
        .groupBy($"cell").count()
        .agg(max($"count").as("mx"),
          sum($"count" * ($"count" - 1)).as("capless"),
          sum($"count" * (least($"count", lit(functions.Vectors.CellPoolCap.toLong)) - 1)).as("capped"))
        .collect().head
      println(s"[pool] $d n=$n cells=${cells.length} max_occ=${occ.getLong(0)} " +
        s"pairs_capless=${occ.getLong(1)} pairs_capped=${occ.getLong(2)}")
      // label_prop's actual candidate economics: per refined BUCKET.
      val rocc = functions.Vectors.refineBuckets(functions.Vectors.ivfAssigned(
          Tables.embeddings(s, d).select($"vec_id", functions.Vectors.asDouble($"embedding").as("v")),
          cells))
        .groupBy($"bucket").count()
        .agg(max($"count").as("mx"),
          sum($"count" * (least($"count", lit(functions.Vectors.CellPoolCap.toLong)) - 1)).as("capped"))
        .collect().head
      println(s"[pool] $d refined max_bucket_occ=${rocc.getLong(0)} pairs_refined_capped=${rocc.getLong(1)}")
      val sd = functions.Vectors.semanticDedup(s, d)
        .select($"vec_id", $"keep".as("keep_c"))
      val sdFree = functions.Vectors.semanticDedup(s, d, poolCap = Int.MaxValue)
        .select($"vec_id", $"keep".as("keep_f"))
      val agree = sd.join(sdFree, "vec_id")
        .agg(count(lit(1)).as("n"), sum(when($"keep_c" === $"keep_f", 1L).otherwise(0L)).as("same"))
        .collect().head
      println(s"[pool] $d semdedup keep agreement ${agree.getLong(1)}/${agree.getLong(0)}")
      Storage.releaseAll(s)
      // Single-probe recall@10 of the SCALED cell family (the r19
      // verdict's unmeasured number): exact brute-force top-10 vs the
      // probe's-own-cell top-10 per query, the q_ann_recall
      // methodology over the scaled assignment (the committed
      // q_ann_recall key grades the FIXED k=8 family).
      locally {
        val ass = functions.Vectors.ivfAssigned(
          Tables.embeddings(s, d).select($"vec_id", functions.Vectors.asDouble($"embedding").as("v")),
          cells).persist()
        val probes = broadcast(ass.filter($"vec_id" < 5)
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"cell".as("qcell")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"sim".desc, $"vec_id".asc)
        def topK(cand: org.apache.spark.sql.DataFrame) = cand
          .select($"q_id", $"vec_id",
            round(functions.Vectors.cosine($"v", $"qv"), 4).as("sim"))
          .withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
          .select($"q_id", $"vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = topK(ass.join(probes, $"vec_id" =!= $"q_id"))
        val approx = topK(ass.join(probes,
          $"cell" === $"qcell" && $"vec_id" =!= $"q_id"))
        println(s"[pool] $d scaled-ivf recall@10 ${(exact intersect approx).size}/${exact.size}")
        ass.unpersist()
      }
      // kNN EDGE recall — the mechanistic number under the report
      // overlap: what fraction of the original (full-cell, uncapped)
      // top-[[functions.Graph.LpaKnn]] edges the refined+capped
      // candidate pool reproduces. LPA amplifies edge changes into
      // label changes, so this is the honest denominator for reading
      // the report-overlap numbers.
      val assigned = functions.Vectors.ivfAssigned(
        Tables.embeddings(s, d).select($"vec_id", functions.Vectors.asDouble($"embedding").as("v")),
        cells).persist()
      def knnEdges(ab: org.apache.spark.sql.DataFrame, cap: Int): Set[(Long, Long)] = {
        val pool = ab.withColumn("prn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy($"bucket")
              .orderBy(md5($"vec_id".cast("string")).asc, $"vec_id".asc)))
          .filter($"prn" <= cap)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"sim".desc, $"nb".asc)
        ab.select($"bucket", $"vec_id", $"v")
          .join(pool.select($"bucket", $"vec_id".as("nb"), $"v".as("nv")), Seq("bucket"))
          .filter($"vec_id" =!= $"nb")
          .select($"vec_id", $"nb",
            round(functions.Vectors.cosine($"v", $"nv"), 4).as("sim"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= functions.Graph.LpaKnn)
          .select($"vec_id", $"nb")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val refEdges = knnEdges(
        assigned.withColumn("bucket", $"cell".cast("long")), Int.MaxValue)
      val gotEdges = knnEdges(
        functions.Vectors.refineBuckets(assigned), functions.Vectors.CellPoolCap)
      println(s"[pool] $d knn edge recall ${(gotEdges intersect refEdges).size}/${refEdges.size}")
      assigned.unpersist()
      val lp = functions.Graph.labelProp(s, d).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      Storage.releaseAll(s)
      val lpFree = functions.Graph.labelProp(s, d,
          poolCap = Int.MaxValue, refine = false).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      Storage.releaseAll(s)
      // Tuple overlap is label-id sensitive (any edge change relabels
      // whole communities), so the SIZE multiset overlap of the top-K
      // is also reported — the label-invariant view of whether the
      // capped graph yields the same community-scale structure.
      def multisetOverlap(a: Seq[Long], b: Seq[Long]): Int = {
        val bc = scala.collection.mutable.Map(b.groupBy(identity).view.mapValues(_.size).toSeq: _*)
        a.count { x =>
          val c = bc.getOrElse(x, 0)
          if (c > 0) { bc(x) = c - 1; true } else false
        }
      }
      println(s"[pool] $d labelprop report overlap ${(lp.toSet intersect lpFree.toSet).size}/${lp.length} " +
        s"sizes ${multisetOverlap(lp.map(_._2).toSeq, lpFree.map(_._2).toSeq)}/${lp.length} " +
        s"(capless ${lpFree.length} rows)")
    }
    s.stop()
  }
}
