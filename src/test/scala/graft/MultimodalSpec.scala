package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode stub is deterministic and histogram is a distribution") {
    val a = run("q_multimodal_decode").collect()
    val b = run("q_multimodal_decode").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64))
  }

  test("full histogram sums to ~1 per row") {
    val rows = Multimodal.decode(Multimodal.mediaTable(spark, sf)).collect()
    rows.foreach { r =>
      val h = r.getSeq[Double](3)
      assert(h.length === 16)
      assert(math.abs(h.sum - 1.0) < 1e-9)
    }
  }

  test("metadata projection prunes the payload column from the scan") {
    val q = run("q_multimodal_meta")
    // ReadSchema in the parquet scan must not include the payload source column
    val scan = q.queryExecution.executedPlan.toString
    assert(!scan.contains("payload"))
    assert(q.count() === Tables.documents(spark, sf).count())
  }

  test("frame sampling emits bounded offsets") {
    val rows = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf)).collect()
    rows.foreach { r =>
      val offs = r.getSeq[Int](1)
      assert(offs.nonEmpty)
      assert(offs === offs.sorted)
    }
  }
}
