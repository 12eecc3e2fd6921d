package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q_scan_project filters and projects") {
    val rows = run("q_scan_project").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 45))
    assert(rows.head.schema.fieldNames.toSeq ===
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
  }

  test("q_filter_topk_count matches direct computation") {
    import spark.implicits._
    val topk = run("q_filter_topk_count").collect()
    assert(topk.length === 5)
    // counts must be non-increasing, keys tiebreak ascending
    val cnts = topk.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sorted.reverse))
    // cross-check the winner against a raw recount
    val byHand = Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    topk.foreach(r => assert(byHand(r.getLong(0)) === r.getLong(1)))
    assert(topk.map(_.getLong(1)).min === byHand.values.toSeq.sorted.reverse.take(5).min)
  }

  test("caseWhenMap compiles a dictionary to chained whens") {
    import spark.implicits._
    val df = Seq("A", "B", "X", null).toDF("code")
    val out = df.select(graft.operators.Relational
        .caseWhenMap($"code", Seq("A" -> "Alpha", "B" -> "Beta"), "Other").as("label"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("Alpha", "Beta", "Other", "Other"))
  }

  test("q_null_fill leaves no nulls and preserves untouched rows") {
    val rows = run("q_null_fill").collect()
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    assert(rows.exists(_.getDouble(1) == 0.0))      // filled numeric
    assert(rows.exists(_.getString(2) == "None"))   // filled string
    assert(rows.exists(_.getDouble(1) > 0.0))       // untouched numeric
  }

  test("q_isin_filter only keeps listed segments") {
    val segs = run("q_isin_filter").select("c_mktsegment")
      .distinct().collect().map(_.getString(0)).toSet
    assert(segs.subsetOf(Set("BUILDING", "AUTOMOBILE")))
    assert(segs.nonEmpty)
  }

  test("q_cast_clean types are as declared") {
    val schema = run("q_cast_clean").schema
    assert(schema("qty_int").dataType.typeName === "integer")
    assert(schema("odd_line").dataType.typeName === "boolean")
    assert(schema("key_d").dataType.typeName === "double")
  }
}
