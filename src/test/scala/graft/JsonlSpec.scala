package graft

import graft.sources.Jsonl
import org.apache.spark.sql.Row

/** JSONL source/sink: losslessness on exactly the content that breaks
  * line-oriented formats — embedded newlines, quotes, unicode — plus
  * null round-tripping and the declared-schema (no inference) path.
  */
class JsonlSpec extends SparkSpec {

  test("hostile strings and nulls survive the JSONL roundtrip") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("""line one
                  |line two""".stripMargin), Some(1.5)),
      (2L, Some("quote \" backslash \\ tab \t"), None),
      (3L, Some("unicode: żółć 中文 🚀"), Some(-0.0)),
      (4L, None, Some(Double.MinPositiveValue)))
    val df = rows.toDF("id", "text", "score")
    val path = Scratch.dir("jsonl_spec")
    Jsonl.writeJsonl(df, path)
    val back = Jsonl.readJsonl(spark, path, df.schema).orderBy($"id")
    assert(back.collect().toSeq === df.orderBy($"id").collect().toSeq)
  }

  test("declared schema is used verbatim — no inference widening") {
    import spark.implicits._
    val df = Seq((1L, 2)).toDF("a", "b")
    val path = Scratch.dir("jsonl_schema")
    Jsonl.writeJsonl(df, path)
    // ints serialize identically to longs in JSON; only the declared
    // schema can distinguish them on the way back in
    val back = Jsonl.readJsonl(spark, path, df.schema)
    // JSON sources mark every field nullable; names+types must match
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().toSeq === Seq(Row(1L, 2)))
  }

  test("corrupt lines: PERMISSIVE captures them, DROPMALFORMED drops them") {
    import spark.implicits._
    val path = Scratch.dir("jsonl_corrupt")
    new java.io.File(path).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/part-0.json"),
      """{"id": 1, "text": "good"}
        |this line is not json
        |{"id": 3, "text": "also good"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, text STRING, _corrupt_record STRING")
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    // caching first: Spark refuses a bare query over only the corrupt
    // column of an un-materialized JSON scan
    permissive.cache()
    assert(permissive.count() === 3)
    assert(permissive.filter($"_corrupt_record".isNotNull).count() === 1)
    assert(permissive.filter($"id".isNotNull).count() === 2)
    permissive.unpersist()
    val dropped = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, text STRING"))
      .option("mode", "DROPMALFORMED").json(path)
    assert(dropped.count() === 2)
  }

  test("q_jsonl_roundtrip equals the source table including timestamps") {
    import spark.implicits._
    val out = run("q_jsonl_roundtrip")
    val src = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_orderkey")
    assert(out.collect().toSeq === src.collect().toSeq)
  }
}
