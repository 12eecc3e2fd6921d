package graft

import graft.sources.Csv
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CSV source/sink semantics — the reference's ingest
  * (`Code/flight_analysis.py:15-16`: headered, no inferSchema, all
  * columns string) and terminal export (`:244-246`: headered,
  * overwrite).
  */
class CsvSpec extends SparkSpec {

  private val dir = "/root/repo/target/tmp/csv_spec"

  test("headered CSV read lands every column as string (no inferSchema)") {
    import spark.implicits._
    Csv.writeCsv(Seq((1, "a", 2.5), (2, "b", 3.5)).toDF("i", "s", "d"), dir)
    val back = Csv.readCsvAllString(spark, dir)
    assert(back.schema.fields.forall(_.dataType.typeName == "string"),
      back.schema.treeString)
    assert(back.count() === 2)
  }

  test("CSV sink writes a header row and honors overwrite mode") {
    import spark.implicits._
    Csv.writeCsv(Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v"), dir)
    Csv.writeCsv(Seq((9, "only")).toDF("k", "v"), dir) // overwrite
    val parts = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.nonEmpty)
    val lines = parts.flatMap(p => Files.readAllLines(p).asScala).filter(_.nonEmpty)
    assert(lines.contains("k,v"), s"missing header in $lines")
    // overwrite replaced the first write entirely
    assert(lines.filterNot(_ == "k,v") === Seq("9,only"))
  }

  test("q_csv_roundtrip: cast-clean after all-string read recovers parquet values") {
    val rt = run("q_csv_roundtrip").collect()
    val direct = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect()
    assert(rt.toSeq === direct.toSeq)
  }
}
