package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** [EXT] JSON-lines source + sink — the second I/O format beyond the
  * reference's CSV surface (`Code/flight_analysis.py:15-16,244-246`
  * only reads/writes CSV; JSONL is the interchange format every
  * LLM-data pipeline actually ships).
  *
  *   - ingest: schema is DECLARED, never inferred — same posture as
  *     the CSV source: at 100 TB an inference pass is a full extra
  *     scan of the input, and JSON inference additionally widens
  *     conflicting types into strings silently.
  *   - export: executors write one part-file per partition through the
  *     Hadoop commit protocol; nothing materializes on the driver.
  *     JSON escapes embedded newlines/quotes, so round-tripping text
  *     that would break naive CSV quoting is the point of the format.
  *
  * `q_jsonl_roundtrip` exercises both directions under the DuckDB
  * oracle: a typed slice of `orders` (bigint, varchar, double,
  * TIMESTAMP) goes out to JSONL and back in through the declared
  * schema, and must equal the original parquet rows byte-for-byte —
  * including the timestamp column, which is the part a lossy
  * format/parser combination would corrupt first.
  */
object Jsonl extends QueryModule {

  /** JSONL export (one JSON object per line, overwrite). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.format("json").mode("overwrite").save(path)

  /** JSONL ingest with a declared schema — no inference pass. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  override def queries: Map[String, Query] = Map(
    "q_jsonl_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = graft.Scratch.dir("jsonl_roundtrip")
      val slice = Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
      writeJsonl(slice, path)
      readJsonl(s, path, slice.schema)
        .orderBy($"o_orderkey")
    }),
  )

  override def oracles: Map[String, String] = Map(
    // The oracle reads the ORIGINAL parquet — the roundtrip must be
    // lossless, so the JSONL file itself never appears here.
    "q_jsonl_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
