package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] ORC source + sink — the second self-describing columnar
  * format next to parquet (SURVEY §2.1 lists the format surface).
  * Unlike the CSV path there is no cast chain: ORC carries its own
  * schema and stripe statistics, so predicate pushdown and column
  * pruning reach the scan exactly as with parquet.
  *
  * `q_orc_roundtrip` writes a testdata table to ORC and reads it back;
  * the oracle reads the ORIGINAL parquet — a true cross-format
  * fidelity check (types, doubles, strings survive the roundtrip
  * bit-exact), not a self-comparison.
  */
object Orc extends QueryModule {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.format("orc").mode("overwrite").save(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  override def queries: Map[String, Query] = Map(
    "q_orc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = graft.Scratch.dir("orc_roundtrip")
      writeOrc(Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment"), path)
      readOrc(s, path).orderBy($"c_custkey")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_orc_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
