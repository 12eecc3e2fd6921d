package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source + sink — the reference's only real I/O surface:
  *
  *   - ingest: headered CSV with NO inferSchema, so every column lands
  *     as string and real types are imposed by explicit cast chains
  *     (`Code/flight_analysis.py:15-16,56-63`). Schema-on-read is
  *     declared, not sniffed — at 100 TB an inference pass over the
  *     input is a full extra scan.
  *   - export: headered CSV, overwrite mode — the reference's terminal
  *     operator (`Code/flight_analysis.py:244-246`). Executors write
  *     one part-file per partition through the Hadoop commit protocol;
  *     nothing materializes on the driver.
  *
  * `q_csv_roundtrip` exercises both directions in one oracle-checkable
  * query: write a testdata table to CSV, read it back all-string,
  * cast-clean to the original types, compare against DuckDB reading
  * the original parquet.
  */
object Csv extends QueryModule {

  /** The reference's terminal export (headered, overwrite). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)

  /** The reference's ingest: headered, all columns string-typed. */
  def readCsvAllString(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Session-unique scratch dir inside the repo (the harness may not
    * write elsewhere; see [[graft.Scratch]] for the collision story).
    */
  private def tmpDir(name: String): String = graft.Scratch.dir(name)

  override def queries: Map[String, Query] = Map(
    "q_csv_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("csv_roundtrip")
      writeCsv(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name", $"n_regionkey"), path)
      readCsvAllString(s, path)
        .select(
          $"n_nationkey".cast("int").as("n_nationkey"),
          $"n_name",
          $"n_regionkey".cast("int").as("n_regionkey"))
        .orderBy($"n_nationkey")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
  )
}
