package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface: date/time feature extraction (the
  * reference's `dayofweek`/`month`/`hour` features,
  * `Code/flight_analysis.py:101-112`), JSON field extraction from the
  * events `props` column, and array explode. All codegen'd built-ins —
  * no UDFs, so every expression stays inside whole-stage codegen.
  *
  * Cross-engine gotcha handled here: Spark `dayofweek` is 1=Sunday..7,
  * DuckDB's is 0=Sunday..6 — the oracle adds 1 (SURVEY §2.8).
  */
object Scalars extends QueryModule {

  override def queries: Map[String, Query] = Map(
    "q_date_features" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).select(
        $"o_orderkey",
        dayofweek($"o_orderdate").as("dow"),
        month($"o_orderdate").as("mon"),
        year($"o_orderdate").as("yr"),
        hour($"o_orderdate").as("hr"))
        .orderBy($"o_orderkey")
    }),

    // HHMM-style integer decode (`Code/flight_analysis.py:102`):
    // floor(x / 100) over a numeric code.
    "q_hhmm_decode" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir).select(
        $"event_id",
        (hour($"ts") * 100 + minute($"ts")).as("hhmm"))
        .withColumn("decoded_hour", floor($"hhmm" / 100).cast("int"))
        .orderBy($"event_id")
    }),

    "q_json_extract" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir).select(
        $"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
        .orderBy($"event_id")
    }),

    // Typed JSON parse with a DECLARED schema (from_json → struct) —
    // the scale path for repeated extraction: one parse per row into a
    // typed column instead of one tree-walk per get_json_object call,
    // and malformed rows surface as nulls, not task failures.
    "q_json_typed" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      import s.implicits._
      val propsSchema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, dir)
        .select($"event_id", from_json($"props", propsSchema).as("p"))
        .select($"event_id", $"p.k".as("k"),
          ($"p.k" >= 50).as("k_high"))
        .orderBy($"event_id")
    }),

    // Generator/UDTF surface: explode of a split array (SURVEY §2.10).
    "q_explode" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter($"doc_id" < 50)
        .select($"doc_id", explode(split($"text", " ")).as("token"))
        .orderBy($"doc_id", $"token")
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_date_features" ->
      """SELECT o_orderkey,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(month(o_orderdate) AS INT) AS mon,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(hour(o_orderdate) AS INT) AS hr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_hhmm_decode" ->
      """SELECT event_id,
        |  CAST(hour(ts) * 100 + minute(ts) AS INT) AS hhmm,
        |  CAST(FLOOR((hour(ts) * 100 + minute(ts)) / 100) AS INT) AS decoded_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_typed" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INT) >= 50 AS k_high
        |FROM events ORDER BY event_id""".stripMargin,
    "q_explode" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id, token""".stripMargin,
  )
}
