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

    // Date ARITHMETIC (the extraction ops above only read components):
    // truncation to month, offset by interval, day difference — all
    // codegen'd date math on the int-days representation.
    "q_date_arith" -> ((s, dir) => {
      import s.implicits._
      val d = $"o_orderdate".cast("date")
      // dates rendered as ISO strings: parquet DATE arrives in pandas
      // as python date objects while DuckDB emits datetime64 — the
      // string form keeps the driver compare type-stable.
      Tables.orders(s, dir).select(
        $"o_orderkey",
        date_format(date_trunc("month", d), "yyyy-MM-dd").as("month_start"),
        date_format(add_months(d, 3), "yyyy-MM-dd").as("plus_3m"),
        date_format(date_add(d, 30), "yyyy-MM-dd").as("plus_30d"),
        datediff(to_date(lit("2025-01-01")), d).as("days_to_2025"))
        .orderBy($"o_orderkey")
    }),

    // Map-typed column surface: parse props into map<string,int>, then
    // key lookup / cardinality / merged literal map — the config-bag
    // pattern of metadata columns at scale (keys prunable without
    // schema evolution).
    "q_map_ops" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id",
          from_json($"props", org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)).as("m"))
        .select($"event_id",
          element_at($"m", "k").as("k"),
          size(map_keys($"m")).as("n_keys"),
          element_at(map_concat($"m", map(lit("extra"), lit(1))), "extra").as("extra"))
        .orderBy($"event_id")
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

    // [EXT] regex capture-group extraction: split the structured
    // "<n>-<label>" priority code into typed parts — the
    // schema-on-read workhorse for semi-structured string columns.
    // Codegen'd regexp_extract; the pattern compiles once per task.
    // No-match yields "" from regexp_extract, which ANSI cast rejects
    // — nullif makes non-conforming rows typed NULLs on both engines
    // (labels like "NOT SPECIFIED" contain spaces, hence `.+`).
    "q_regex_extract" -> ((s, dir) => {
      import s.implicits._
      val re = "^(\\d+)-(.+)$"
      Tables.orders(s, dir)
        .select(
          $"o_orderkey",
          nullif(regexp_extract($"o_orderpriority", re, 1), lit(""))
            .cast("int").as("prio_num"),
          nullif(regexp_extract($"o_orderpriority", re, 2), lit("")).as("prio_word"))
        .orderBy($"o_orderkey")
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
    "q_date_arith" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey,
        |  strftime(date_trunc('month', d), '%Y-%m-%d') AS month_start,
        |  strftime(d + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        |  strftime(d + 30, '%Y-%m-%d') AS plus_30d,
        |  CAST(datediff('day', d, DATE '2025-01-01') AS INT) AS days_to_2025
        |FROM o ORDER BY o_orderkey""".stripMargin,
    "q_map_ops" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  1 AS extra
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
    "q_regex_extract" ->
      """SELECT o_orderkey,
        |  CAST(nullif(regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 1), '') AS INT) AS prio_num,
        |  nullif(regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 2), '') AS prio_word
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
