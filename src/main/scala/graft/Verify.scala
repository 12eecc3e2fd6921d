package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional key filter (builder iteration only — the driver always
    // calls the 2-arg form): `Verify <sf> <out> q_a q_b` dumps and
    // declares oracles for just those keys, so tools/check.py checks
    // exactly the queries under edit.
    val only = args.drop(2).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    require(only.isEmpty || selected.size == only.size,
      s"unknown keys: ${(only -- selected.keySet).mkString(", ")}")
    // Filtered runs demand a FRESH outDir: oracle_sql.json is rewritten
    // to only the selected keys, so any stale q_* dir from a previous
    // run would be swept by check.py's rows-only pass as an undeclared
    // (and possibly failing) entry.
    if (only.nonEmpty) {
      val stale = Option(new java.io.File(outDir).list()).getOrElse(Array.empty[String])
        .filter(n => n.startsWith("q_") && !only(n))
      require(stale.isEmpty,
        s"outDir holds results for unselected keys (${stale.take(3).mkString(", ")} …) — " +
          "use a fresh outDir for key-filtered runs")
    }
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Self-join queries pin their signature subtrees (persist) so
      // both join sides share one computation; drop the blocks so no
      // query's cache outlives it — including checkpoint blocks the
      // SQL cache manager can't see (Storage.releaseAll vs clearCache).
      Storage.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
