package graft

/** Session-unique scratch root for queries that materialize
  * intermediate files (CSV roundtrips). One fixed path collided when
  * two sessions ran concurrently (round 2 verdict #5); a per-JVM
  * suffix isolates them. The path is interpolated into BOTH the Spark
  * query and its DuckDB oracle SQL at registration time, so the
  * `oracle_sql.json` a Verify run emits always points at the artifact
  * that same run wrote — the compare can never read another session's
  * (or a stale) CSV as long as runs aren't manually cross-wired.
  */
object Scratch {
  val root: String =
    s"/root/repo/target/tmp/run-${java.util.UUID.randomUUID().toString.take(8)}"
  def dir(name: String): String = s"$root/$name"
}
