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
  private val base = java.nio.file.Paths.get("/root/repo/target/tmp")

  val root: String = {
    // Prune abandoned run-* dirs from previous sessions. Deleting our
    // OWN dir at exit is not an option: the driver's DuckDB compare
    // reads the CSV path baked into oracle_sql.json AFTER the Verify
    // JVM exits. So cleanup is deferred: 24 h old AND not touched
    // since — `dir()` refreshes the root's mtime on every use, so a
    // long-lived session's dir reads as live, while a finished run's
    // artifacts stay available for post-hoc compares for a day.
    val cutoff = System.currentTimeMillis() - 24L * 60 * 60 * 1000
    if (java.nio.file.Files.isDirectory(base)) {
      val old = base.toFile.listFiles((f: java.io.File) =>
        f.isDirectory && f.getName.startsWith("run-") && f.lastModified < cutoff)
      if (old != null) old.foreach(deleteRecursively)
    }
    s"$base/run-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  def dir(name: String): String = {
    val f = new java.io.File(root)
    if (f.isDirectory) f.setLastModified(System.currentTimeMillis())
    s"$root/$name"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
