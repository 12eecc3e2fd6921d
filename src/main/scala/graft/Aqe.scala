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
  * Bench/Verify/QBench all run sequentially), so the bracket is safe
  * here; a deployment that multiplexes concurrent queries must give
  * each its own `SparkSession.newSession()` clone — per-session
  * confs isolate the bracket while sharing the context and cache.
  */
object Aqe {
  def off[A](session: SparkSession)(body: => A): A = {
    val conf = session.conf
    val prior = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally conf.set("spark.sql.adaptive.enabled", prior)
  }
}
