package graft

/** Pins the [[Aqe.off]] bracket's contract — the three claims its
  * scaladoc makes and the graph solvers rely on:
  *
  *   1. the prior conf value is restored on BOTH exit paths (a
  *      throwing solver must not leave the whole session non-adaptive);
  *   2. the bracket is per-SESSION, not per-context: a
  *      `SparkSession.newSession()` clone keeps AQE on while a bracket
  *      is open on the original — the documented mitigation for a
  *      deployment that multiplexes concurrent queries;
  *   3. lazy frames RETURNED by the body execute under the caller's
  *      restored conf (only the solver's INTERNAL actions run
  *      non-adaptive), because the conf is read at planning time, not
  *      at DataFrame construction.
  */
class AqeSpec extends SparkSpec {
  private val Key = "spark.sql.adaptive.enabled"

  test("off restores the prior value on normal and throwing exit") {
    spark.conf.set(Key, "true")
    Aqe.off(spark) {
      assert(spark.conf.get(Key) === "false", "bracket must disable AQE")
    }
    assert(spark.conf.get(Key) === "true", "normal exit must restore")
    intercept[RuntimeException] {
      Aqe.off(spark) { throw new RuntimeException("solver failure") }
    }
    assert(spark.conf.get(Key) === "true", "throwing exit must restore")
  }

  test("a newSession clone keeps AQE on while a bracket is open on the original") {
    spark.conf.set(Key, "true")
    val clone = spark.newSession()
    Aqe.off(spark) {
      assert(spark.conf.get(Key) === "false")
      assert(clone.conf.get(Key) === "true",
        "per-session confs must isolate the bracket (the documented " +
          "mitigation for concurrent queries)")
    }
    assert(clone.conf.get(Key) === "true")
  }

  test("a bracket opened while another thread holds one throws; a clone session does not") {
    spark.conf.set(Key, "true")
    val inner = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val cloneOk = new java.util.concurrent.atomic.AtomicBoolean(false)
    Aqe.off(spark) {
      val t = new Thread(() => {
        try Aqe.off(spark) { fail("cross-thread bracket must not open") }
        catch { case e: IllegalStateException => inner.set(e) }
        // The documented mitigation stays legal: a newSession clone
        // opens its own bracket concurrently without conflict.
        val clone = spark.newSession()
        Aqe.off(clone) { cloneOk.set(clone.conf.get(Key) === "false") }
      })
      t.start(); t.join()
    }
    assert(inner.get() != null,
      "a second thread opening a bracket on the SAME session must fail loudly")
    assert(cloneOk.get(), "a clone session's bracket must open concurrently")
    assert(spark.conf.get(Key) === "true", "outer bracket must still restore")
    // Same-thread nesting stays legal and unwinds the conf correctly.
    Aqe.off(spark) {
      Aqe.off(spark) { assert(spark.conf.get(Key) === "false") }
      assert(spark.conf.get(Key) === "false",
        "inner exit must restore the OUTER bracket's value, not the caller's")
    }
    assert(spark.conf.get(Key) === "true")
  }

  test("a session that never set the key explicitly leaves the bracket with it unset") {
    // conf.getAll is the EXPLICIT-settings map (getOption resolves the
    // registered default, so it cannot observe unset-ness).
    spark.conf.unset(Key)
    assert(!spark.conf.getAll.contains(Key))
    Aqe.off(spark) { assert(spark.conf.get(Key) === "false") }
    assert(!spark.conf.getAll.contains(Key),
      "restore must unset, not pin the default as an explicit literal " +
        "(it would shadow a later session-default change)")
    spark.conf.set(Key, "true") // leave the shared session as the suite expects
  }

  test("a lazy frame built inside the bracket plans adaptively once outside") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    spark.conf.set(Key, "true")
    import spark.implicits._
    // An aggregate (needs an exchange) is AQE-eligible; built INSIDE
    // the bracket but first planned outside it, the restored conf must
    // win — the scaladoc's "lazy frames returned by body" claim.
    val returned = Aqe.off(spark) {
      spark.range(100).toDF("id")
        .groupBy(($"id" % 7).as("k"))
        .count()
    }
    val planned = returned.queryExecution.executedPlan
    assert(planned.isInstanceOf[AdaptiveSparkPlanExec],
      s"frame returned from the bracket must plan adaptively, got:\n$planned")
  }
}
