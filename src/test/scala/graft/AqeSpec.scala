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
