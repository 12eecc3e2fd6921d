package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Acceptance rules for the warm-regression baseline loader.
  *
  * These exist because the gate was once vacuously green for two full
  * rounds: the committed baseline lacked the "sf" tag, the loader
  * refused it, and the only trace was `baseline_n: 0` in an output
  * line nobody compared. Every refusal path must carry a distinct
  * status so the bench line names the reason.
  */
class WarmBaselineSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.1"

  private def tmp(content: String): String = {
    val f = Files.createTempFile("warm_baseline", ".json")
    Files.write(f, content.getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("matching sf and cpus tags load the query map") {
    val p = tmp(s"""{\n "sf": "$Sf",\n "cpus": "32",\n "q_agg_summary": 0.25,\n "q_pagerank": 7.5\n}""")
    val (m, st) = WarmBaseline.load(p, Sf, "32")
    assert(st == WarmBaseline.Loaded)
    assert(m == Map("q_agg_summary" -> 0.25, "q_pagerank" -> 7.5))
  }

  test("missing cpus tag refuses with CpusMissing — the r13-r16 cross-config class") {
    val p = tmp(s"""{ "sf": "$Sf", "q_agg_summary": 0.25 }""")
    val (m, st) = WarmBaseline.load(p, Sf, "32")
    assert(st == WarmBaseline.CpusMissing)
    assert(m.isEmpty)
  }

  test("cpus tag for a different config refuses with CpusMismatch") {
    // The exact r13-r16 failure shape: midpoints recorded at local[4]
    // must never gate a sweep run at local[32].
    val p = tmp(s"""{ "sf": "$Sf", "cpus": "4", "q_agg_summary": 0.25 }""")
    val (m, st) = WarmBaseline.load(p, Sf, "32")
    assert(st == WarmBaseline.CpusMismatch)
    assert(m.isEmpty)
  }

  test("missing sf tag refuses the file with SfMissing — the two-round vacuous-gate bug") {
    val p = tmp("""{ "q_agg_summary": 0.25 }""")
    val (m, st) = WarmBaseline.load(p, Sf)
    assert(st == WarmBaseline.SfMissing)
    assert(m.isEmpty)
  }

  test("sf tag for a different scale refuses with SfMismatch") {
    val p = tmp("""{ "sf": "/root/testdata/sf0.01", "q_agg_summary": 0.25 }""")
    val (m, st) = WarmBaseline.load(p, Sf)
    assert(st == WarmBaseline.SfMismatch)
    assert(m.isEmpty)
  }

  test("absent file is NoFile") {
    val (m, st) = WarmBaseline.load("/nonexistent/warm_baseline.json", Sf)
    assert(st == WarmBaseline.NoFile)
    assert(m.isEmpty)
  }

  test("the committed baseline file is accepted at the bench scale and recorded config with no stale keys") {
    val (m, st) = WarmBaseline.load("tools/warm_baseline.json", Sf,
      GraftSession.RecordedCpus)
    assert(st == WarmBaseline.Loaded,
      "tools/warm_baseline.json must carry \"sf\": \"" + Sf + "\" and \"cpus\": \"" +
        GraftSession.RecordedCpus + "\" or the bench gate is vacuous")
    assert(m.nonEmpty)
    // Every baseline key must name a live query; a renamed/deleted
    // query must drop out of the baseline at the next recording.
    // (The reverse — queries not yet baselined — is allowed
    // mid-round and surfaced by Bench's `unbaselined` field instead,
    // so adding a query doesn't demand an immediate re-record.)
    val stale = m.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale keys in warm_baseline.json: $stale")
  }

  test("regression filter: >2x flags, <=2x passes, sub-noise deltas never flag") {
    val base = Map("a_big" -> 1.0, "b_ok" -> 1.0, "c_tiny" -> 0.01, "d_new" -> 0.5)
    val warm = Seq(
      "a_big" -> 2.5,   // 2.5x and +1.5s -> flags
      "b_ok" -> 1.9,    // <2x -> passes
      "c_tiny" -> 0.05, // 5x but +0.04s, under the 0.1s noise floor -> passes
      "e_unbaselined" -> 9.0) // no baseline entry -> not the filter's job
    val r = WarmBaseline.regressions(warm, base)
    assert(r.map(_._1) == Seq("a_big"))
  }

  test("confirm-spread record renders for a flagged query and marks gate-wide disagreement unstable") {
    // Round-11 verdict item 5: this path only executes during REAL
    // regressions and had never fired in a recorded run — drive a
    // synthetic flagged query through the same pipeline Bench uses
    // (regressions -> confirm map -> rendered line) so the gate code
    // cannot rot unobserved.
    val base = Map("q_slow" -> 1.0, "q_fine" -> 1.0)
    val warm = Seq("q_slow" -> 3.0, "q_fine" -> 1.1)
    val flagged = WarmBaseline.regressions(warm, base).map(_._1)
    assert(flagged == Seq("q_slow"))
    // Confirm pass disagrees with the sweep by more than GateFactor
    // (3.0 vs 0.9) -> the record must render both numbers, keep the
    // min, and call the query unstable.
    val line = WarmBaseline.confirmSpreadLine(
      flagged.map(k => k -> (3.0, 0.9)).toMap)
    assert(line.isDefined)
    val json = line.get
    assert(json.startsWith("""{"metric":"confirm_spread""""), json)
    assert(json.contains(""""q_slow":{"sweep":3.000,"confirm":0.900,""" +
      """"kept":0.900,"unstable":true}"""), json)
    // A reproducing (stable) regression: both measurements agree ->
    // not unstable, min still kept.
    val stable = WarmBaseline.confirmSpreadLine(Map("q_slow" -> (3.0, 2.8)))
    assert(stable.get.contains(""""kept":2.800,"unstable":false"""), stable.get)
    // Clean gate -> the line must not render at all.
    assert(WarmBaseline.confirmSpreadLine(Map.empty).isEmpty)
  }
}
