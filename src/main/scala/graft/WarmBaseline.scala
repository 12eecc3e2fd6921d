package graft

/** Loader for the committed per-query warm baseline
  * (`tools/warm_baseline.json`) that feeds Bench's
  * `warm_regressions` gate.
  *
  * Extracted from Bench so the acceptance rules are unit-testable:
  * the gate spent two rounds vacuously green because the committed
  * file lacked the `"sf"` scale tag the loader requires, and the only
  * symptom was `baseline_n: 0` in a line nobody alerted on. The
  * loader now returns an explicit status that Bench prints, so an
  * ignored baseline names its reason instead of degrading to an
  * empty map.
  */
object WarmBaseline {
  /** Why the returned baseline map is (or isn't) populated. */
  sealed abstract class Status(val tag: String)
  /** File present, `"sf"` tag matches the run's SF dir. */
  case object Loaded extends Status("loaded")
  /** No baseline file at the path — a fresh checkout or an
    * SPARK_GRAFT_WARM_BASELINE override pointing nowhere. */
  case object NoFile extends Status("no_file")
  /** File present but carries no `"sf"` tag, so the scale it was
    * recorded at is unknown — refuse rather than guess. */
  case object SfMissing extends Status("sf_missing")
  /** File present but recorded at a different SF dir than this run
    * (a local sf0.01 iteration must not compare against sf0.1
    * numbers, nor vice versa). */
  case object SfMismatch extends Status("sf_mismatch")
  /** File present but carries no `"cpus"` tag, so the parallelism it
    * was recorded at is unknown — the r13–r16 phantom-flag class was
    * exactly a cross-config comparison (quads at local[4] vs sweeps
    * at local[32]); refuse rather than re-open it. */
  case object CpusMissing extends Status("cpus_missing")
  /** File present but recorded at a different local[n] than this run
    * (driver-latency-bound queries differ ~1.7× between 4 and 32
    * cpus — a cross-config gate flags config, not regressions). */
  case object CpusMismatch extends Status("cpus_mismatch")

  /** Parse the baseline file; the map is non-empty only for
    * [[Loaded]]. Regex-parsed on purpose — the file is a flat
    * `{"sf": "dir", "cpus": "n", "q_*": seconds}` object (sf and
    * cpus are QUOTED strings — the cpus regex below only accepts a
    * quoted value; a recorder emitting a bare number is refused as
    * CpusMissing) and Spark ships no JSON library worth a dependency
    * for this.
    */
  def load(path: String, sfDir: String,
      cpus: String = GraftSession.RecordedCpus): (Map[String, Double], Status) = {
    val f = new java.io.File(path)
    if (!f.isFile) (Map.empty, NoFile)
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val baseSf = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
      val baseCpus = """"cpus"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
      (baseSf, baseCpus) match {
        case (None, _) => (Map.empty, SfMissing)
        case (Some(s), _) if s != sfDir => (Map.empty, SfMismatch)
        case (_, None) => (Map.empty, CpusMissing)
        case (_, Some(c)) if c != cpus => (Map.empty, CpusMismatch)
        case _ =>
          (""""(q_[a-z0-9_]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap,
            Loaded)
      }
    }
  }

  /** The gate ratio — shared by [[regressions]] and Bench's
    * confirm-spread "unstable" detector so the two thresholds cannot
    * drift apart silently (they express the same tolerance).
    *
    * RECORDING DISCIPLINE (the round-12 lesson, now the rule): a
    * committed midpoint must come from an ISOLATED QBench quad at the
    * recorded config — run 1 discarded as compile floor, the midpoint
    * read from the settled tail — and must REPRODUCE on an idle host,
    * never from one sweep's quiet in-pass readings. Round 12 halved
    * q_pagerank/q_kcore's midpoints from a single quiet sweep pair;
    * no isolated quad could reproduce them, so every realistic driver
    * window read >2× and the gate was structurally red with no code
    * regression behind it. A baseline an idle quad cannot hit is not
    * a baseline; it is a future false alarm.
    */
  val GateFactor: Double = 2.0

  private def fmtSec(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Render the confirm-pass transparency record for flagged queries:
    * both measurements (sweep + isolated confirm), the kept minimum,
    * and an `unstable` marker when the two disagree by more than the
    * gate ratio itself — so an intermittent regression reads as
    * "unstable" in the round evidence instead of silently passing on
    * its lucky run. None when nothing was flagged (the line must not
    * render at all on a clean gate). Extracted from Bench.main so the
    * path that only executes during REAL regressions is exercised by
    * WarmBaselineSpec every round, not first exercised in production
    * the day a regression finally lands.
    */
  def confirmSpreadLine(confirmed: Map[String, (Double, Double)]): Option[String] =
    if (confirmed.isEmpty) None
    else {
      val spread = confirmed.toSeq.sortBy(_._1).map { case (k, (s, c)) =>
        val unstable = math.max(s, c) > GateFactor * math.min(s, c)
        "\"" + k + "\":{\"sweep\":" + fmtSec(s) + ",\"confirm\":" + fmtSec(c) +
          ",\"kept\":" + fmtSec(math.min(s, c)) + ",\"unstable\":" + unstable + "}"
      }.mkString("{", ",", "}")
      Some(s"""{"metric":"confirm_spread","queries":$spread}""")
    }

  /** Warm times exceeding their baseline by more than `factor`, with
    * an absolute floor so sub-100ms measurement noise can't flag
    * (a 2× there is milliseconds). Sorted worst-first.
    */
  def regressions(
      warm: Iterable[(String, Double)],
      baseline: Map[String, Double],
      factor: Double = GateFactor,
      absFloorSec: Double = 0.1): Seq[(String, Double, Double)] =
    warm.toSeq
      .flatMap { case (k, w) => baseline.get(k).map(b => (k, w, b)) }
      .filter { case (_, w, b) => w > factor * b && w - b > absFloorSec }
      .sortBy { case (_, w, b) => -(w / b) }
}
