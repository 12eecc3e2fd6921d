package graft

/** Diagnostic main for the LSH candidate economics (SCALING.md's
  * q_ngram_jaccard watch item): per SF dir, the raw band-collision
  * pair count (no occupancy cap, no verify) next to the
  * capped+verified pair count the shipped exact-Jaccard stage
  * actually pays for — the two numbers whose RATIO shows what
  * [[functions.Dedup.JaccardBucketCap]] buys as the corpus grows.
  *
  * Usage: runMain graft.CandCount <sfDir> [sfDir...]
  *
  * The raw count is DELIBERATELY uncapped — that is the pathology
  * being measured — so it is quadratic in hot-bucket occupancy and
  * can blow up on a large SF dir with a degenerate bucket. Run it on
  * sized-down dirs (the ScaleGen fixtures through sf2.0 are the
  * proven range); the capped count is safe at any SF.
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    for (d <- args) {
      val docs = Tables.documents(s, d)
      val raw = functions.Dedup.candidatePairs(docs, "doc_id", "text",
        numHashes = 32, bands = 16).count()
      val capped = functions.Dedup.exactJaccardCandidates(docs).count()
      println(s"[cand] $d raw=$raw capped_verified=$capped")
      Storage.releaseAll(s)
      // SimHash-tuning first-band-capped recall loss (the r19
      // advisor's measurability ask — the number that RETIRED the
      // first-matching-band rule): pairs the r19 predicate dropped
      // because their first raw matching band sat in a capped bucket
      // while a later band survived = cappedDistinct − firstMatch.
      // The shipped stage now pays for cappedDistinct.
      val (firstMatch, cappedDistinct) = functions.Dedup.simTuningPairCounts(docs)
      println(s"[cand] $d simtuning first_match=$firstMatch capped_distinct=$cappedDistinct " +
        s"first_band_capped_loss=${cappedDistinct - firstMatch}")
      Storage.releaseAll(s)
    }
    s.stop()
  }
}
