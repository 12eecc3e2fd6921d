package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's SparkSessionExtensions entry point — enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (every
  * session builder in this repo does: Verify, Bench, Plans, the test
  * harness). Custom Catalyst surface lives behind this one hook so a
  * user of the library turns on everything non-built-in with a single
  * conf, the same way Delta/Iceberg register theirs.
  *
  * Currently injected: `minhash_sig` ([[graft.plans.MinHashSig]]),
  * `simhash_sig` ([[graft.plans.SimHashSig]]), `vec_dot`
  * ([[graft.plans.VecDot]]), `vec_sqdist` ([[graft.plans.VecSqDist]]),
  * `ivf_argmin` ([[graft.plans.IvfArgmin]]),
  * `vec_eq_count` ([[graft.plans.VecEqCount]]), `rolling_hash`
  * ([[graft.plans.RollingHash]]), `md5_prefix64`
  * ([[graft.plans.Md5Prefix]]), and the explicit bloom semi-join
  * pair `graft_bloom_agg` / `graft_might_contain`
  * ([[graft.plans.BloomFunctions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    plans.MinHashSig.register(ext)
    plans.SimHashSig.register(ext)
    plans.VecDot.register(ext)
    plans.VecSqDist.register(ext)
    plans.IvfArgmin.register(ext)
    plans.VecEqCount.register(ext)
    plans.RollingHash.register(ext)
    plans.Md5Prefix.register(ext)
    plans.BloomFunctions.register(ext)
  }
}
