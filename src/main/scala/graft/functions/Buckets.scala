package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE deterministic hash-bucket scheme for membership decisions
  * (train/val/test split, weighted dataset mixing): bucket(key) =
  * first 8 hex digits of md5(key as string), parsed as an integer,
  * mod 100. A pure function of the key — stable across runs, engines,
  * partitionings, and incremental refreshes — which is exactly what
  * RNG sampling is not. Both the Column form and the SQL-twin
  * fragment live HERE so the two consumers (and their oracles) can
  * never drift apart; BucketsSpec pins the cross-form agreement.
  */
object Buckets {

  /** Bucket in [0, 100) of a key column — the codegen'd
    * `md5_prefix64` fold ([[graft.plans.Md5Prefix]]: one digest call,
    * no hex-string materialization; value-identical to the conv chain
    * the SQL twin spells out, pinned by ExpressionSpec/BucketsSpec).
    */
  def hashBucket(key: Column): Column =
    call_function(graft.plans.Md5Prefix.FunctionName,
      key.cast("string"), lit(8)) % 100

  /** The DuckDB twin of [[hashBucket]] for an SQL expression `keyExpr`
    * (must already render as VARCHAR-castable).
    */
  def hashBucketSql(keyExpr: String): String =
    s"CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
}
