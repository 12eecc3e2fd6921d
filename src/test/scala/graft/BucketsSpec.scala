package graft

/** Pins the shared hash-bucket scheme ([[graft.functions.Buckets]])
  * against an INDEPENDENT md5 derivation (java.security, no Spark) —
  * the split/mix membership contract is "pure function of the key",
  * so the exact mapping, not just its distribution, is the invariant.
  */
class BucketsSpec extends SparkSpec {

  test("hashBucket matches an independent md5 derivation and stays in [0,100)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, 999999L, 123456789L)
    val got = ids.toDF("id")
      .select(functions.Buckets.hashBucket($"id").as("b"))
      .collect().map(_.getLong(0)).toSeq
    val expected = ids.map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 100
    }
    assert(got == expected)
    assert(got.forall(b => b >= 0 && b < 100))
  }
}
