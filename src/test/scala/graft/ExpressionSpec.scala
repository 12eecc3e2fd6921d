package graft

import graft.functions.Dedup
import graft.plans.MinHashSig
import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** The custom Catalyst expression surface ([[graft.plans.MinHashSig]],
  * injected via [[graft.GraftExtensions]]).
  *
  * What must hold:
  *   - FAMILY PARITY: member j equals `min(xxhash64(h, j))` over the
  *     hash array — the SQL composition the expression replaced.
  *     Banding built on either path must bucket identically.
  *   - interpreted eval == codegen eval (the spec calls the
  *     expression's `eval` directly and compares against the
  *     codegen'd DataFrame result).
  *   - null semantics: null/empty/all-null input → null signature.
  *   - PLAN: the signature stage is a pure map — zero exchanges
  *     before banding (the aggregate shape it replaced shuffled every
  *     (doc, shingle-hash) pair).
  */
class ExpressionSpec extends SparkSpec {

  test("minhash_sig matches the xxhash64(h, j) SQL composition member-for-member") {
    import spark.implicits._
    val k = 8
    val df = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon")),
      (2L, Seq("one two three")),
      (3L, Seq("alpha beta gamma"))).toDF("id", "sh")
      .select($"id", transform($"sh", s => xxhash64(s)).as("hs"))
    val viaExpr = df
      .select($"id", call_function("minhash_sig", $"hs", lit(k)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaSql = df
      .select($"id", explode($"hs").as("h"))
      .groupBy($"id")
      .agg(array((0 until k).map(j => min(xxhash64(col("h"), lit(j)))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr === viaSql)
  }

  test("interpreted eval equals the codegen'd DataFrame result") {
    import spark.implicits._
    val hashes = Seq(-3L, 0L, 42L, Long.MaxValue, Long.MinValue)
    val interpreted = MinHashSig(
      Literal(ArrayData.toArrayData(hashes.toArray), ArrayType(LongType)), Literal(6))
      .eval().asInstanceOf[ArrayData].toLongArray.toSeq
    val viaDf = Seq(Tuple1(hashes)).toDF("hs")
      .select(call_function("minhash_sig", $"hs", lit(6)).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(interpreted === viaDf)
    // and both equal a direct reimplementation of the family
    val direct = (0 until 6).map(j =>
      hashes.map(h => XXH64.hashInt(j, XXH64.hashLong(h, 42L))).min)
    assert(interpreted === direct)
  }

  test("null, empty, and all-null inputs produce a null signature") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(7L)))),
      (2L, Some(Seq.empty[Option[Long]])),
      (3L, None),
      (4L, Some(Seq[Option[Long]](None, None)))).toDF("id", "hs")
    val out = df.select($"id", call_function("minhash_sig", $"hs", lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(1L) !== null)
    assert(out(2L) === null)
    assert(out(3L) === null)
    assert(out(4L) === null)
  }

  test("numHashes must be a foldable literal in range") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "hs")
    val err = intercept[Exception] {
      df.select(call_function("minhash_sig", $"hs", lit(0))).collect()
    }
    assert(err.getMessage.contains("minhash_sig"), err.getMessage)
    val err2 = intercept[Exception] {
      // non-foldable k: a column reference
      df.select(call_function("minhash_sig", $"hs", $"id".cast("int"))).collect()
    }
    assert(err2.getMessage.contains("minhash_sig"), err2.getMessage)
  }

  test("signature stage plans as a pure map: no exchange before banding") {
    val sigs = Dedup.minhashSignatures(
      Tables.documents(spark, sf), "doc_id", "text", 16)
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }
}
