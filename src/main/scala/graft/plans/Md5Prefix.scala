package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix64(s, nHex)` — the first `nHex` hex digits of md5(s) as
  * a long, in one codegen'd step.
  *
  * Semantically identical to the SQL chain
  * `CAST(CONV(SUBSTRING(MD5(s), 1, nHex), 16, 10) AS BIGINT)` — the
  * form every DuckDB twin interpolates
  * (`CAST(('0x' || substr(md5(x),1,nHex)) AS BIGINT)`) — but the
  * chain allocates a 32-char hex string, a substring, and a conv
  * output string, then parses digits TWICE, per evaluation. This
  * folds the digest's leading nibbles directly into a long: one
  * MessageDigest call, zero string materialization. It is the hot
  * identity-hash step of the dedup family (per SHINGLE in MinHash,
  * per TOKEN in SimHash — see `Dedup.shingleHashBase` /
  * `Dedup.tokenHash48`) and the md5 hash-bucket family
  * (`Buckets.hashBucket`: per-row bucket draws in the curation
  * queries). ExpressionSpec pins exact equality with the conv chain,
  * interpreted == codegen, and null semantics.
  *
  * `nHex` must be a foldable literal in [1, 15] — 15 nibbles (60
  * bits) is the widest prefix that stays non-negative in a signed
  * long, and a per-row width would make downstream schemas
  * meaningless (same rationale as `minhash_sig`'s k).
  *
  * Null input → null. Hashing is over the string's UTF-8 BYTES,
  * exactly like Spark's `md5` and DuckDB's `md5` of a VARCHAR.
  */
case class Md5Prefix(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "md5_prefix64"

  private lazy val nHex: Int = right.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: first argument must be string, got ${left.dataType.sql}")
    } else if (right.dataType != IntegerType || !right.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: nHex must be an int literal, got ${right.sql}")
    } else {
      val v = right.eval()
      if (v == null || v.asInstanceOf[Int] < 1 || v.asInstanceOf[Int] > 15)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: nHex must be in [1, 15], got $v")
      else TypeCheckResult.TypeCheckSuccess
    }

  override protected def nullSafeEval(strAny: Any, nAny: Any): Any =
    Md5Prefix.prefix(strAny.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Prefix.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (str, _) =>
      s"${ev.value} = $cls.prefix($str, $nHex);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `md5_lanes64(s, nHex, nLanes)` — ONE md5 digest split into
  * `nLanes` disjoint `nHex`-hex-digit lanes, returned as
  * `array<long>`: lane i is `CONV(SUBSTRING(MD5(s), i*nHex + 1,
  * nHex), 16, 10)` — the construction a DuckDB twin spells with
  * `substr(md5(x), i*nHex + 1, nHex)`.
  *
  * Why not nLanes [[Md5Prefix]] calls with offsets: each call would
  * recompute the digest, and the digest IS the cost — a consumer
  * that needs k independent bounded uniforms per row (the Poisson
  * bootstrap's per-replica draws) pays k/nLanes digests instead of k.
  * Why not the builtin `md5` + substring/conv chain: measured SLOWER
  * than even the per-lane digests it saves — the hex string, the
  * substring, and conv's parse each allocate per evaluation.
  * Disjoint bit ranges of one digest are independent uniforms.
  *
  * `nHex` in [1, 15], `nLanes ≥ 1`, `nHex·nLanes ≤ 32` (the digest's
  * hex width), both foldable literals. Null input → null; elements
  * never null. ExpressionSpec pins lane i == the conv chain at
  * offset i·nHex + 1, interpreted == codegen, and the lane-0 ==
  * md5_prefix64 identity.
  */
case class Md5Lanes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "md5_lanes64"

  private lazy val nHex: Int = second.eval().asInstanceOf[Int]
  private lazy val nLanes: Int = third.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: first argument must be string, got ${first.dataType.sql}")
    } else if (second.dataType != IntegerType || !second.foldable ||
        third.dataType != IntegerType || !third.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: nHex and nLanes must be int literals")
    } else {
      val h = second.eval(); val l = third.eval()
      if (h == null || l == null) {
        TypeCheckResult.TypeCheckFailure(s"$prettyName: null shape literal")
      } else {
        val (hi, li) = (h.asInstanceOf[Int], l.asInstanceOf[Int])
        if (hi < 1 || hi > 15)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: nHex must be in [1, 15], got $hi")
        else if (li < 1 || hi * li > 32)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: need nLanes >= 1 and nHex*nLanes <= 32, got $hi*$li")
        else TypeCheckResult.TypeCheckSuccess
      }
    }

  override protected def nullSafeEval(strAny: Any, hAny: Any, lAny: Any): Any =
    Md5Prefix.lanes(strAny.asInstanceOf[UTF8String], nHex, nLanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Prefix.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (str, _, _) =>
      s"${ev.value} = $cls.lanes($str, $nHex, $nLanes);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Md5Prefix {
  /** Thread-local digest: MessageDigest is stateful and not
    * thread-safe; one instance per executor thread amortizes
    * allocation over the whole task.
    */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nHex` hex digits of md5(bytes of s) folded into a long —
    * digit i is nibble i of the digest (high nibble first per byte),
    * exactly the value `CONV(SUBSTRING(hex, 1, nHex), 16, 10)`
    * parses. Public static so generated code can call it.
    */
  def prefix(s: UTF8String, nHex: Int): Long = {
    val md = digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = digest(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xF else b & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** All `nLanes` disjoint `nHex`-nibble lanes of md5(bytes of s) —
    * lane i spans nibbles [i·nHex, (i+1)·nHex), each folded exactly
    * like [[prefix]] (so lane 0 == prefix). Public static so
    * generated code can call it.
    */
  def lanes(s: UTF8String, nHex: Int, nLanes: Int): ArrayData = {
    val md = digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    val out = new Array[Long](nLanes)
    var lane = 0
    while (lane < nLanes) {
      var v = 0L
      var i = lane * nHex
      val end = i + nHex
      while (i < end) {
        val b = digest(i >> 1)
        val nib = if ((i & 1) == 0) (b >> 4) & 0xF else b & 0xF
        v = (v << 4) | nib
        i += 1
      }
      out(lane) = v
      lane += 1
    }
    new GenericArrayData(out)
  }

  val FunctionName = "md5_prefix64"
  val LanesFunctionName = "md5_lanes64"

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[Md5Prefix].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$FunctionName(str, nHex)")
        Md5Prefix(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier(LanesFunctionName),
      new ExpressionInfo(classOf[Md5Lanes].getName, LanesFunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"$LanesFunctionName(str, nHex, nLanes)")
        Md5Lanes(args.head, args(1), args(2))
      }))
  }
}
