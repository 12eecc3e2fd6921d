package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
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

  val FunctionName = "md5_prefix64"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[Md5Prefix].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$FunctionName(str, nHex)")
        Md5Prefix(args.head, args(1))
      }))
}
