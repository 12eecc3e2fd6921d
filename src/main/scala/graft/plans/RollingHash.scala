package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(s)` — polynomial rolling hash (Rabin–Karp fold)
  * h_i = (h_{i-1}·31 + b_i) mod 1e9+7 over the string's BYTES, as one
  * codegen'd per-row loop.
  *
  * Replaces the higher-order formulation
  * `aggregate(transform(split(s,''), ascii), 0L, (h,c) -> ...)`, which
  * pays an interpreted lambda frame per CHARACTER (two per character
  * counting the transform) — this is a three-instruction inner loop
  * over the raw bytes, no per-element allocation, zero shuffle.
  *
  * CONTRACT: byte-fold ≡ code-point-fold only for ASCII input — the
  * caller canonicalizes (q_rolling_hash strips to printable ASCII
  * first, which is also what keeps the DuckDB character-slicing twin
  * comparable). The modulus keeps every intermediate below 2^35, so
  * the fold is exact in int64 on any engine.
  *
  * Null input → null; empty input → 0L, matching the HOF fold over an
  * empty array.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val Mod = 1000000007L

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be string, got ${other.sql}")
  }

  override protected def nullSafeEval(strAny: Any): Any = {
    val s = strAny.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31 + (s.getByte(i) & 0xff)) % Mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $str.numBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * 31L + ($str.getByte($i) & 0xff)) % ${Mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val FunctionName = "rolling_hash"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[RollingHash].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$FunctionName(str)")
        RollingHash(args.head)
      }))
}
