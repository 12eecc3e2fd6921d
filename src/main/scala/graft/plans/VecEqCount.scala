package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `vec_eq_count(a, b)` — number of positions at which two long arrays
  * agree, as one codegen'd loop. Replaces the
  * `aggregate(zip_with(a, b, (x,y) => when(x===y,1.0)...), 0.0, +)`
  * chain behind MinHash Jaccard estimation, which ran two interpreted
  * lambda frames per signature member PER CANDIDATE PAIR — the hot
  * inner loop of the banding dedup paths, where candidate volume
  * grows with the corpus.
  *
  * Exact integer agreement count — the estimate `count / numHashes`
  * (and its 4dp rounding) stays in the query, so the division order
  * matches the previous HOF spelling and every threshold decision is
  * unchanged (ExpressionSpec pins count parity against the HOF chain
  * on equal-length arrays).
  *
  * Null semantics: null array → null; length mismatch or any null
  * element → null. (Signatures are fixed-width by construction, so
  * the mismatch branch is a bug trap, not a code path — the HOF
  * chain would have zero-padded instead.)
  */
case class VecEqCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_eq_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: both arguments must be array<bigint>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (a.getLong(i) == b.getLong(i)) acc += 1L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    if ($a.getLong($i) == $b.getLong($i)) $acc++;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecEqCount {
  val FunctionName = "vec_eq_count"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[VecEqCount].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$FunctionName(a, b)")
        VecEqCount(args.head, args(1))
      }))
}
