package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_sqdist(a, b)` — squared L2 distance of two double arrays as
  * one codegen'd loop, replacing the
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, +)` chain
  * (two interpreted lambda frames per element) that every IVF
  * assignment evaluates once per centroid per row.
  *
  * Accumulation is STRICT LEFT-TO-RIGHT double addition of
  * `(a_i - b_i) * (a_i - b_i)`, exactly the fold order of the HOF
  * chain and of the DuckDB `list_sum(list_transform(list_zip(...)))`
  * twin — so distances (and therefore argmin cell assignments and
  * their tie-breaks) are bit-identical and every IVF oracle keeps
  * matching (ExpressionSpec pins the parity).
  *
  * Null semantics mirror [[VecDot]]: null array → null; length
  * mismatch or any null element → null.
  */
case class VecSqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: both arguments must be array<double>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecSqDist {
  val FunctionName = "vec_sqdist"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[VecSqDist].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$FunctionName(a, b)")
        VecSqDist(args.head, args(1))
      }))
}
