package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `ivf_argmin(v, cents)` — the IVF coarse-quantizer assignment
  * (index of the nearest centroid, squared-L2, FIRST occurrence on
  * exact ties) as one fused codegen'd loop.
  *
  * Replaces the `array(k × vec_sqdist)` + `array_min` +
  * `array_position` projection, which is where the corpus-SCALED cell
  * family went superlinear in practice: with k ∝ n (ivfCellCount) the
  * projection inlines k·dim literal doubles into the plan — 10 240 at
  * sf2.0's k=160 — and materializes a k-element array per row, so
  * analysis, codegen and per-row allocation all grow with k on top of
  * the irreducible n·k·dim arithmetic (measured r20 at sf2.0: the
  * assignment stage alone read 31 s of q_label_prop's 38; this
  * expression reads the centroid pool from ONE broadcast-referenced
  * `double[][]` and keeps the whole scan at the arithmetic floor).
  *
  * `cents` must be FOLDABLE (a literal array<array<double>>) — it is
  * evaluated once per operator, not per row. Distance accumulation is
  * STRICT LEFT-TO-RIGHT double addition of `(v_i - c_i)²` per
  * centroid in cell order with a strict `<` best-update — exactly the
  * fold order and the first-occurrence-argmin tie-break of the
  * formulation it replaces (`array_position` returns the FIRST index
  * equal to the min) and of the DuckDB twin's
  * `ROW_NUMBER() OVER (ORDER BY dist, cell) = 1`, so cell assignments
  * are bit-identical across all three spellings (ExpressionSpec pins
  * the parity). Null semantics mirror [[VecSqDist]]: null vector →
  * null; any null element or a length mismatch against any centroid →
  * null.
  */
case class IvfArgmin(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_argmin"

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!okLeft || !okRight) TypeCheckResult.TypeCheckFailure(
      s"$prettyName: arguments must be (array<double>, array<array<double>>), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName: the centroid pool must be a literal (foldable) array")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** The centroid pool, materialized ONCE (right is foldable). */
  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val c = ad.getArray(i)
      val out = new Array[Double](c.numElements())
      var j = 0
      while (j < out.length) { out(j) = c.getDouble(j); j += 1 }
      out
    }
  }

  override def eval(input: InternalRow): Any = {
    val vAny = left.eval(input)
    if (vAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var best = -1
    var bestD = 0.0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != n) return null
      var acc = 0.0
      var j = 0
      while (j < n) {
        val d = v.getDouble(j) - cent(j)
        acc += d * d
        j += 1
      }
      if (best < 0 || acc < bestD) { best = c; bestD = acc }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vGen = left.genCode(ctx)
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val cent = ctx.freshName("cent")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val bad = ctx.freshName("bad")
    ev.copy(code =
      code"""
         |${vGen.code}
         |boolean ${ev.isNull} = true;
         |int ${ev.value} = -1;
         |if (!${vGen.isNull}) {
         |  final int $n = ${vGen.value}.numElements();
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (${vGen.value}.isNullAt($i)) { $bad = true; break; }
         |  }
         |  if (!$bad) {
         |    int $best = -1;
         |    double $bestD = 0.0;
         |    for (int $c = 0; $c < $centsRef.length; $c++) {
         |      final double[] $cent = $centsRef[$c];
         |      if ($cent.length != $n) { $bad = true; break; }
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $n; $j++) {
         |        final double $d = ${vGen.value}.getDouble($j) - $cent[$j];
         |        $acc += $d * $d;
         |      }
         |      if ($best < 0 || $acc < $bestD) { $best = $c; $bestD = $acc; }
         |    }
         |    if (!$bad && $best >= 0) { ${ev.isNull} = false; ${ev.value} = $best; }
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfArgmin {
  val FunctionName = "ivf_argmin"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[IvfArgmin].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$FunctionName(v, cents)")
        IvfArgmin(args.head, args(1))
      }))
}
