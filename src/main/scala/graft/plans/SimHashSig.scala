package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash_sig(hashes)` — 48-bit SimHash of a pre-hashed token set as
  * one codegen'd per-row loop (Charikar, STOC 2002: sign-summed hash
  * bits, packed MSB-first).
  *
  * Bit-identical to the higher-order-function formulation it replaces
  * (`aggregate(toks, zeros, zip_with(...getbit...))`, pinned by
  * ExpressionSpec): counter i tracks bit i of each hash (+1/−1), and
  * the packed value folds counters 0..47 left-to-right, so counter 0
  * lands in packed bit 47. The HOF chain evaluated 48 interpreted
  * lambda frames per token; this is a two-instruction inner loop —
  * and like [[MinHashSig]] it keeps signature generation a pure map,
  * no exchange at any corpus size.
  *
  * Null input → null; empty (or all-null) input → 0L, matching the
  * HOF fold over an empty array.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  private val Bits = 48

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(arrAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val counters = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < Bits) {
          counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < Bits) {
      acc = acc * 2 + (if (counters(b) > 0) 1L else 0L)
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val counters = ctx.freshName("counters")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $counters = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  final long $h = $arr.getLong($i);
         |  for (int $b = 0; $b < $Bits; $b++) {
         |    $counters[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < $Bits; $b++) {
         |  $acc = $acc * 2 + ($counters[$b] > 0 ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  val FunctionName = "simhash_sig"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[SimHashSig].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$FunctionName(tokenHashes)")
        SimHashSig(args.head)
      }))
}
