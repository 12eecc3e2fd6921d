package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_sig(hashes, k)` — the k-member MinHash signature of a
  * pre-hashed shingle set, as ONE codegen'd per-row expression.
  *
  * Replaces the explode → groupBy(doc) with k `min(xxhash64(h, j))`
  * aggregates shape: signatures are a property of a single row, so
  * computing them through an aggregate paid a full hash-partition
  * SHUFFLE of every (doc, shingle-hash) pair for what is
  * embarrassingly parallel work. As an expression the signature stage
  * is a pure map — no exchange at any corpus size, which is the
  * difference between a scan-rate stage and a shuffle-bound stage at
  * 100 TB (the reference's dedup pass streams its corpus once;
  * `/root/reference/` has no counterpart operator — this is the [EXT]
  * LLM-pipeline surface).
  *
  * The hash family is bit-identical to the SQL composition it
  * replaces: member j of the signature is
  * `min over shingle-hashes h of xxhash64(h, j)` with Spark's fixed
  * seed 42, i.e. `XXH64.hashInt(j, XXH64.hashLong(h, 42L))` — the
  * ExpressionSpec pins that parity, so banding built on either path
  * buckets identically.
  *
  * Semantics: NULL for a null or effectively-empty (all-null / empty)
  * hash array — mirroring the aggregate shape, where a doc with no
  * shingles produced no row. Null elements are skipped.
  *
  * Registered as a SQL function via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`), the standard
  * extension-injection path, so `call_function`/`expr`/plain SQL all
  * resolve it with full codegen — preference order (b) of SURVEY §2.10:
  * a native Catalyst expression, not a UDF.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  import MinHashSig.Seed

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  /** k is required foldable: the signature width shapes the schema of
    * everything downstream (banding slices), so a per-row width would
    * be meaningless — and a compile-time constant lets codegen unroll
    * against a fixed-size array.
    */
  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!leftOk) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: first argument must be array<bigint>, got ${left.dataType.sql}")
    } else if (right.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: numHashes must be int, got ${right.dataType.sql}")
    } else if (!right.foldable) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName: numHashes must be a literal")
    } else {
      val v = right.eval()
      if (v == null || v.asInstanceOf[Int] < 1 || v.asInstanceOf[Int] > 1024)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: numHashes must be in [1, 1024], got $v")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(arrAny: Any, kAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val base = XXH64.hashLong(arr.getLong(i), Seed)
        var j = 0
        while (j < k) {
          val h = XXH64.hashInt(j, base)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (seen) UnsafeArrayData.fromPrimitiveArray(out) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = classOf[UnsafeArrayData].getName
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  $seen = true;
         |  final long $base = $xxh.hashLong($arr.getLong($i), ${Seed}L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $h = $xxh.hashInt($j, $base);
         |    if ($h < $out[$j]) $out[$j] = $h;
         |  }
         |}
         |if ($seen) {
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  /** Spark's fixed xxhash64 seed — keeps the family bit-identical to
    * the `xxhash64(h, j)` SQL composition this expression replaces.
    */
  val Seed: Long = 42L

  val FunctionName = "minhash_sig"

  /** Inject `minhash_sig` into a session's function registry. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[MinHashSig].getName, FunctionName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$FunctionName(shingleHashes, numHashes)")
        MinHashSig(args.head, args(1))
      }))
}
