package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_sig(hashes, k)` — the k-member MinHash signature of a
  * pre-hashed shingle set, as ONE codegen'd per-row expression.
  *
  * Replaces the explode → groupBy(doc) with k min-aggregates shape:
  * signatures are a property of a single row, so computing them
  * through an aggregate paid a full hash-partition SHUFFLE of every
  * (doc, shingle-hash) pair for what is embarrassingly parallel work.
  * As an expression the signature stage is a pure map — no exchange at
  * any corpus size, which is the difference between a scan-rate stage
  * and a shuffle-bound stage at 100 TB (the reference's dedup pass
  * streams its corpus once; `/root/reference/` has no counterpart
  * operator — this is the [EXT] LLM-pipeline surface).
  *
  * Hash family: the classic affine minwise family (Broder 1997 /
  * Carter–Wegman universal hashing) — member j of the signature is
  * `min over shingle base-hashes h of (a_j·h + b_j) mod p` with
  * p = 2^31−1 (Mersenne prime) and (a_j, b_j) drawn once from a
  * seeded generator ([[MinHashSig.coeffs]]). Chosen over re-hashing
  * with an engine-private 64-bit hash for two reasons: the member
  * derivation is two integer ops instead of a full hash evaluation
  * per (shingle, member), and — decisive for the correctness story —
  * the whole family is plain ANSI arithmetic, so every banding
  * consumer gets a full DuckDB oracle (the coefficients interpolate
  * into the twin via [[MinHashSig.coeffsSqlValues]] and can never
  * drift).
  *
  * The modulus choice is LOAD-BEARING for minwise quality: a·h must
  * overshoot p by many multiples, or the map stays order-preserving
  * and every member's min collapses onto the minimum BASE hash (a
  * first cut with p = 2^61−1 over 32-bit bases wrapped at most once —
  * all 32 members agreed whenever two docs shared their smallest
  * shingle hash, and the Jaccard estimate degenerated toward the 0/1
  * indicator of that event). With 28-bit bases
  * ([[graft.functions.Dedup.shingleHashBase]]), a_j ∈ [1, p):
  * a·h < 2^59 spans ~2^28 multiples of p (proper permutation mixing)
  * and stays overflow-safe in signed 64-bit. ExpressionSpec pins
  * parity against the higher-order SQL composition of the same
  * formula; the TextDedupVectorSpec incremental bracket is the
  * quality gate that caught the degenerate family.
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

  import MinHashSig.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  /** k is required foldable: the signature width shapes the schema of
    * everything downstream (banding slices), so a per-row width would
    * be meaningless — and a compile-time constant lets codegen unroll
    * against a fixed-size array.
    */
  private lazy val k: Int = right.eval().asInstanceOf[Int]
  private lazy val as: Array[Long] = MinHashSig.coeffs(k).map(_._1)
  private lazy val bs: Array[Long] = MinHashSig.coeffs(k).map(_._2)

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
        val base = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = (as(j) * base + bs(j)) % P
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (seen) UnsafeArrayData.fromPrimitiveArray(out) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val uad = classOf[UnsafeArrayData].getName
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
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
         |  final long $base = $arr.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $h = ($asRef[$j] * $base + $bsRef[$j]) % ${P}L;
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
  /** Mersenne prime modulus of the affine family (2^31−1). See the
    * class doc: small enough that a·h wraps it ~2^28 times (the
    * permutation mixing minwise needs), large enough that member
    * collisions (~2^−31 per pair) cannot perturb a /32 Jaccard
    * estimate.
    */
  val P: Long = (1L << 31) - 1

  /** The (a_j, b_j) coefficient pairs of the family, PINNED as source
    * literals (round-11): they were originally drawn from
    * `new scala.util.Random(42)` — but that stream is a Scala-library
    * implementation detail, so a Scala upgrade could silently change
    * every persisted MinHash signature and band table while the
    * oracles stayed green (both engines would move together). The
    * literals below are that draw, frozen; the family definition is
    * now this table, not the seed. a ∈ [1, P), b ∈ [0, P): with
    * 28-bit base hashes the evaluation peaks below 2^59 + 2^31 —
    * comfortably inside signed 64-bit on both engines.
    */
  private val PinnedCoeffs: Array[(Long, Long)] = Array(
    (1562431131L, 1467211249L),
    (102948885L, 2023087526L),
    (595021506L, 355513696L),
    (196118094L, 969067502L),
    (791955277L, 1665906300L),
    (1482678033L, 1636576171L),
    (1681268744L, 900499577L),
    (326327864L, 2018204737L),
    (1610411244L, 830146030L),
    (1714307459L, 1397040070L),
    (1276356731L, 1524214254L),
    (538291086L, 784177727L),
    (369835213L, 1261490714L),
    (588781165L, 308426242L),
    (1226299824L, 1245593976L),
    (194700535L, 641275112L),
    (67470158L, 1842369017L),
    (427524441L, 23764756L),
    (896977161L, 1017983890L),
    (173204060L, 70884180L),
    (1032025898L, 626327552L),
    (471426602L, 205908971L),
    (1761992799L, 1367183776L),
    (812669500L, 1366709325L),
    (773641454L, 2007169397L),
    (1393273734L, 1494582461L),
    (1015090626L, 1007218200L),
    (1178812595L, 80257142L),
    (324337808L, 1790714110L),
    (1693536745L, 1634774480L),
    (602523748L, 420829923L),
    (740513296L, 2066924824L))

  /** The k-member prefix of [[PinnedCoeffs]] (the prefix property the
    * LSH planes share: `coeffs(k)` is a prefix of `coeffs(m ≥ k)`).
    */
  def coeffs(k: Int): Array[(Long, Long)] = {
    require(k <= PinnedCoeffs.length,
      s"minhash family is pinned at ${PinnedCoeffs.length} members; asked for $k")
    PinnedCoeffs.take(k)
  }

  /** The coefficients as DuckDB VALUES rows `(j, a, b)` — generated
    * from the SAME array the expression evaluates, so the SQL twins
    * can never drift.
    */
  def coeffsSqlValues(k: Int): String =
    coeffs(k).zipWithIndex
      .map { case ((a, b), j) => s"($j, ${a}, ${b})" }
      .mkString(",\n        ")

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
