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
  *   - FAMILY PARITY: member j equals `min((a_j·h + b_j) mod p)` over
  *     the hash array — the affine SQL composition the expression
  *     evaluates natively (the same formula the DuckDB twins
  *     interpolate). Banding built on either path must bucket
  *     identically.
  *   - interpreted eval == codegen eval (the spec calls the
  *     expression's `eval` directly and compares against the
  *     codegen'd DataFrame result).
  *   - null semantics: null/empty/all-null input → null signature.
  *   - PLAN: the signature stage is a pure map — zero exchanges
  *     before banding (the aggregate shape it replaced shuffled every
  *     (doc, shingle-hash) pair).
  */
class ExpressionSpec extends SparkSpec {

  test("minhash_sig matches the affine (a·h + b) mod p SQL composition member-for-member") {
    import spark.implicits._
    val k = 8
    val cs = MinHashSig.coeffs(k)
    val df = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon")),
      (2L, Seq("one two three")),
      (3L, Seq("alpha beta gamma"))).toDF("id", "sh")
      .select($"id", transform($"sh", s => Dedup.shingleHashBase(s)).as("hs"))
    val viaExpr = df
      .select($"id", call_function("minhash_sig", $"hs", lit(k)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaSql = df
      .select($"id", explode($"hs").as("h"))
      .groupBy($"id")
      .agg(array((0 until k).map(j =>
        min((lit(cs(j)._1) * col("h") + lit(cs(j)._2)) % lit(MinHashSig.P))): _*).as("sig"))
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
    // and both equal a direct reimplementation of the family (Scala
    // Long arithmetic wraps exactly like the generated Java, so the
    // parity holds even for out-of-contract 64-bit inputs)
    val cs = MinHashSig.coeffs(6)
    val direct = (0 until 6).map(j =>
      hashes.map(h => (cs(j)._1 * h + cs(j)._2) % MinHashSig.P).min)
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

  test("minhash signature agreement estimates true jaccard (k=32 error bound)") {
    import spark.implicits._
    // MinHash theory: E[agreement] = jaccard, sd = sqrt(j(1-j)/k) ≈
    // 0.09 at k=32. Assert every estimate within 4 sd and the mean
    // absolute error within 2 sd — loose enough to be deterministic
    // for this fixed hash family, tight enough to catch a broken
    // family (e.g. correlated members would push agreement to 0 or 1).
    val k = 32
    val docs = Tables.documents(spark, sf)
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k)
    val joined = sh.join(sigs, "doc_id")
    val pairs = joined.as("a").crossJoin(joined.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select(
        (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
          greatest(size(array_union($"a.sh", $"b.sh")), lit(1))).as("j"),
        (aggregate(zip_with($"a.sig", $"b.sig",
            (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v) / k).as("est"))
      .filter($"j" >= 0.2)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pairs.nonEmpty)
    val sd = math.sqrt(0.25 / k) // worst case j=0.5
    val errs = pairs.map { case (j, est) => math.abs(j - est) }
    assert(errs.max <= 4 * sd, s"worst estimate off by ${errs.max}")
    assert(errs.sum / errs.length <= 2 * sd, s"mean error ${errs.sum / errs.length}")
  }

  test("minhash_sig resolves from plain SQL text through the extension registry") {
    Tables.documents(spark, sf).createOrReplaceTempView("documents_v")
    val viaSql = spark.sql(
      "SELECT minhash_sig(array(xxhash64(text)), 4) AS sig FROM documents_v LIMIT 5")
    assert(viaSql.collect().forall(_.getSeq[Long](0).length === 4))
  }

  test("md5_prefix64 equals the conv(substring(md5)) chain it replaces, any width") {
    import spark.implicits._
    // corpus text plus edge shapes: empty string, multi-byte UTF-8
    // (hashing is over UTF-8 bytes in both forms), null passthrough
    val docs = Tables.documents(spark, sf).limit(200).select($"text".as("s"))
      .unionAll(Seq("", "héllo wörld 漢字", "a").toDF("s"))
    for (n <- Seq(1, 7, 8, 12, 15)) {
      val rows = docs.select(
          call_function("md5_prefix64", $"s", lit(n)).as("e"),
          conv(substring(md5($"s"), 1, n), 16, 10).cast("long").as("c"))
        .collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getLong(0) === r.getLong(1)), s"width $n")
    }
    val nulls = Seq((1L, None: Option[String])).toDF("id", "s")
      .select(call_function("md5_prefix64", $"s", lit(8)).as("e")).collect()
    assert(nulls.head.isNullAt(0))
    // interpreted eval == codegen'd result
    val interpreted = graft.plans.Md5Prefix(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")),
      org.apache.spark.sql.catalyst.expressions.Literal(8))
      .eval().asInstanceOf[Long]
    val viaDf = Seq("abc").toDF("s")
      .select(call_function("md5_prefix64", $"s", lit(8))).collect().head.getLong(0)
    assert(interpreted === viaDf)
  }

  test("md5_lanes64: lane i equals the conv chain at offset i*nHex+1; lane 0 equals md5_prefix64") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(200).select($"text".as("s"))
      .unionAll(Seq("", "héllo wörld 漢字", "a").toDF("s"))
    for ((nHex, nLanes) <- Seq((7, 4), (4, 8), (15, 2), (1, 32))) {
      val laneCols = (0 until nLanes).flatMap { i =>
        Seq(element_at(col("h"), i + 1).as(s"e$i"),
          conv(substring(md5($"s"), i * nHex + 1, nHex), 16, 10)
            .cast("long").as(s"c$i"))
      }
      val rows = docs
        .withColumn("h", call_function("md5_lanes64", $"s", lit(nHex), lit(nLanes)))
        .select(laneCols: _*)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        (0 until nLanes).foreach { i =>
          assert(r.getLong(2 * i) === r.getLong(2 * i + 1),
            s"lane $i at shape $nHex x $nLanes")
        }
      }
    }
    // lane 0 is the md5_prefix64 identity (the scheme replica 0 of the
    // bootstrap relies on), and null passes through as a null array.
    val id = docs.select(
        element_at(call_function("md5_lanes64", $"s", lit(7), lit(4)), 1).as("l0"),
        call_function("md5_prefix64", $"s", lit(7)).as("p")).collect()
    assert(id.forall(r => r.getLong(0) === r.getLong(1)))
    val nulls = Seq((1L, None: Option[String])).toDF("id", "s")
      .select(call_function("md5_lanes64", $"s", lit(7), lit(4)).as("h")).collect()
    assert(nulls.head.isNullAt(0))
    // interpreted eval == codegen'd result
    val interpreted = graft.plans.Md5Lanes(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")),
      org.apache.spark.sql.catalyst.expressions.Literal(7),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
      .eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val viaDf = Seq("abc").toDF("s")
      .select(call_function("md5_lanes64", $"s", lit(7), lit(4)))
      .collect().head.getSeq[Long](0)
    assert(interpreted.toSeq === viaDf.toSeq)
  }

  test("simhash_sig is bit-identical to the higher-order-function formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(100)
    val rows = docs.select(
        Dedup.simhash48($"text").as("expr_sig"),
        Dedup.simhash48Hof($"text").as("hof_sig"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) === r.getLong(1)))
    // empty input packs to 0L (all counters at 0), null stays null
    val edge = Seq((1L, Some("")), (2L, None: Option[String]))
      .toDF("id", "text")
      .select($"id", Dedup.simhash48($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(edge(1L) === 0L)
    assert(edge(2L) === null)
  }

  test("rolling_hash is exactly the per-character HOF fold on ASCII-canonicalized text") {
    import spark.implicits._
    def hofRolling(s: org.apache.spark.sql.Column) =
      aggregate(
        transform(split(s, ""), ch => ascii(ch).cast("long")),
        lit(0L),
        (h, c) => (h * 31 + c) % 1000000007L)
    val canon = regexp_replace($"text", "[^\\x20-\\x7E]", "")
    val rows = Tables.documents(spark, sf).limit(200)
      .select(canon.as("s"))
      .select(
        call_function("rolling_hash", $"s").as("expr_h"),
        hofRolling($"s").as("hof_h"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) === r.getLong(1)))
    // empty string folds to 0, null stays null, known value checks out
    val edge = Seq((1L, Some("")), (2L, None: Option[String]), (3L, Some("abc")))
      .toDF("id", "s")
      .select($"id", call_function("rolling_hash", $"s").as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(edge(1L) === 0L)
    assert(edge(2L) === null)
    assert(edge(3L) === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("vec_dot is bit-identical to the HOF fold; null/mismatch semantics match") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).limit(200)
      .select(graft.functions.Vectors.asDouble($"embedding").as("v"))
    val rows = emb.select(
        graft.functions.Vectors.dot($"v", $"v").as("expr_dot"),
        graft.functions.Vectors.dotHof($"v", $"v").as("hof_dot"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(0) === r.getDouble(1)),
      "accumulation order must be bit-identical to the left fold")
    val edge = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (2L, Some(Seq(1.0)), Some(Seq(1.0, 2.0))),        // length mismatch → null
      (3L, None: Option[Seq[Double]], Some(Seq(1.0))))  // null array → null
      .toDF("id", "a", "b")
      .select($"id", graft.functions.Vectors.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(edge(1L) === 11.0)
    assert(edge(2L) === null)
    assert(edge(3L) === null)
  }

  test("vec_sqdist is bit-identical to the HOF fold; null/mismatch semantics match") {
    import spark.implicits._
    // Real embeddings against a shifted copy — nonzero distances with
    // the full range of element magnitudes the IVF assignment sees.
    val emb = Tables.embeddings(spark, sf).limit(200)
      .select(graft.functions.Vectors.asDouble($"embedding").as("v"))
      .withColumn("w", transform($"v", x => x * 0.5 + 0.1))
    val rows = emb.select(
        call_function("vec_sqdist", $"v", $"w").as("expr_d"),
        graft.functions.Vectors.sqDistHof($"v", $"w").as("hof_d"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(0) === r.getDouble(1)),
      "accumulation order must be bit-identical to the left fold")
    val edge = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 0.0))),   // 4 + 4 = 8.0
      (2L, Some(Seq(1.0)), Some(Seq(1.0, 2.0))),        // length mismatch → null
      (3L, None: Option[Seq[Double]], Some(Seq(1.0))))  // null array → null
      .toDF("id", "a", "b")
      .select($"id", call_function("vec_sqdist", $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(edge(1L) === 8.0)
    assert(edge(2L) === null)
    assert(edge(3L) === null)
  }

  test("vec_eq_count matches the HOF agreement fold on equal-length signatures") {
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(
      Tables.documents(spark, sf), "doc_id", "text", numHashes = 32)
      .select($"doc_id", $"sig")
    val pairs = sigs.crossJoin(
        sigs.select($"doc_id".as("id_b"), $"sig".as("sig_b")))
      .filter($"doc_id" < $"id_b").limit(500)
    val rows = pairs.select(
        call_function("vec_eq_count", $"sig", $"sig_b").as("cnt"),
        graft.functions.Dedup.eqFracHof($"sig", $"sig_b").as("hof_sum"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0).toDouble === r.getDouble(1)),
      "agreement count must equal the HOF 1.0-per-match sum")
    val edge = Seq(
      (1L, Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 9L, 3L))),  // 2 agreements
      (2L, Some(Seq(1L)), Some(Seq(1L, 2L))),              // mismatch → null
      (3L, None: Option[Seq[Long]], Some(Seq(1L))))        // null array → null
      .toDF("id", "a", "b")
      .select($"id", call_function("vec_eq_count", $"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(edge(1L) === 2L)
    assert(edge(2L) === null)
    assert(edge(3L) === null)
  }

  test("bloom pair: zero false negatives on inserted keys, bounded false positives off them") {
    import spark.implicits._
    // The q_bloom_join contract rests on two properties of the
    // registered pair: a key that went into graft_bloom_agg may NEVER
    // fail graft_might_contain (a false negative would silently drop
    // joinable fact rows — a correctness bug, not a perf one), and
    // off-key probes must mostly miss (a saturated bloom degrades the
    // operator to a no-op scan-tax). 8 bits/key targets ~2% FPP; the
    // assertion allows 5% for slack.
    val keys = (0L until 1000L).toDF("k")
    val bloom = keys
      .agg(org.apache.spark.sql.functions.call_function(
        graft.plans.BloomFunctions.AggName,
        xxhash64($"k"), lit(1000L), lit(8000L))).scalar()
    def hits(ids: Range): Long =
      ids.map(_.toLong).toDF("p")
        .filter(org.apache.spark.sql.functions.call_function(
          graft.plans.BloomFunctions.MightContainName, bloom, xxhash64($"p")))
        .count()
    assert(hits(0 until 1000) == 1000L, "false negative: an inserted key failed the probe")
    val fp = hits(100000 until 110000)
    assert(fp < 500, s"false-positive rate ${fp / 100.0}% exceeds the 5% bound")
  }

  test("signature stage plans as a pure map: no exchange before banding") {
    val sigs = Dedup.minhashSignatures(
      Tables.documents(spark, sf), "doc_id", "text", 16)
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("ivf_argmin is bit-identical to the array/array_min/array_position formulation, fixed AND scaled-size families") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", graft.functions.Vectors.asDouble($"embedding").as("v"))
    // The floor family (k=8, every graded SF) and a scaled-size
    // family (k=160 — sf2.0's) from the same seeded prefix stream.
    for (k <- Seq(8, 160)) {
      val cells = graft.functions.Vectors.ivfCentroids(k, 64, 11L)
      val rows = graft.functions.Vectors.ivfAssigned(emb, cells)
          .select($"vec_id", $"cell".as("c_expr"))
        .join(graft.functions.Vectors.ivfAssignedHof(emb, cells)
          .select($"vec_id", $"cell".as("c_hof")), "vec_id")
        .collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getInt(1) === r.getInt(2)),
        s"argmin assignment must match the reference formulation at k=$k")
    }
    // Exact distance tie between cells 0 and 1 → FIRST index wins
    // (the array_position / ORDER BY dist, cell contract).
    val tiePool = array(
      array(lit(0.5), lit(0.5)), array(lit(0.5), lit(0.5)),
      array(lit(9.0), lit(9.0)))
    val edge = Seq(
      (1L, Some(Seq(0.5, 0.5))),        // tie → cell 0
      (2L, None: Option[Seq[Double]]),  // null vector → null
      (3L, Some(Seq(0.5, 0.5, 0.5))))   // dim mismatch vs pool → null
      .toDF("id", "v")
      .select($"id", call_function("ivf_argmin", $"v", tiePool).as("cell"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(edge(1L) === 0)
    assert(edge(2L) === null)
    assert(edge(3L) === null)
    // Interpreted eval (no-codegen path) agrees with codegen.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val cells = graft.functions.Vectors.ivfCentroids(8, 64, 11L)
      val rows = graft.functions.Vectors.ivfAssigned(emb, cells)
          .select($"vec_id", $"cell".as("c_interp"))
        .join(graft.functions.Vectors.ivfAssignedHof(emb, cells)
          .select($"vec_id", $"cell".as("c_hof")), "vec_id")
        .collect()
      assert(rows.nonEmpty && rows.forall(r => r.getInt(1) === r.getInt(2)))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // A non-foldable centroid pool is rejected at analysis.
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      emb.select(call_function("ivf_argmin", $"v", array(array($"vec_id".cast("double"))))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }
}
