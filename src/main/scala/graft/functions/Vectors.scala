package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Embedding similarity for LLM-data pipelines over
  * `embeddings` (64-dim float vectors).
  *
  * Dot product / norm / cosine / squared distance are native codegen'd
  * expressions (`vec_dot`, `vec_sqdist` — higher-order lambdas
  * evaluate interpreted, so the hot per-element loops are custom
  * Catalyst expressions instead), with sequential left-fold
  * accumulation in doubles, so the result is bit-identical to any
  * engine that folds the list in element order.
  *
  * Search paths:
  *   - brute-force cosine top-k: broadcast the query vector, score
  *     every row, `TakeOrderedAndProject` keeps per-partition top-k —
  *     one pass, no shuffle of the big side; the correct baseline and
  *     the oracle-checkable one.
  *   - LSH-bucketed (random-hyperplane sign bits): each vector hashes
  *     to a bucket; candidates come only from the query's bucket. At
  *     100 TB the bucket column becomes the partition key so a probe
  *     touches one partition instead of the full corpus.
  */
object Vectors extends QueryModule {

  /** Element-wise double cast (embeddings arrive as float32). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two equal-length double arrays — the codegen'd
    * `vec_dot` expression ([[graft.plans.VecDot]]), bit-identical to
    * the sequential-fold HOF chain it replaced (ExpressionSpec pins
    * parity; DuckDB oracles keep matching because the accumulation
    * order is unchanged).
    */
  def dot(a: Column, b: Column): Column =
    call_function(graft.plans.VecDot.FunctionName, a, b)

  /** The pre-expression higher-order formulation — retained as the
    * reference implementation for the ExpressionSpec parity test.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplanes for sign-bit LSH —
    * 3-dp rounded gaussians for the same reason [[ivfCentroids]]
    * rounds: the decimal text embeds verbatim in the DuckDB twin and
    * parses back to the IDENTICAL double, so both engines compute the
    * same dot signs and therefore the same buckets. The random stream
    * fills plane-by-plane, so `hyperplanes(n, …)` is always a PREFIX
    * of `hyperplanes(m ≥ n, …)` with the same seed — which lets the
    * SQL twin embed the MAX family once and select the corpus-sized
    * prefix with a `pid < np` filter.
    */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)((rnd.nextGaussian() * 1000).round / 1000.0)
  }

  /** Plane count as a function of corpus size: enough sign bits that
    * expected bucket occupancy stays near `targetPerBucket`
    * (buckets ≈ n / target, planes = ceil(log2(buckets))), clamped to
    * [4, 24]. Within-bucket pair work is then O(n · target) instead of
    * O(n² / 2^planes) for a fixed plane count — the difference between
    * linear and quadratic as the corpus grows to 100 TB.
    */
  private[graft] def planeCount(corpusSize: Long, targetPerBucket: Long = 64L): Int = {
    val buckets = math.max(1.0, corpusSize.toDouble / targetPerBucket)
    math.min(24, math.max(4, math.ceil(math.log(buckets) / math.log(2.0)).toInt))
  }

  /** Hyperplane family sized for `corpusSize` vectors. */
  private[graft] def planesFor(corpusSize: Long, dim: Int, seed: Long): Array[Array[Double]] =
    hyperplanes(planeCount(corpusSize), dim, seed)

  /** Sign-bit LSH bucket id: one bit per hyperplane, MSB-first fold. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1L)).otherwise(lit(0L))
    }
    bits.reduce((acc, b) => acc * 2 + b)
  }

  /** Fixed deterministic IVF coarse-quantizer centroids (seeded, 3-dp
    * values; the cross-engine invariant is that Scala's shortest-repr
    * Double printing parses back to the IDENTICAL double in DuckDB —
    * 0.123 is not an exact binary double, but both engines resolve the
    * same text to the same nearest double, so distances and argmin
    * tie-breaks agree bit-for-bit. Do NOT reformat the literals, e.g.
    * with %.2f — that changes the parsed doubles and breaks the
    * q_ivf_assign / q_ann_ivf oracles). A
    * production IVF trains these with KMeans; fixing them keeps the
    * whole IVF path DETERMINISTIC and therefore DuckDB-oracle
    * checkable end-to-end — candidate set included. The LSH family
    * ([[hyperplanes]]) now uses the same shared-literal trick, so
    * q_ann_lsh is candidate-set-verified too.
    */
  private[graft] def ivfCentroids(k: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    // σ≈0.12 matches the testdata embedding element distribution
    // (elements span ≈±0.5) — centroids outside the data range would
    // degenerate every vector into one cell.
    Array.fill(k, dim)((rnd.nextGaussian() * 120).round / 1000.0)
  }

  private val IvfK = 8
  private val IvfSeed = 11L

  /** Corpus-scaled IVF cell count for the WITHIN-CELL SELF-JOIN
    * consumers (q_semantic_dedup, q_label_prop's kNN edge build):
    * cells ≈ n / [[IvfTargetPerCell]] so expected occupancy stays
    * flat and pair work is O(n · target) — the [[planeCount]] scaling
    * argument applied to the IVF path. A FIXED cell count is
    * quadratic: measured r19 at sf1.0 (20k vectors / 8 cells = 2 500
    * per cell), q_label_prop read 29 s vs 4.3 at sf0.1 — 6.9× for
    * 10× data. Clamped to [IvfK, [[IvfMaxCells]]]: the floor keeps
    * all three GRADED SFs (≤2 000 vectors) at exactly the historical
    * k = 8 (bit-identical results, oracles untouched); the ceiling is
    * the size of the literal centroid pool the twins embed — an
    * oracle-determinism artifact, not an algorithmic limit (a
    * production run trains k ∝ n/target centroids with KMeans). The
    * probe-bounded IVF consumers (q_ann_ivf*, q_ann_recall,
    * q_ivf_assign, q_cluster_balance, q_knn_join) stay on the fixed
    * k = 8 family: their per-query work is occupancy-LINEAR and the
    * cell count there is a recall knob, not a blowup.
    */
  private[graft] val IvfTargetPerCell = 250L
  private[graft] val IvfMaxCells = 256

  /** Within-cell comparison-POOL cap for the self-join consumers
    * (q_semantic_dedup here, q_label_prop's kNN edge build in
    * [[graft.functions.Graph]]) — the third instance of the
    * occupancy-cap contract (JaccardBucketCap, SimTuningBucketCap:
    * Dedup.scala). [[ivfCellCount]] holds EXPECTED occupancy at
    * [[IvfTargetPerCell]], but a dense embedding region that
    * data-independent random centroids cannot subdivide keeps one
    * cell quadratic (measured r19 at sf2.0: max occupancy stalls
    * ~2 300 from k=128 to k=160, q_label_prop 39.2 s — 3.2× for 2×
    * data). The cap bounds the join's y-side to the first
    * CellPoolCap members of each cell under a DETERMINISTIC rank —
    * the survivor-priority order (simcent ASC, vec_id ASC) for
    * semantic dedup, the md5 order (uniform, refresh-stable — the
    * q_cluster_balance key) for the kNN pool — so pair work is
    * O(n · CellPoolCap) by construction even in an unsplittable hot
    * cell; deliberately the SAME number as the target occupancy, so
    * a capped dense cell costs what a well-split cell costs. The
    * documented recall trade: a vector whose only higher-priority
    * near-dup sits beyond the pool is KEPT (dedup), and kNN edges
    * form against a Cap-sized uniform sample of the cell (LPA);
    * both twins cap with the identical rank, so the trade is
    * oracle-PROVEN, not just argued (unlike the Dedup caps this one
    * is ACTIVE at the graded SFs — sf0.1's floor-k cells reach
    * occupancy 814 — hence the three-SF re-proof in r20's session).
    * CellPoolSpec pins inertness below the cap and the exact capped
    * rule above it.
    */
  private[graft] val CellPoolCap: Int = IvfTargetPerCell.toInt

  /** Hyperplane REFINEMENT of dense cells — the structural half of
    * the dense-core answer (the [[CellPoolCap]] scaladoc's story):
    * a region that keeps ONE nearest centroid however many centroids
    * the pool adds (the r19 finding — max occupancy stalls ~2 300 as
    * k grows 80→160) is still SPLIT by a hyperplane through it, so
    * any cell above target occupancy is subdivided by the sign bits
    * of seeded shared-literal planes ([[hyperplanes]] — the
    * q_ann_lsh machinery): bits = min(ceil(log2(occ/target)),
    * [[RefineMaxBits]]), bucket = cell·2^maxBits + the code's first
    * `bits` bits (an MSB shift, so bucket is a PREFIX refinement —
    * bits=0 keeps the cell whole). Deterministic and oracle-shared:
    * occupancy is an exact integer count, the bit thresholds are
    * exact integer compares, and the twins recompute the same code
    * from the same plane literals. The one core hyperplanes cannot
    * split — near-DUPLICATE vectors, which sit on the same side of
    * every plane — is exactly the core where a uniform candidate
    * sample is lossless, so the md5 pool cap downstream stays the
    * hard O(n · cap) bound while the refinement keeps the candidates
    * GEOMETRIC neighbors (measured r20: the md5-only cap read 8/50
    * size-multiset overlap vs capless at sf1.0; with refinement the
    * candidate pool is same-cell AND same-halfspace — SCALING.md r20
    * block for the fidelity and pair economics).
    */
  private[graft] val RefineMaxBits = 4
  private[graft] val RefineSeed = 23L

  /** `(…, bucket)` — the refined-bucket column over an assigned
    * frame (requires `cell` and `v`). One |cells|-row occupancy
    * aggregate broadcasts back; the 4-bit sign code is one
    * [[lshBucket]] projection; the variable-width MSB shift is an
    * exact power-of-two division (both engines integer-divide).
    */
  private[graft] def refineBuckets(a: DataFrame): DataFrame = {
    val planes = hyperplanes(RefineMaxBits, 64, RefineSeed)
    val occ = a.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
      .withColumn("rbits",
        when(col("occ") <= IvfTargetPerCell, 0)
          .when(col("occ") <= IvfTargetPerCell * 2, 1)
          .when(col("occ") <= IvfTargetPerCell * 4, 2)
          .when(col("occ") <= IvfTargetPerCell * 8, 3)
          .otherwise(RefineMaxBits))
    val divisors = array((0 to RefineMaxBits)
      .map(b => lit(1L << (RefineMaxBits - b))): _*)
    a.join(broadcast(occ.select(col("cell"), col("rbits"))), Seq("cell"))
      .withColumn("bucket",
        col("cell").cast("long") * (1L << RefineMaxBits) +
          floor(lshBucket(col("v"), planes) /
            element_at(divisors, col("rbits") + 1)).cast("long"))
      .drop("rbits")
  }

  /** The refined-bucket CTE chain — the exact SQL mirror of
    * [[refineBuckets]] over the scaled-assignment CTE's `a` (shared
    * plane literals via [[planesSql]], same MSB-first fold as the
    * q_ann_lsh twin, same integer thresholds/shift). Emits `ab` =
    * (vec_id, vv, cell, bucket).
    */
  private[graft] lazy val refineBucketsCte: String =
    s"""rp(pid, pv) AS (VALUES
       |        ${planesSql(RefineSeed)}),
       |rocc AS (SELECT cell, COUNT(*) AS occ FROM a GROUP BY cell),
       |rb AS (SELECT cell, CASE
       |         WHEN occ <= $IvfTargetPerCell THEN 0
       |         WHEN occ <= ${IvfTargetPerCell * 2} THEN 1
       |         WHEN occ <= ${IvfTargetPerCell * 4} THEN 2
       |         WHEN occ <= ${IvfTargetPerCell * 8} THEN 3
       |         ELSE $RefineMaxBits END AS rbits
       |       FROM rocc),
       |rcode AS (SELECT a.vec_id, CAST(SUM(CASE WHEN
       |          list_sum(list_transform(list_zip(a.vv, rp.pv),
       |            p -> p[1] * p[2])) >= 0
       |          THEN (CAST(1 AS BIGINT) << (${RefineMaxBits - 1} - rp.pid))
       |          ELSE 0 END) AS BIGINT) AS code
       |        FROM a, rp WHERE rp.pid < $RefineMaxBits
       |        GROUP BY a.vec_id),
       |ab AS (SELECT a.vec_id, a.vv, a.cell,
       |         a.cell * ${1L << RefineMaxBits} + (rcode.code // (CASE rb.rbits
       |           WHEN 0 THEN ${1L << RefineMaxBits}
       |           WHEN 1 THEN ${1L << (RefineMaxBits - 1)}
       |           WHEN 2 THEN ${1L << (RefineMaxBits - 2)}
       |           WHEN 3 THEN ${1L << (RefineMaxBits - 3)}
       |           ELSE 1 END)) AS bucket
       |       FROM a JOIN rcode USING (vec_id) JOIN rb USING (cell))""".stripMargin

  private[graft] def ivfCellCount(n: Long): Int =
    math.min(IvfMaxCells,
      math.max(IvfK, math.ceil(n.toDouble / IvfTargetPerCell).toInt))

  /** Centroid family sized for `n` vectors — a PREFIX of the seeded
    * centroid stream ([[ivfCentroids]] draws row-major, so family k's
    * first j rows equal family j; VectorsSpec pins it), hence the
    * graded-SF assignments are bit-identical to the fixed-k history.
    */
  private[graft] def ivfCellsFor(n: Long): Array[Array[Double]] =
    ivfCentroids(ivfCellCount(n), 64, IvfSeed)

  /** Cosine threshold for q_semantic_dedup. The synthetic embeddings
    * are near-orthogonal (pairwise cosine spans ≈±0.5), so the
    * SemDeDup-typical 0.95 would select nothing; 0.35 exercises both
    * branches (drops and survivors) at every sf. The THRESHOLD is
    * data-tuning; the algorithm is the contract.
    */
  private[graft] val SemDedupTau = 0.35

  /** Per-cluster cap for q_cluster_balance. Mean occupancy at sf0.01
    * is ≈62 (500 vectors / 8 cells), so 40 trims the crowded cells
    * and passes the sparse ones through intact — both branches live.
    */
  private[graft] val ClusterCap = 40
  private[graft] lazy val ivfCells: Array[Array[Double]] = ivfCentroids(IvfK, 64, IvfSeed)

  /** Squared L2 distance to a constant centroid — the codegen'd
    * `vec_sqdist` expression ([[graft.plans.VecSqDist]]), bit-identical
    * to the sequential-fold HOF chain it replaced (the IVF assignment
    * evaluated that chain once per centroid per row, interpreted;
    * ExpressionSpec pins the parity so argmin tie-breaks cannot move).
    */
  private def sqDist(v: Column, centroid: Array[Double]): Column =
    call_function(graft.plans.VecSqDist.FunctionName,
      v, array(centroid.toIndexedSeq.map(lit): _*))

  /** The pre-expression higher-order formulation — retained as the
    * reference implementation for the ExpressionSpec parity test.
    */
  private[graft] def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** `(…, cell)` — each vector assigned to its nearest centroid (the
    * IVF coarse quantization) via the codegen'd `ivf_argmin`
    * expression ([[graft.plans.IvfArgmin]]): one fused k×dim loop per
    * row with the centroid pool held as ONE reference object.
    * First-occurrence argmin on exact distance ties, bit-identical to
    * the `array(k × vec_sqdist)` + `array_min` + `array_position`
    * formulation it replaced (retained below as [[ivfAssignedHof]]
    * for the ExpressionSpec parity pin) and to the twins' `ORDER BY
    * dist, cell`. The replacement is a SCALE fix, not a cleanup: with
    * the corpus-scaled family k ∝ n, the array formulation inlined
    * k·dim literals into the plan and built a k-element array per row
    * — at sf2.0 (k=160, 10 240 plan literals) the assignment stage
    * alone measured 31 s of q_label_prop's 38; ivf_argmin holds the
    * same scan at the n·k·dim arithmetic floor (r20, SCALING.md).
    */
  private[graft] def ivfAssigned(emb: DataFrame,
      cells: Array[Array[Double]] = ivfCells): DataFrame =
    emb.withColumn("cell",
      call_function(graft.plans.IvfArgmin.FunctionName, col("v"),
        array(cells.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)))

  /** The pre-expression formulation — retained as the reference
    * implementation for the ExpressionSpec parity test. `dists` is
    * projected to an attribute before argmin references it twice
    * (per-element re-evaluation rule, see Dedup.shinglesFromTokens).
    * First-occurrence argmin on ties, same as SQL list_position.
    */
  private[graft] def ivfAssignedHof(emb: DataFrame,
      cells: Array[Array[Double]] = ivfCells): DataFrame =
    emb
      .withColumn("dists", array(cells.toIndexedSeq.map(c => sqDist(col("v"), c)): _*))
      .withColumn("cell",
        (array_position(col("dists"), array_min(col("dists"))) - 1).cast("int"))
      .drop("dists")

  /** IVF-probed ANN: score only the query's `nprobe` nearest cells —
    * at scale `cell` is the partition key, so a probe reads `nprobe`
    * partitions instead of the full corpus. Multi-probe is the
    * standard IVF recall knob (a vector near a cell boundary has its
    * true neighbors in the adjacent cell); recall vs brute force
    * grows monotonically in `nprobe` because the candidate set only
    * widens (DedupScaleSpec pins both properties). The probe list is
    * deterministic — cells ranked by squared distance, ties by cell
    * id, exactly as the SQL twin's `ORDER BY dist, cell` — so even
    * the candidate set stays oracle-verified.
    *
    * `nprobe = 1` keeps the original one-cell equality join; wider
    * probes join on `array_contains` over the broadcast one-row probe
    * list, which plans the same one-row BroadcastNestedLoop the other
    * scalar funnels use.
    */
  def annIvf(spark: SparkSession, dir: String, queryId: Long, k: Int,
             nprobe: Int = 1): DataFrame = {
    val assigned = ivfAssigned(
      Tables.embeddings(spark, dir).select(col("vec_id"), asDouble(col("embedding")).as("v")))
    if (nprobe <= 1) {
      val query = broadcast(assigned.filter(col("vec_id") === queryId)
        .select(col("v").as("qv"), col("cell").as("qcell")))
      assigned.join(query, col("cell") === col("qcell"))
        .select(col("vec_id"), col("cell"), round(cosine(col("v"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(k)
    } else {
      // (dist, cell) structs sort field-by-field: ascending distance,
      // then cell id — the deterministic probe order.
      val ranked = array_sort(array(ivfCells.zipWithIndex.map { case (c, i) =>
        struct(sqDist(col("qv"), c).as("d"), lit(i).as("cell"))
      }.toIndexedSeq: _*))
      val query = broadcast(
        Tables.embeddings(spark, dir).filter(col("vec_id") === queryId)
          .select(asDouble(col("embedding")).as("qv"))
          .withColumn("qcells",
            transform(slice(ranked, 1, nprobe), s => s.getField("cell"))))
      assigned.join(query, array_contains(col("qcells"), col("cell")))
        .select(col("vec_id"), col("cell"), round(cosine(col("v"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(k)
    }
  }

  /** Brute-force cosine top-k against the embedding of `queryId`. */
  def cosineTopK(spark: SparkSession, dir: String, queryId: Long, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val query = emb.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    emb.crossJoin(broadcast(query))
      .select(col("vec_id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: score only vectors sharing the query's bucket.
    * The plane count scales with corpus size (planeCount) so bucket
    * occupancy — and therefore probe cost — stays bounded as the
    * corpus grows; at real scale `bucket` becomes the partition key so
    * a probe touches one partition instead of the full corpus.
    */
  def annLsh(spark: SparkSession, dir: String, queryId: Long, k: Int): DataFrame = {
    val corpusSize = Tables.rowCount(spark, dir, "embeddings")
    val planes = planesFor(corpusSize, dim = 64, seed = 42L)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val query = broadcast(
      emb.filter(col("vec_id") === queryId)
        .select(col("v").as("qv"), col("bucket").as("qbucket")))
    emb.join(query, col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("bucket"),
        round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** The q_semantic_dedup builder (SemDeDup — see the queries-map
    * entry's scaladoc for the algorithm/determinism contract).
    * `poolCap` bounds the drop decision's comparison side: within
    * each cell, only the first `poolCap` members under the
    * survivor-priority order (simcent ASC, vec_id ASC — the SAME
    * order the drop condition already uses) can act as droppers, so
    * pair work is O(n · poolCap) however dense a cell gets (the
    * [[CellPoolCap]] contract; the parameter exists for
    * CellPoolSpec's activation tests). The row_number+filter pair
    * plans as Partial+Final WindowGroupLimit — each map task forwards
    * at most poolCap rows per cell before the shuffle.
    */
  private[graft] def semanticDedup(s: SparkSession, dir: String,
      poolCap: Int = CellPoolCap): DataFrame = {
    import s.implicits._
    // Corpus-SCALED cell family (see ivfCellCount): the drop
    // decision is a within-cell SELF-join, so a fixed cell count is
    // quadratic in corpus size; at the graded SFs the scaled family
    // IS the historical k=8 (clamp floor), so results are
    // bit-identical there.
    val cells = ivfCellsFor(Tables.rowCount(s, dir, "embeddings"))
    val cents2d = array(cells.toIndexedSeq.map(c =>
      array(c.toIndexedSeq.map(lit): _*)): _*)
    graft.Pins.scoped { pins =>
      val a = pins(ivfAssigned(Tables.embeddings(s, dir)
          .select($"vec_id", asDouble($"embedding").as("v")), cells)
        .withColumn("simcent",
          round(cosine($"v", element_at(cents2d, $"cell" + 1)), 4)))
      val x = a.select($"vec_id", $"cell", $"v", $"simcent")
      val wPool = org.apache.spark.sql.expressions.Window
        .partitionBy($"cell").orderBy($"simcent".asc, $"vec_id".asc)
      val y = a.withColumn("prn", row_number().over(wPool))
        .filter($"prn" <= poolCap)
        .select($"vec_id".as("y_id"), $"cell".as("y_cell"),
          $"v".as("y_v"), $"simcent".as("y_sc"))
      val dropped = x.join(y,
          $"cell" === $"y_cell" && $"vec_id" =!= $"y_id" &&
            ($"y_sc" < $"simcent" ||
              ($"y_sc" === $"simcent" && $"y_id" < $"vec_id")))
        .filter(round(cosine($"v", $"y_v"), 4) >= SemDedupTau)
        .select($"vec_id").distinct()
        .withColumn("is_dropped", lit(1))
      a.join(dropped, Seq("vec_id"), "left")
        .select($"vec_id", $"cell", $"simcent",
          when($"is_dropped".isNull, 1).otherwise(0).as("keep"))
        .orderBy($"vec_id")
    }
  }

  override def queries: Map[String, Query] = Map(
    // Array feature assembly — SQL-friendly twin of VectorAssembler
    // (`Code/flight_analysis.py:128-132`). The assembled vector is
    // surfaced as per-element scalars: the driver's oracle compare
    // sorts result columns in pandas, which cannot hash raw arrays
    // (CORRECTNESS_r01's one red row) — element extraction keeps the
    // output driver-comparable while the array construction stays in
    // the plan.
    "q_vec_assemble" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).select(
        $"l_orderkey", $"l_linenumber",
        array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax").as("features"))
        .select(
          $"l_orderkey", $"l_linenumber",
          element_at($"features", 1).as("f0"),
          element_at($"features", 2).as("f1"),
          element_at($"features", 3).as("f2"),
          element_at($"features", 4).as("f3"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Dot product via higher-order functions (squared L2 norm here).
    "q_array_dot" -> ((s, dir) => {
      import s.implicits._
      val v = asDouble($"embedding")
      Tables.embeddings(s, dir)
        .select($"vec_id", round(dot(v, v), 4).as("dot_self"))
        .orderBy($"vec_id")
    }),

    // Brute-force cosine top-k (the ANN correctness baseline).
    "q_cosine_topk" -> ((s, dir) => cosineTopK(s, dir, queryId = 0L, k = 10)),

    // LSH-bucketed ANN — scale path, same output shape. Oracle-checked
    // since the planes became shared 3-dp literals (see hyperplanes):
    // the SQL twin recomputes the buckets from the same plane family
    // and the same corpus-sized plane count, so even the candidate
    // set is cross-engine verified, exactly like the IVF family.
    "q_ann_lsh" -> ((s, dir) => annLsh(s, dir, queryId = 0L, k = 10)),

    // IVF cell histogram: coarse-quantizer assignment of the whole
    // corpus (cells become partition keys at scale). Oracle-checked —
    // centroids are fixed literals shared with the SQL twin.
    "q_ivf_assign" -> ((s, dir) => {
      import s.implicits._
      ivfAssigned(Tables.embeddings(s, dir)
        .select($"vec_id", asDouble($"embedding").as("v")))
        .groupBy($"cell")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cell")
    }),

    // IVF-probed ANN — same output shape as the LSH probe but fully
    // deterministic, so even the candidate set is oracle-verified.
    "q_ann_ivf" -> ((s, dir) => annIvf(s, dir, queryId = 0L, k = 10)),

    // [EXT] multi-probe IVF ANN — the recall knob: probe the TWO
    // nearest cells (boundary vectors find neighbors in the adjacent
    // cell). Candidate set widens monotonically with nprobe and stays
    // deterministic, so this one is oracle-verified end-to-end too.
    "q_ann_ivf_probe2" -> ((s, dir) => annIvf(s, dir, queryId = 0L, k = 10, nprobe = 2)),

    // [EXT] int8 symmetric quantization readiness check: per vector,
    // the scale (amax) and the reconstruction error of quantizing to
    // 127 levels — the decision metric for shipping int8 embeddings
    // (4× smaller, 4× faster ANN scans). Pure per-row arithmetic from
    // higher-order functions — no shuffle, scales with input splits.
    // `v` and `step` are projected to attributes before any lambda
    // references them (per-element re-evaluation, see
    // Dedup.shinglesFromTokens); the error is reported ×1e6 at 4
    // decimals so cross-engine last-ulp fold noise rounds away while
    // ~4 significant digits survive.
    "q_embed_quantize" -> ((s, dir) => {
      import s.implicits._
      Tables.embeddings(s, dir)
        .select($"vec_id", asDouble($"embedding").as("v"))
        .select($"vec_id", $"v",
          greatest(aggregate($"v", lit(0.0), (a, x) => greatest(a, abs(x))), lit(1e-12)).as("amax"))
        .select($"vec_id", $"v", $"amax", ($"amax" / 127.0).as("step"))
        .select($"vec_id",
          round($"amax", 4).as("amax"),
          round(aggregate(
            transform($"v", x => {
              val err = x - round(x / $"step") * $"step"
              err * err
            }),
            lit(0.0), (a, e) => a + e) / size($"v") * 1e6, 4).as("mse_e6"))
        .orderBy($"vec_id")
    }),

    // [EXT] k-NN JOIN — top-k neighbors for EVERY query in a query
    // set, not just one probe: the batch shape embedding pipelines
    // actually run (dedup candidate mining, eval-set retrieval). The
    // query set broadcasts (it is small by construction); each corpus
    // partition scores its rows against all queries locally, and the
    // per-query top-k runs as a rank-over-window that Spark rewrites to
    // Partial+Final WindowGroupLimit — each mapper forwards at most k
    // rows per query, so the one shuffle moves O(queries × k ×
    // partitions) rows regardless of corpus size (PlanSpec pins the
    // rewrite). Scoring work is the irreducible |corpus| × |queries|.
    "q_knn_join" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", asDouble($"embedding").as("v"))
      val queries = broadcast(emb.filter($"vec_id" < 5)
        .select($"vec_id".as("q_id"), $"v".as("qv")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"sim".desc, $"vec_id".asc)
      emb.join(queries, $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", round(cosine($"v", $"qv"), 4).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .orderBy($"q_id", $"rn")
    }),

    // [EXT] IVF + int8 rerank — the two-stage ANN shape of a
    // product-quantization pipeline: (1) coarse IVF cell probe, (2) a
    // CHEAP approximate scan of the cell using per-vector symmetric
    // int8 codes (the q_embed_quantize scheme: code = round(x/step),
    // approx dot = Σ code_a·code_q · step_a·step_q — 4× less memory
    // traffic per candidate at scale), (3) exact cosine rerank of only
    // the top-20 approximate survivors. Every stage is deterministic
    // arithmetic, so unlike LSH the whole cascade is oracle-checked.
    // The assigned+quantized frame is persisted: it feeds the query
    // lookup and the cell scan (self-join re-execution trap).
    "q_ann_ivf_pq" -> ((s, dir) => {
      import s.implicits._
      graft.Pins.scoped { pins =>
        val assigned = pins(ivfAssigned(Tables.embeddings(s, dir)
            .select($"vec_id", asDouble($"embedding").as("v")))
          .withColumn("amax",
            greatest(aggregate($"v", lit(0.0), (a, x) => greatest(a, abs(x))), lit(1e-12)))
          .withColumn("step", $"amax" / 127.0)
          .withColumn("q8", transform($"v", x => round(x / $"step"))))
        val query = broadcast(assigned.filter($"vec_id" === 0)
          .select($"q8".as("qq8"), $"step".as("qstep"), $"v".as("qv"), $"cell".as("qcell")))
        val cand = assigned.join(query, $"cell" === $"qcell")
          .select($"vec_id", $"v", $"qv",
            round(dot($"q8", $"qq8") * $"step" * $"qstep", 4).as("qsim"))
          .orderBy($"qsim".desc, $"vec_id".asc)
          .limit(20)
        cand.select($"vec_id", $"qsim", round(cosine($"v", $"qv"), 4).as("sim"))
          .orderBy($"sim".desc, $"vec_id".asc)
          .limit(10)
      }
    }),

    // [EXT] SemDeDup-style semantic dedup (Abbas et al. '23,
    // arXiv:2303.09540): cluster the corpus with the coarse quantizer,
    // then WITHIN each cluster drop every vector that sits above a
    // cosine threshold with a higher-priority member — the paper keeps
    // the member with the LOWEST similarity to its cluster centroid
    // (the least prototypical example survives, maximizing diversity),
    // vec_id breaking exact ties. Non-iterative by construction (the
    // paper's rule, not connected components — q_dedup_groups owns
    // that shape), so one within-cell self-join decides every row.
    // Scale: pair work is bounded by cell occupancy × [[CellPoolCap]]
    // (the dropper side is pool-capped — see [[semanticDedup]]), and a
    // production run scales k with corpus size exactly like the IVF
    // path — cells become partition keys, never all-pairs. Fixed
    // centroids keep the
    // whole cascade deterministic, so unlike embedding-LSH this
    // near-dup path is oracle-checked end to end (assignment,
    // priority, drop set). Both the pair similarity and the centroid
    // similarity are rounded to 4dp BEFORE the threshold/priority
    // compare — the rounded-threshold contract every float-comparing
    // query here uses (a last-ulp fold difference must not flip a keep
    // decision across engines).
    "q_semantic_dedup" -> ((s, dir) => semanticDedup(s, dir)),

    // [EXT] cluster-balanced selection — the diversity-balancing cap
    // (the embedding-space twin of q_domain_cap): at most ClusterCap
    // docs per IVF cell, so no dense region of embedding space
    // dominates the training mix (crawl corpora are as skewed in
    // embedding space as in domain space). Priority is the md5 of the
    // id — deterministic, uniform within each cell, refresh-stable —
    // and the per-cell window plans the partial+final WindowGroupLimit
    // pair: each map task forwards at most ClusterCap rows per cell
    // before the shuffle. Fixed centroids keep the assignment
    // oracle-checked (q_ivf_assign's scheme); a production run trains
    // them and scales k with the corpus.
    "q_cluster_balance" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"cell").orderBy($"h".asc, $"vec_id".asc)
      ivfAssigned(Tables.embeddings(s, dir)
          .select($"vec_id", asDouble($"embedding").as("v")))
        .select($"vec_id", $"cell", md5($"vec_id".cast("string")).as("h"))
        .withColumn("pos", row_number().over(w))
        .filter($"pos" <= ClusterCap)
        .select($"vec_id", $"cell", $"pos")
        .orderBy($"cell", $"pos")
    }),

    // Per-label embedding centroids, element-wise: posexplode to
    // (label, dim, value) rows, hash-aggregate the mean. The shuffle
    // moves map-side-combined partials per (label, dim) — 64 × labels
    // groups regardless of corpus size — which is how element-wise
    // vector statistics stay linear at 100 TB (no array-valued
    // aggregation state, no driver collection).
    "q_centroids" -> ((s, dir) => {
      import s.implicits._
      Tables.embeddings(s, dir)
        .select($"label", posexplode(asDouble($"embedding")).as(Seq("pos", "v")))
        .groupBy($"label", $"pos")
        .agg(round(avg($"v"), 4).as("centroid"))
        .orderBy($"label", $"pos")
    }),

    // [EXT r13] ANN recall evaluation — the harness that decides
    // whether an approximate index is SHIPPABLE: for each probe in a
    // fixed query set, the exact brute-force top-k (the q_knn_join
    // shape) and the IVF single-probe top-k (the q_ann_ivf shape) are
    // computed from the SAME pinned assigned frame, and recall@k =
    // |approx ∩ exact| / k is reported per query. Every production
    // ANN deployment runs exactly this loop when tuning k/nprobe —
    // here the measurement itself is the operator, and because the
    // IVF cascade is deterministic the whole report (candidate sets
    // included) is oracle-checked. Plan shape: the query set
    // broadcasts, both rank windows are per-query top-k that Catalyst
    // rewrites to Partial+Final WindowGroupLimit (each mapper forwards
    // ≤ k rows per query — the shuffle is O(queries × k × partitions)
    // regardless of corpus size), and the recall join touches only
    // the ≤ queries × k surviving rows. Similarities are rounded at
    // 4 dp BEFORE ranking with vec_id tiebreaks (the rounded-boundary
    // contract), so the rank-k cut is identical across engines.
    "q_ann_recall" -> ((s, dir) => graft.Pins.scoped { pins =>
      import s.implicits._
      val assigned = pins(ivfAssigned(Tables.embeddings(s, dir)
        .select($"vec_id", asDouble($"embedding").as("v"))))
      val probes = broadcast(assigned.filter($"vec_id" < RecallQueries)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"cell".as("qcell")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"sim".desc, $"vec_id".asc)
      def topK(cand: DataFrame) = cand
        .select($"q_id", $"vec_id", round(cosine($"v", $"qv"), 4).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= RecallK)
        .select($"q_id", $"vec_id")
      val exact = topK(assigned.join(probes, $"vec_id" =!= $"q_id"))
      val approx = topK(assigned.join(probes,
        $"cell" === $"qcell" && $"vec_id" =!= $"q_id"))
      val nApprox = approx.groupBy($"q_id").agg(count(lit(1)).as("n_approx"))
      val hits = exact.join(approx, Seq("q_id", "vec_id"))
        .groupBy($"q_id").agg(count(lit(1)).as("hits"))
      probes.select($"q_id")
        .join(nApprox, Seq("q_id"), "left")
        .join(hits, Seq("q_id"), "left")
        .select($"q_id",
          coalesce($"n_approx", lit(0L)).as("n_approx"),
          coalesce($"hits", lit(0L)).as("hits"),
          round(coalesce($"hits", lit(0L)) / lit(RecallK.toDouble), 4)
            .as("recall"))
        .orderBy($"q_id")
    }),

    // [EXT r17] Matryoshka truncation audit (Kusupati et al. 2022) —
    // the decision report for serving MRL-style embeddings at a
    // truncated dimension: for each probe, the exact full-dim top-k
    // versus the top-k under cosine over the FIRST d dims only
    // (d ∈ [[MatryoshkaDims]]), with recall@k per (probe, d). At
    // 100 TB this is the measurement that justifies a 4× memory/IO
    // cut in the ANN tier before any index change (slice the stored
    // vectors, keep the pipeline). Same deterministic machinery as
    // q_ann_recall: probes broadcast, sims rounded 4 dp with vec_id
    // tiebreaks (identical fold order both engines), both rank
    // windows rewrite to Partial+Final WindowGroupLimit, and the
    // exact top-k is pinned because both truncation levels semi-join
    // it.
    "q_matryoshka_recall" -> ((s, dir) => graft.Pins.scoped { pins =>
      import s.implicits._
      val base = pins(Tables.embeddings(s, dir)
        .select($"vec_id", asDouble($"embedding").as("v")))
      val probes = broadcast(base.filter($"vec_id" < RecallQueries)
        .select($"vec_id".as("q_id"), $"v".as("qv")))
      val cand = base.join(probes, $"vec_id" =!= $"q_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"sim".desc, $"vec_id".asc)
      def topK(sim: Column) = cand
        .select($"q_id", $"vec_id", round(sim, 4).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= RecallK)
        .select($"q_id", $"vec_id")
      val exact = pins(topK(cosine($"v", $"qv")))
      val perDim = MatryoshkaDims.map { d =>
        topK(cosine(slice($"v", 1, d), slice($"qv", 1, d)))
          .join(exact, Seq("q_id", "vec_id"), "left_semi")
          .groupBy($"q_id").agg(count(lit(1)).as("hits"))
          .select($"q_id", lit(d).as("dim"), $"hits")
      }.reduce(_.unionByName(_))
      val spine = probes.select($"q_id")
        .crossJoin(broadcast(MatryoshkaDims.toDF("dim")))
      spine.join(perDim, Seq("q_id", "dim"), "left")
        .select($"q_id", $"dim",
          coalesce($"hits", lit(0L)).as("hits"),
          round(coalesce($"hits", lit(0L)) / lit(RecallK.toDouble), 4)
            .as("recall"))
        .orderBy($"q_id", $"dim")
    }),
  )

  /** q_ann_recall probe-set size (vec_id < RecallQueries — the
    * q_knn_join query-set convention) and evaluation depth.
    */
  private val RecallQueries = 5
  private val RecallK = 10

  /** q_matryoshka_recall truncation levels (prefix dims of the 64-dim
    * embeddings). */
  private val MatryoshkaDims = Seq(16, 32)

  /** The IVF centroids as a DuckDB VALUES list — generated from the
    * SAME `ivfCells` array the Spark queries use, so the two engines
    * can never drift.
    */
  private lazy val ivfCentsSql: String = ivfCells.zipWithIndex
    .map { case (c, i) => s"($i, ${c.mkString("[", ", ", "]")})" }
    .mkString(",\n        ")

  /** The FULL (clamp-max) LSH hyperplane family as a DuckDB VALUES
    * list — generated from the SAME `hyperplanes` stream the Spark
    * query draws its corpus-sized prefix from (see [[hyperplanes]]:
    * plane n is identical across family sizes), so the twin embeds 24
    * planes once and filters `pid < np` with the SQL-computed count.
    * Shared with the q_embed_neardup twin (seed 7) in [[Dedup]].
    */
  private[graft] def planesSql(seed: Long): String =
    hyperplanes(24, 64, seed).zipWithIndex
      .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")})" }
      .mkString(",\n        ")

  /** The corpus-sized plane-count CTE — the exact SQL mirror of
    * [[planeCount]] (same LN-ratio ceil, same clamps), over
    * `embeddings`' row count.
    */
  private[graft] val npCteSql: String =
    """np AS (SELECT LEAST(24, GREATEST(4,
      |         CAST(CEIL(LN(GREATEST(COUNT(*) / 64.0, 1.0)) / LN(2.0)) AS INT))) AS np
      |       FROM embeddings)""".stripMargin

  private lazy val lshPlanesSql: String = planesSql(seed = 42L)

  /** Shared assignment CTEs: per-vector nearest cell, first-occurrence
    * (= lowest cell id) on distance ties to match Spark's
    * array_position argmin.
    */
  /** Shared with [[Graph]]'s q_label_prop oracle (the kNN-graph
    * community query runs over the same cell assignment). */
  private[graft] lazy val ivfAssignCte: String =
    s"""WITH cents(cell, c) AS (VALUES
       |        $ivfCentsSql),
       |v AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
       |      FROM embeddings),
       |d AS (SELECT vec_id, vv, cell,
       |        list_sum(list_transform(list_zip(vv, c),
       |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
       |      FROM v, cents),
       |a AS (SELECT vec_id, vv, cell FROM d
       |      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY dist, cell) = 1)""".stripMargin

  /** The FULL (clamp-max) centroid pool as a VALUES list — generated
    * from the same seeded stream, so family k is its prefix (the
    * planesSql trick).
    */
  private lazy val ivfCentsPoolSql: String =
    ivfCentroids(IvfMaxCells, 64, IvfSeed).zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ", ", "]")})" }
      .mkString(",\n        ")

  /** Corpus-SCALED assignment CTEs — the [[ivfAssignCte]] shape with
    * the cell count computed in SQL from `embeddings`' row count
    * (exact mirror of [[ivfCellCount]]: same ceil, same clamps), used
    * by the within-cell self-join twins (q_semantic_dedup,
    * q_label_prop). At the graded SFs nc = $IvfK, so `cents` filters
    * to the identical historical family.
    */
  private[graft] lazy val ivfAssignScaledCte: String =
    s"""WITH nc AS (SELECT LEAST($IvfMaxCells, GREATEST($IvfK,
       |         CAST(CEIL(COUNT(*) / $IvfTargetPerCell.0) AS INT))) AS nc
       |       FROM embeddings),
       |cents AS (SELECT cell, c FROM (VALUES
       |        $ivfCentsPoolSql) pool(cell, c), nc
       |      WHERE pool.cell < nc.nc),
       |v AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
       |      FROM embeddings),
       |d AS (SELECT vec_id, vv, cell,
       |        list_sum(list_transform(list_zip(vv, c),
       |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
       |      FROM v, cents),
       |a AS (SELECT vec_id, vv, cell FROM d
       |      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY dist, cell) = 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    // The pool CTE mirrors semanticDedup's dropper-side cap exactly:
    // same rank (simcent ASC, vec_id ASC per cell), same CellPoolCap,
    // so the recall trade is hash-PROVEN at every graded SF (the cap
    // is ACTIVE there — floor-k cells exceed 250 occupants at sf0.1).
    "q_semantic_dedup" ->
      s"""$ivfAssignScaledCte,
         |sc AS (
         |  SELECT a.vec_id, a.cell, a.vv, ROUND(
         |    list_sum(list_transform(list_zip(a.vv, cents.c), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(a.vv, x -> x * x)))
         |       * SQRT(list_sum(list_transform(cents.c, x -> x * x)))), 4) AS simcent
         |  FROM a JOIN cents USING (cell)),
         |pool AS (
         |  SELECT vec_id, cell, vv, simcent FROM sc
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY cell
         |    ORDER BY simcent, vec_id) <= $CellPoolCap),
         |dropped AS (
         |  SELECT DISTINCT x.vec_id
         |  FROM sc x JOIN pool y ON x.cell = y.cell AND x.vec_id <> y.vec_id
         |    AND (y.simcent < x.simcent
         |         OR (y.simcent = x.simcent AND y.vec_id < x.vec_id))
         |  WHERE ROUND(
         |    list_sum(list_transform(list_zip(x.vv, y.vv), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(x.vv, v -> v * v)))
         |       * SQRT(list_sum(list_transform(y.vv, v -> v * v)))), 4) >= $SemDedupTau)
         |SELECT sc.vec_id, CAST(sc.cell AS INT) AS cell, sc.simcent,
         |  CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
         |FROM sc LEFT JOIN dropped d ON sc.vec_id = d.vec_id
         |ORDER BY sc.vec_id""".stripMargin,
    "q_ivf_assign" ->
      s"""$ivfAssignCte
         |SELECT CAST(cell AS INT) AS cell, COUNT(*) AS cnt
         |FROM a GROUP BY cell ORDER BY cell""".stripMargin,
    "q_cluster_balance" ->
      s"""$ivfAssignCte,
         |p AS (
         |  SELECT vec_id, CAST(cell AS INT) AS cell,
         |    CAST(row_number() OVER (PARTITION BY cell
         |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS pos
         |  FROM a)
         |SELECT vec_id, cell, pos FROM p
         |WHERE pos <= $ClusterCap ORDER BY cell, pos""".stripMargin,
    // Mirrors annLsh exactly: plane count from the corpus size (same
    // LN-ratio ceil as Vectors.planeCount, so both engines round the
    // same way), MSB-first bit fold as a left-shift sum, sign of the
    // UNROUNDED dot (exact: 3-dp plane literals parse to identical
    // doubles and both engines fold element-order), cosine rounded 4.
    "q_ann_lsh" ->
      s"""WITH planes(pid, pv) AS (VALUES
         |        $lshPlanesSql),
         |$npCteSql,
         |v AS (SELECT vec_id,
         |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
         |      FROM embeddings),
         |b AS (SELECT v.vec_id, CAST(SUM(CASE WHEN
         |          list_sum(list_transform(list_zip(v.vv, planes.pv),
         |            p -> p[1] * p[2])) >= 0
         |          THEN (CAST(1 AS BIGINT) << (np.np - 1 - planes.pid))
         |          ELSE 0 END) AS BIGINT) AS bucket
         |      FROM v, np, planes WHERE planes.pid < np.np
         |      GROUP BY v.vec_id),
         |cand AS (SELECT b.vec_id, b.bucket, v.vv FROM b JOIN v USING (vec_id)),
         |q AS (SELECT vv AS qv, bucket AS qbucket FROM cand WHERE vec_id = 0)
         |SELECT cand.vec_id, cand.bucket, ROUND(
         |    list_sum(list_transform(list_zip(cand.vv, q.qv), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(cand.vv, x -> x * x)))
         |       * SQRT(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS sim
         |FROM cand, q WHERE cand.bucket = q.qbucket
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf" ->
      s"""$ivfAssignCte,
         |q AS (SELECT vv AS qv, cell AS qcell FROM a WHERE vec_id = 0)
         |SELECT vec_id, CAST(cell AS INT) AS cell, sim FROM (
         |  SELECT a.vec_id, a.cell, ROUND(
         |    list_sum(list_transform(list_zip(a.vv, q.qv), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(a.vv, x -> x * x)))
         |       * SQRT(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS sim
         |  FROM a, q WHERE a.cell = q.qcell)
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf_probe2" ->
      s"""$ivfAssignCte,
         |qcells AS (SELECT cell FROM d WHERE vec_id = 0 ORDER BY dist, cell LIMIT 2),
         |q AS (SELECT vv AS qv FROM a WHERE vec_id = 0)
         |SELECT vec_id, CAST(cell AS INT) AS cell, sim FROM (
         |  SELECT a.vec_id, a.cell, ROUND(
         |    list_sum(list_transform(list_zip(a.vv, q.qv), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(a.vv, x -> x * x)))
         |       * SQRT(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS sim
         |  FROM a, q WHERE a.cell IN (SELECT cell FROM qcells))
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_vec_assemble" ->
      """SELECT l_orderkey, l_linenumber,
        |  feats[1] AS f0, feats[2] AS f1, feats[3] AS f2, feats[4] AS f3
        |FROM (SELECT l_orderkey, l_linenumber,
        |        [l_quantity, l_extendedprice, l_discount, l_tax] AS feats
        |      FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_dot" ->
      """SELECT vec_id,
        |  ROUND(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS dot_self
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_embed_quantize" ->
      """WITH t AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    GREATEST(list_max(list_transform(v, x -> abs(x))), 1e-12) AS amax,
        |    GREATEST(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS step
        |  FROM t)
        |SELECT vec_id, ROUND(amax, 4) AS amax,
        |  ROUND(list_sum(list_transform(v,
        |    x -> (x - round(x / step) * step) * (x - round(x / step) * step)))
        |    / len(v) * 1e6, 4) AS mse_e6
        |FROM s ORDER BY vec_id""".stripMargin,
    "q_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS pos,
        |  ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS centroid
        |FROM embeddings, (SELECT unnest(range(1, 65)) AS i) r
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    "q_knn_join" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, vv AS qv FROM v WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, v.vec_id, ROUND(
        |    list_sum(list_transform(list_zip(v.vv, q.qv), p -> p[1] * p[2]))
        |    / (SQRT(list_sum(list_transform(v.vv, x -> x * x)))
        |       * SQRT(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS sim
        |  FROM v, q WHERE v.vec_id <> q.q_id)
        |SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
        |  SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    "q_ann_ivf_pq" ->
      s"""$ivfAssignCte,
         |qz AS (SELECT vec_id, vv, cell,
         |         GREATEST(list_max(list_transform(vv, x -> abs(x))), 1e-12) / 127.0 AS step
         |       FROM a),
         |qc AS (SELECT vec_id, vv, cell, step,
         |         list_transform(vv, x -> round(x / step)) AS q8 FROM qz),
         |q AS (SELECT q8 AS qq8, step AS qstep, vv AS qv, cell AS qcell
         |      FROM qc WHERE vec_id = 0),
         |cand AS (
         |  SELECT qc.vec_id, qc.vv, q.qv, ROUND(
         |    list_sum(list_transform(list_zip(qc.q8, q.qq8), p -> p[1] * p[2]))
         |    * qc.step * q.qstep, 4) AS qsim
         |  FROM qc, q WHERE qc.cell = q.qcell
         |  ORDER BY qsim DESC, vec_id LIMIT 20)
         |SELECT vec_id, qsim, ROUND(
         |  list_sum(list_transform(list_zip(vv, qv), p -> p[1] * p[2]))
         |  / (SQRT(list_sum(list_transform(vv, x -> x * x)))
         |     * SQRT(list_sum(list_transform(qv, x -> x * x)))), 4) AS sim
         |FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id, ROUND(
        |    list_sum(list_transform(list_zip(e.embedding, q.qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * SQRT(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
        |  4) AS sim
        |  FROM embeddings e, q)
        |SELECT vec_id, sim FROM scored
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_recall" ->
      s"""$ivfAssignCte,
         |q AS (SELECT vec_id AS q_id, vv AS qv, cell AS qcell FROM a
         |      WHERE vec_id < $RecallQueries),
         |sc AS (
         |  SELECT q.q_id, q.qcell, a.vec_id, a.cell, ROUND(
         |    list_sum(list_transform(list_zip(a.vv, q.qv), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(a.vv, x -> x * x)))
         |       * SQRT(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS sim
         |  FROM a, q WHERE a.vec_id <> q.q_id),
         |exact AS (SELECT q_id, vec_id FROM sc
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) <= $RecallK),
         |approx AS (SELECT q_id, vec_id FROM sc WHERE cell = qcell
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) <= $RecallK),
         |na AS (SELECT q_id, COUNT(*) AS n_approx FROM approx GROUP BY q_id),
         |nh AS (SELECT q_id, COUNT(*) AS hits
         |       FROM exact JOIN approx USING (q_id, vec_id) GROUP BY q_id)
         |SELECT q.q_id, COALESCE(na.n_approx, 0) AS n_approx,
         |  COALESCE(nh.hits, 0) AS hits,
         |  ROUND(COALESCE(nh.hits, 0) / $RecallK.0, 4) AS recall
         |FROM q LEFT JOIN na USING (q_id) LEFT JOIN nh USING (q_id)
         |ORDER BY q_id""".stripMargin,
    // Same double-cast + in-order fold as the q_cosine_topk twin;
    // truncation via array_slice over the shared dims VALUES list.
    "q_matryoshka_recall" ->
      s"""WITH ve AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM ve
         |      WHERE vec_id < $RecallQueries),
         |dims(dim) AS (VALUES ${MatryoshkaDims.map(d => s"($d)").mkString(", ")}),
         |sc AS (
         |  SELECT q.q_id, e.vec_id, ROUND(
         |    list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(e.v, x -> x * x)))
         |       * SQRT(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS sim
         |  FROM ve e, q WHERE e.vec_id <> q.q_id),
         |exact AS (SELECT q_id, vec_id FROM sc
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) <= $RecallK),
         |sct AS (
         |  SELECT d.dim, q.q_id, e.vec_id, ROUND(
         |    list_sum(list_transform(
         |      list_zip(array_slice(e.v, 1, d.dim), array_slice(q.qv, 1, d.dim)),
         |      p -> p[1] * p[2]))
         |    / (SQRT(list_sum(list_transform(array_slice(e.v, 1, d.dim),
         |         x -> x * x)))
         |       * SQRT(list_sum(list_transform(array_slice(q.qv, 1, d.dim),
         |           x -> x * x)))), 4) AS sim
         |  FROM ve e, q, dims d WHERE e.vec_id <> q.q_id),
         |tr AS (SELECT dim, q_id, vec_id FROM sct
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY dim, q_id
         |    ORDER BY sim DESC, vec_id) <= $RecallK),
         |nh AS (SELECT dim, q_id, COUNT(*) AS hits
         |       FROM tr JOIN exact USING (q_id, vec_id) GROUP BY dim, q_id)
         |SELECT q.q_id, d.dim, COALESCE(nh.hits, 0) AS hits,
         |  ROUND(COALESCE(nh.hits, 0) / $RecallK.0, 4) AS recall
         |FROM q CROSS JOIN dims d
         |LEFT JOIN nh ON nh.q_id = q.q_id AND nh.dim = d.dim
         |ORDER BY q.q_id, d.dim""".stripMargin,
  )
}
