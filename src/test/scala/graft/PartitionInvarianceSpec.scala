package graft

/** Partition-invariance property sweep (round-6 verdict #4): every
  * oracle-eligible query must return IDENTICAL results whether its
  * input tables arrive as one partition or seven. This is the class of
  * bug the sf0.01 hash gate cannot see — the driver always reads the
  * same parquet layout, so a result that silently depends on input
  * partitioning (per-partition evaluation order leaking into a sort
  * tie, a window missing its partitionBy, float accumulation order
  * surfacing through an unrounded aggregate, zipWithIndex-style
  * ordinal assumptions) would hash-match every round and still be
  * wrong on a real cluster, where partitioning is whatever the last
  * shuffle left behind.
  *
  * Method: rewrite the sf0.001 tables into two adversarial copies —
  * `coalesce(1)` (everything in one partition, one file) and
  * `repartition(7)` (round-robin over a prime count, rows deliberately
  * shuffled out of their written order) — and run every key in
  * [[SparkEntry.oracleSql]] against both, comparing the full row set
  * (sorted, since only content is contracted, not order beyond each
  * query's own ORDER BY). No-oracle keys (KMeans, LSH pair sets,
  * sketches) are exactly the shapes whose output legitimately varies
  * with partitioning; their compensating specs pin the invariants that
  * do hold.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Two relaid copies of the fixture dir, built once per suite. The
    * raw parquet is copied as-is (events keeps its nanos-as-long
    * column; the Tables loader re-derives the timestamp either way).
    */
  private lazy val (dirOne, dirSeven) = {
    val one = Scratch.dir("pinv_one")
    val seven = Scratch.dir("pinv_seven")
    tableNames.foreach { n =>
      val df = spark.read.parquet(s"$sf/$n.parquet")
      df.coalesce(1).write.mode("overwrite").parquet(s"$one/$n.parquet")
      df.repartition(7).write.mode("overwrite").parquet(s"$seven/$n.parquet")
    }
    (one, seven)
  }

  private def canonical(df: org.apache.spark.sql.DataFrame): (Seq[String], Seq[String]) =
    (df.schema.fieldNames.toSeq, df.collect().map(_.toString).sorted.toSeq)

  /** No-oracle keys that are nonetheless DETERMINISTIC by
    * construction — fixed hash families, total-ordered limits,
    * min-label components, commutative sketch merges — and therefore
    * must also be partition-invariant. The rest of the no-oracle set
    * is excluded for cause: KMeans/PCA depend on partitioning, the
    * seeded samplers and frequent-items/GK sketches fold in partition
    * order.
    */
  private val deterministicNoOracle: Seq[String] =
    SparkSpec.DeterministicNoOracle

  (SparkEntry.oracleSql.keys.toSeq ++ deterministicNoOracle).sorted.foreach { key =>
    test(s"$key is invariant under input partitioning (1 vs 7)") {
      val (schemaOne, rowsOne) = canonical(SparkEntry.queries(key)(spark, dirOne))
      val (schemaSeven, rowsSeven) = canonical(SparkEntry.queries(key)(spark, dirSeven))
      assert(schemaOne === schemaSeven, s"$key: schema drifts with partitioning")
      assert(rowsOne === rowsSeven, s"$key: result depends on input partitioning")
    }
  }
}
