package graft.functions

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Deduplication suite for LLM-data pipelines over `documents`:
  *
  *   - exact: groupBy(text) with a deterministic keeper (min doc_id) —
  *     one hash-partition shuffle on the dedup key; at 100 TB group on
  *     the md5 fingerprint instead of the full text so the shuffle
  *     moves 16 bytes per row, not documents (q_dedup_exact does both:
  *     keys on fingerprint, which is 1:1 with normalized text).
  *   - MinHash + LSH banding: word-shingle → k minhashes → b bands;
  *     candidate pairs are a self-join on (band, band signature) —
  *     only colliding docs ever meet, so the join is linear in bucket
  *     sizes, never quadratic in corpus size.
  *   - SimHash: 64-bit signature via sign-summed token-hash bits;
  *     near-dups differ in few bits (compare with bit_count(a XOR b)).
  *   - n-gram Jaccard: exact set overlap on shingles for candidate
  *     pairs, blocked by a cheap key (lang) to bound the pair space.
  *
  * All hashing uses Spark's codegen'd xxhash64 — deterministic across
  * runs and cluster layouts, no UDFs anywhere.
  */
object Dedup extends QueryModule {

  /** Word n-gram shingles of a text column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signatures, distributed shape: explode shingles to one
    * row each, then groupBy(doc) with k `min(hash_j)` aggregates.
    *
    * The inline alternative (k × `array_min(transform(shingles…))`
    * in one projection) duplicates the shingle expression k times in
    * the plan — 17s for 500 docs at k=32. This shape computes shingles
    * once, hash-aggregates with map-side combine, and scales linearly:
    * the only shuffle is pre-aggregated (doc, k mins) rows.
    *
    * Seeding is by a distinct per-hash suffix — xxhash64's seed is
    * fixed in the functions API; the suffix varies the hash family
    * deterministically.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingles(col(textCol), 3)).as("sh"))
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(concat(col("sh"), lit(s"#$j")))).as(s"h$j"))
    sh.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** Bit i of a hash, extracted
    * arithmetically so the shift amount can be a lambda variable:
    * bit = floor(h / 2^i) mod 2 over the non-negative 63-bit part.
    */
  private def bitOf(h: Column, i: Column): Column =
    pmod(floor(abs(h) / pow(lit(2.0), i.cast("double"))).cast("long"), lit(2L))

  /** SimHash via arithmetic bit extraction (48 bits: stays exact in
    * the double-precision pow/floor path, 2^48 < 2^53).
    */
  def simhash48(text: Column): Column = {
    val toks = array_distinct(split(text, " "))
    val idx = sequence(lit(0), lit(47))
    val zeros = transform(idx, _ => lit(0L))
    val counters = aggregate(toks, zeros, (acc, tok) =>
      zip_with(acc, idx, (c, i) =>
        c + when(bitOf(xxhash64(tok), i) === 1L, lit(1L)).otherwise(lit(-1L))))
    aggregate(counters, lit(0L), (acc, c) => acc * 2 + when(c > 0, 1L).otherwise(0L))
  }

  override def queries: Map[String, Query] = Map(
    // Exact dedup keyed on the normalized fingerprint.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(Text.fingerprint($"text").as("fp"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
        .select($"keep_id", $"dup_cnt")
        .orderBy($"keep_id")
    }),

    // dropDuplicates surface: distinct (lang, source) combinations.
    "q_distinct_pairs" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"lang", $"source")
        .dropDuplicates()
        .orderBy($"lang", $"source")
    }),

    // MinHash LSH candidate pairs (no oracle — hash-family specific).
    "q_dedup_minhash" -> ((s, dir) => {
      import s.implicits._
      minhashPairs(s, dir)
    }),

    // SimHash signatures (no oracle — hash-specific).
    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", simhash48($"text").as("simhash"))
        .orderBy($"doc_id")
    }),

    // Exact n-gram Jaccard on lang-blocked pairs (no oracle).
    "q_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select($"doc_id", $"lang", shingles($"text", 3).as("sh"))
      val a = d.select($"lang", $"doc_id".as("doc_a"), $"sh".as("sh_a"))
      val b = d.select($"lang", $"doc_id".as("doc_b"), $"sh".as("sh_b"))
      a.join(b, Seq("lang"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          round(size(array_intersect($"sh_a", $"sh_b")).cast("double") /
            size(array_union($"sh_a", $"sh_b")), 4).as("jaccard"))
        .filter($"jaccard" >= 0.1)
        .orderBy($"jaccard".desc, $"doc_a", $"doc_b")
        .limit(100)
    }),

    // Embedding-cosine near-dup pairs via LSH blocking (no oracle).
    "q_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      val planes = Vectors.hyperplanes(nPlanes = 4, dim = 64, seed = 7L)
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", Vectors.asDouble($"embedding").as("v"))
        .withColumn("bucket", Vectors.lshBucket($"v", planes))
      val a = e.select($"bucket", $"vec_id".as("id_a"), $"v".as("v_a"))
      val b = e.select($"bucket", $"vec_id".as("id_b"), $"v".as("v_b"))
      a.join(b, Seq("bucket"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", round(Vectors.cosine($"v_a", $"v_b"), 4).as("sim"))
        .filter($"sim" >= 0.2)
        .orderBy($"sim".desc, $"id_a", $"id_b")
        .limit(100)
    }),
  )

  /** MinHash banding pairs with estimated Jaccard from signature
    * agreement (fraction of equal minhashes).
    */
  private def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val numHashes = 32
    val bands = 8
    val rowsPerBand = numHashes / bands
    val docs = minhashSignatures(
      Tables.documents(spark, dir), "doc_id", "text", numHashes)
    val banded = docs.select(
      col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket",
        xxhash64(col("band"),
          concat_ws(",",
            slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))
              .cast("array<string>"))))
    val a = banded.select(col("bucket"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("bucket"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v) / numHashes, 4).as("est_jaccard"))
      .distinct()
      .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(200)
  }

  override def oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS dup_cnt
        |FROM documents
        |GROUP BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |ORDER BY keep_id""".stripMargin,
    "q_distinct_pairs" ->
      """SELECT DISTINCT lang, source FROM documents
        |ORDER BY lang, source""".stripMargin,
  )
}
