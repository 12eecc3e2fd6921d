package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture generator for scaling probes BEYOND the driver's largest
  * testdata (sf0.1): replicates a source SF directory k× with
  * deterministic per-copy perturbation, so SCALING.md's 10×-data
  * ratios can be extended another decade (the r16 verdict's item 4 —
  * confirm the worst-ratio operators stay sublinear-per-row at
  * sf0.3–0.5) without touching the read-only driver data.
  *
  * Perturbation design (all deterministic, seed-free):
  *   - `documents`: copy 0 is verbatim; copy c>0 keeps (lang, source,
  *     token multiset, length) per doc but SHUFFLES the token order by
  *     a per-copy (position, token)-seeded xxhash64 — the driver
  *     corpus is synthetic word salad (unigram draws), so a shuffled
  *     copy is distributionally identical fresh text. The seed
  *     deliberately EXCLUDES doc_id: two source docs with identical
  *     text shuffle to the same string within a copy, so every
  *     exact-dup group is reproduced once per copy (dup RATE constant
  *     as volume grows — the r17 doc_id-seeded shuffle broke in-copy
  *     dup pairs, so corpus-wide dup density fell ~1/factor and the
  *     sf≥0.3 dedup probes ran against thinner dup structure than
  *     sf0.1), while verbatim copies would instead MERGE groups
  *     across copies (×factor group sizes — a data pathology).
  *     Position-aligned near-dups get near-identical permutations for
  *     the same reason (shared (i, t) entries sort identically);
  *     insertion-shifted near-dups still break — an accepted residue,
  *     since the driver corpus plants no such pairs.
  *   - `embeddings`: vector elements rotated by 17·c positions —
  *     preserves norms and the coordinate distribution without
  *     creating exact-duplicate vectors.
  *   - `lineitem`/`orders`: key-shifted copies (FK structure intact
  *     per copy; copies never join across).
  *   - dimension/event tables: byte-copied unchanged (dims don't grow
  *     with corpus volume; events.parquet carries TIMESTAMP(NANOS)
  *     that a Spark rewrite would alter).
  *
  * Usage: runMain graft.ScaleGen [srcDir] [destDir] [factor]
  */
object ScaleGen {
  /** doc_id / vec_id / orderkey copy strides — far above any id in the
    * driver data at any shipped SF, so copies never collide.
    */
  val DocStride = 10000000L
  val OrderStride = 100000000L

  private def shuffledText(copy: Int): org.apache.spark.sql.Column = {
    val tk = functions.Text.tokens(col("text"))
    array_join(
      transform(
        array_sort(transform(tk, (t, i) =>
          struct(xxhash64(lit(copy), i, t).as("h"), t.as("t")))),
        e => e.getField("t")),
      " ")
  }

  private[graft] def scaleDocuments(docs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) docs.select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      else docs.select(
        (col("doc_id") + lit(c * DocStride)).as("doc_id"),
        shuffledText(c).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
    }.reduce(_.unionByName(_))

  private[graft] def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) emb
      else {
        // Rotation modulus derived from the vector itself, not a
        // hardcoded 64: element_at past the end returns NULL in
        // non-ANSI mode, so a dimension mismatch would silently
        // corrupt vectors instead of erroring. The rotation amount is
        // c % (dim−1) + 1 — always in 1..dim−1, so NO copy is ever a
        // verbatim duplicate of copy 0 (the old 17·c stride lost that
        // guarantee when the modulus stopped being the 17-coprime
        // literal 64: any dim dividing 17·c would emit exact-duplicate
        // vectors, the very pathology the rotation exists to avoid).
        // Scope of the guarantee: copy-vs-COPY-0 only. Two copies
        // c1 ≡ c2 (mod dim−1) share a rotation and duplicate EACH
        // OTHER — reachable only at factor > dim−1 (> 63 at the
        // shipped dim = 64, i.e. sf > 6.3), so mix a c-dependent
        // stride into the permutation before generating above that.
        // dim = 1 degenerates to the identity — unavoidable, every
        // rotation of a 1-vector is the identity.
        val dim = size(col("embedding"))
        val rot = lit(c) % greatest(dim - 1, lit(1)) + 1
        emb.select(
          (col("vec_id") + lit(c * DocStride)).as("vec_id"),
          transform(sequence(lit(0), dim - 1),
            i => element_at(col("embedding"), (i + rot) % dim + 1))
            .as("embedding"),
          col("label"))
      }
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val destDir = if (args.length > 1) args(1) else "/tmp/graft_sf0.3"
    val factor = if (args.length > 2) args(2).toInt else 3
    require(!destDir.startsWith("/root/testdata"),
      "driver testdata is read-only; write the scaled fixture elsewhere")
    val spark = GraftSession.local()
    new java.io.File(destDir).mkdirs()

    scaleDocuments(Tables.documents(spark, srcDir), factor)
      .write.mode("overwrite").parquet(s"$destDir/documents.parquet")
    scaleEmbeddings(Tables.embeddings(spark, srcDir), factor)
      .write.mode("overwrite").parquet(s"$destDir/embeddings.parquet")

    val orders = Tables.orders(spark, srcDir)
    (0 until factor).map { c =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(c * OrderStride))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$destDir/orders.parquet")
    val li = Tables.lineitem(spark, srcDir)
    (0 until factor).map { c =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(c * OrderStride))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$destDir/lineitem.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part", "events")) {
      val src = java.nio.file.Paths.get(s"$srcDir/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$destDir/$t.parquet")
      java.nio.file.Files.copy(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    for (t <- Seq("documents", "embeddings", "orders", "lineitem"))
      println(s"[scalegen] $t: " +
        spark.read.parquet(s"$destDir/$t.parquet").count() + " rows")
    spark.stop()
  }
}
