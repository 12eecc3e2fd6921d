package graft.multimodal

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal columns: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction
  * stages as partition-batched transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (byte-level pseudo-decode); the
  * Spark-side plumbing is real and is what matters at scale:
  *   - payloads stay in `BinaryType` columns (columnar parquet pages,
  *     never materialized on the driver);
  *   - per-partition batch processing via `mapPartitions` over a typed
  *     schema — the Scala equivalent of `mapInPandas` batch shape, one
  *     kernel invocation per batch, not per row;
  *   - metadata is a typed struct column so pruning/predicates on
  *     metadata never touch payload bytes.
  */
object Multimodal extends QueryModule {

  /** Media-table schema: how a 100 TB multimodal corpus is laid out. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = false)))

  /** Deterministic media table derived from `documents` (text bytes
    * stand in for encoded payloads — same plumbing, fake codec).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image/fake").as("kind"),
        length(col("text")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("histogram", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decode kernel over a BATCH of payloads: a real
    * implementation would hand the whole batch to a native codec in
    * one call (the amortization that makes per-image decode viable at
    * scale). The stand-in derives a fake "decoded" frame
    * deterministically from payload bytes: dimensions from the first
    * bytes, a 16-bin byte histogram as the feature map.
    */
  private def decodeStubBatch(payloads: Array[Array[Byte]]): Array[(Int, Int, Array[Double])] =
    payloads.map { payload =>
      val w = 64 + (if (payload.nonEmpty) (payload(0) & 0x7f) else 0)
      val h = 64 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)
      val hist = new Array[Double](16)
      payload.foreach(b => hist((b & 0xff) / 16) += 1.0)
      val total = math.max(1.0, payload.length.toDouble)
      (w, h, hist.map(_ / total))
    }

  /** Rows per kernel invocation: large enough to amortize a native
    * codec call, small enough to bound batch memory (payloads can be
    * megabytes each at real scale).
    */
  val DecodeBatchSize = 256

  /** Partition-batched decode: binary payload → (width, height,
    * histogram features). Each partition's rows are fed to the codec
    * kernel in `DecodeBatchSize` chunks — one kernel invocation per
    * batch, not per row (the Scala equivalent of `mapInPandas` batch
    * shape).
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap { batch =>
          val ids = batch.map(_.getLong(0))
          val payloads = batch.map { r =>
            if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          }.toArray
          ids.iterator.zip(decodeStubBatch(payloads).iterator).map {
            case (id, (w, h, hist)) => Row(id, w, h, hist.toSeq)
          }
        }
      }(enc)
  }

  /** Resize planning: target dimensions for a max-side downscale
    * preserving aspect ratio — the arithmetic every image-resize stage
    * runs before touching pixels (the pixel resample itself would live
    * in the decode kernel; planning is pure column math, so it is
    * oracle-checkable). Dimensions derive deterministically from
    * payload length (the dims stub, range 64..191), `floor(x*scale +
    * 0.5)` instead of `round` so tie behavior is engine-independent,
    * and images already within budget pass through unscaled. The
    * default budget of 128 sits INSIDE the stub's dim range so both
    * branches — passthrough and actual downscale — execute on real
    * rows and are oracle-verified (a 224 budget exceeded every stub
    * dim, leaving the scaling arithmetic dead and its check vacuous).
    */
  def resizePlan(media: DataFrame, maxSide: Int = 128): DataFrame = {
    val n = col("meta.n_bytes")
    media
      .select(col("media_id"),
        (lit(64) + n % 128).cast("int").as("w"),
        // shiftright, not `/`: Column./ on longs is DOUBLE division
        (lit(64) + shiftright(n, 1) % 128).cast("int").as("h"))
      .withColumn("scale",
        when(greatest(col("w"), col("h")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide.toDouble) / greatest(col("w"), col("h"))))
      .select(col("media_id"), col("w"), col("h"),
        floor(col("w") * col("scale") + 0.5).cast("int").as("out_w"),
        floor(col("h") * col("scale") + 0.5).cast("int").as("out_h"),
        round(col("scale"), 4).as("scale"))
  }

  /** Deterministic frame-sampling stub: pick every k-th byte-block
    * "frame" index from the payload — the plumbing for video frame
    * extraction (indices only; a codec would slice real frames).
    */
  def sampleFrames(media: DataFrame, every: Int = 32): DataFrame =
    media.select(
      col("media_id"),
      transform(
        sequence(lit(0),
          greatest(floor(length(col("payload")) / every).cast("int") - 1, lit(0))),
        i => i * every).as("frame_offsets"))

  override def queries: Map[String, Query] = Map(
    // Decode plumbing end-to-end (rows-only: stub codec is not SQL).
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      decode(mediaTable(s, dir))
        .select($"media_id", $"width", $"height",
          round(element_at($"histogram", 1), 4).as("h0"),
          round(element_at($"histogram", 8), 4).as("h7"))
        .orderBy($"media_id")
    }),

    // Frame-offset sampling — pure arithmetic over payload length, so
    // it is oracle-checkable (DuckDB generate_series twin). Offsets
    // are exploded to scalar rows: the driver compare can't hash
    // array columns.
    "q_frame_sample" -> ((s, dir) => {
      import s.implicits._
      sampleFrames(mediaTable(s, dir))
        .select($"media_id", explode($"frame_offsets").as("off"))
        .select($"media_id", $"off".cast("long").as("frame_offset"))
        .orderBy($"media_id", $"frame_offset")
    }),

    // Resize planning — pure arithmetic, oracle-checkable; payload
    // bytes never read (dims derive from metadata).
    "q_mm_resize" -> ((s, dir) => {
      import s.implicits._
      resizePlan(mediaTable(s, dir)).orderBy($"media_id")
    }),

    // Metadata projection never reads payload bytes (column pruning
    // through the struct) — oracle-checkable.
    "q_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      mediaTable(s, dir)
        .select($"media_id", $"meta.kind".as("kind"),
          $"meta.n_bytes".as("n_bytes"), $"meta.source".as("source"))
        .orderBy($"media_id")
    }),
  )

  override def oracles: Map[String, String] = Map(
    // payload = utf8 bytes of text, so lengths are octet lengths
    // (Spark length(binary) counts bytes; DuckDB length(varchar)
    // counts characters — encode() makes them agree on non-ASCII).
    "q_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(u * 32 AS BIGINT) AS frame_offset
        |FROM (SELECT doc_id, unnest(range(0,
        |    GREATEST(CAST(FLOOR(octet_length(encode(text)) / 32) AS INT) - 1, 0) + 1)) AS u
        |  FROM documents)
        |ORDER BY media_id, frame_offset""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image/fake' AS kind,
        |  CAST(length(text) AS BIGINT) AS n_bytes, source
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_mm_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    CAST(64 + length(text) % 128 AS INT) AS w,
        |    CAST(64 + (length(text) // 2) % 128 AS INT) AS h
        |  FROM documents),
        |s AS (
        |  SELECT media_id, w, h,
        |    CASE WHEN GREATEST(w, h) <= 128 THEN 1.0
        |         ELSE 128.0 / GREATEST(w, h) END AS scale
        |  FROM d)
        |SELECT media_id, w, h,
        |  CAST(FLOOR(w * scale + 0.5) AS INT) AS out_w,
        |  CAST(FLOOR(h * scale + 0.5) AS INT) AS out_h,
        |  ROUND(scale, 4) AS scale
        |FROM s ORDER BY media_id""".stripMargin,
  )
}
