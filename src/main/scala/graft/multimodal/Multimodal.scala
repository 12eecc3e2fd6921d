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

  /** STUB decode kernel: a real implementation would call an image
    * codec here (per partition, batched). The stand-in derives a fake
    * "decoded" frame deterministically from payload bytes: dimensions
    * from the first bytes, a 16-bin byte histogram as the feature map.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val w = 64 + (if (payload.nonEmpty) (payload(0) & 0x7f) else 0)
    val h = 64 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xff) / 16) += 1.0)
    val total = math.max(1.0, payload.length.toDouble)
    (w, h, hist.map(_ / total))
  }

  /** Partition-batched decode: binary payload → (width, height,
    * histogram features). One iterator pass per partition — the batch
    * shape a vectorized codec kernel needs.
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val (w, h, hist) = decodeStub(payload)
          Row(id, w, h, hist.toSeq)
        }
      }(enc)
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
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image/fake' AS kind,
        |  CAST(length(text) AS BIGINT) AS n_bytes, source
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
