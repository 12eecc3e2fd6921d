package graft

import org.apache.spark.sql.functions._

/** The corpus-prep transforms (chunking, PII redaction) are stateless
  * per-row functions — the whole point of expressing them as
  * `DataFrame => DataFrame` is that the SAME function body runs under
  * Structured Streaming for incremental corpus ingestion. These tests
  * pin that: a file-source readStream through the transform yields
  * exactly the batch result.
  */
class StreamingTextSpec extends SparkSpec {

  // One snapshot shared by both tests: written once per suite (lazy),
  // so the tests neither duplicate the I/O nor race on overwriting the
  // directory a stream is reading.
  private lazy val docsDirAndStaticShared: (String, org.apache.spark.sql.DataFrame) = {
    val s = spark
    import s.implicits._
    val dir = Scratch.dir("stream_docs_src")
    Tables.documents(s, sf).select($"doc_id", $"text", $"lang")
      .write.mode("overwrite").parquet(dir)
    (dir, s.read.parquet(dir))
  }
  private def docsDirAndStatic() = docsDirAndStaticShared

  test("chunking under readStream matches the batch transform") {
    val s = spark
    val (dir, static) = docsDirAndStatic()
    val q = functions.Text.chunked(
        s.readStream.schema(static.schema).parquet(dir))
      .writeStream.format("memory").queryName("chunk_stream_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = s.sql(
        "SELECT doc_id, chunk_id, n_chunk_tokens, chunk_text FROM chunk_stream_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val batch = functions.Text.chunked(static)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("language-ID under readStream matches the batch transform") {
    val s = spark
    val (dir, static) = docsDirAndStatic()
    val q = functions.Text.langIdentified(
        s.readStream.schema(static.schema).parquet(dir))
      .writeStream.format("memory").queryName("lang_stream_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = s.sql(
        "SELECT doc_id, lang_guess, lang FROM lang_stream_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = functions.Text.langIdentified(static)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("quality scoring under readStream matches the batch transform") {
    val s = spark
    val (dir, static) = docsDirAndStatic()
    val q = functions.Text.qualityScored(
        s.readStream.schema(static.schema).parquet(dir))
      .writeStream.format("memory").queryName("quality_stream_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = s.sql(
        "SELECT doc_id, quality FROM quality_stream_out")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = functions.Text.qualityScored(static)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("PII redaction under readStream matches the batch transform") {
    val s = spark
    val (dir, static) = docsDirAndStatic()
    val q = functions.Text.piiRedacted(
        s.readStream.schema(static.schema).parquet(dir))
      .writeStream.format("memory").queryName("pii_stream_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = s.sql(
        "SELECT doc_id, n_emails, n_phones, redacted_fp FROM pii_stream_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val batch = functions.Text.piiRedacted(static)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(streamed === batch)
    // every doc carries the salted email+phone, so the scrub must fire
    assert(streamed.forall { case (_, e, p, _) => e >= 1 && p >= 1 })
  }
}
