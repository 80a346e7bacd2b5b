package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder contract).
  *
  * Media travel as opaque `binary` columns plus a typed metadata struct —
  * the schema, partitioning, and batch shape are the real, tested part;
  * the codec itself is STUBBED (this environment has no image/audio
  * libraries) behind [[FakeCodec]], a deterministic stand-in with the same
  * signature a real decoder would have.
  *
  * Scale design (100 TB of media):
  *  - Binary payloads stay columnar in Parquet; metadata-only queries never
  *    read the `content` column (column pruning — verified in the plan).
  *  - Decode/feature-extract runs via `mapPartitions` over a typed Dataset:
  *    one iterator pass per partition, no per-row JNI/process setup — the
  *    Scala equivalent of `mapInPandas` batch shape. Heavy codecs amortize
  *    init cost per partition exactly like a Pandas-UDF batch would.
  *  - Feature vectors come back as `array<float>`, feeding the
  *    [[graft.operators.Similarity]] ANN path unchanged.
  */
object Multimodal {

  /** A media row: payload + self-describing metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int, // image/video pixels; audio: 0
      height: Int,
      sample_rate: Int, // audio Hz; image: 0
      duration_ms: Long) // audio/video; image: 0

  /** Extracted features, one row per media row (or per sampled frame). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      byte_mean: Double,
      histogram: Array[Long], // 16-bin byte histogram
      embedding: Array[Float]) // FakeCodec "embedding" of the payload

  /** Deterministic stand-in for the real media codec. A production build
    * replaces these bodies with the actual library calls (JNI ffmpeg,
    * ImageIO, ...) — signatures and batch shape stay identical.
    */
  object FakeCodec {

    /** "Decode" = byte statistics + 16-bin histogram. Deterministic. */
    def decode(content: Array[Byte]): (Double, Array[Long]) = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < content.length) {
        val b = content(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      val mean = if (content.length == 0) 0.0 else sum.toDouble / content.length
      (mean, hist)
    }

    /** "Embed" = fold bytes into a fixed-width float vector (placeholder
      * for a real vision/audio encoder forward pass).
      */
    def embed(content: Array[Byte], dim: Int = 8): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < content.length) {
        acc(i % dim) += (content(i) & 0xff)
        i += 1
      }
      acc.map(v => (v % 997).toFloat / 997f)
    }

    /** Frame sampling stub: every `stride`-th byte window stands in for a
      * decoded video frame.
      */
    def sampleFrames(content: Array[Byte], stride: Int): Iterator[Array[Byte]] =
      content.grouped(stride).zipWithIndex.collect {
        case (chunk, idx) if idx % 2 == 0 => chunk
      }
  }

  /** Feature extraction over a typed media Dataset: one codec instance per
    * partition, streamed row-by-row (mapInPandas-style batching).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Real codecs initialize here, once per partition.
      rows.map { r =>
        val (mean, hist) = FakeCodec.decode(r.content)
        MediaFeatures(r.media_id, r.kind, r.content.length, mean, hist,
          FakeCodec.embed(r.content))
      }
    }
  }

  /** Build a deterministic media table from `documents` (utf-8 payloads) —
    * the corpus ships no binary tables, so the plumbing is exercised on
    * synthesized-but-stable binaries both engines can reproduce
    * (`encode(text)`).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, lit(640)).otherwise(lit(0)).as("width"),
      when(col("doc_id") % 3 === 0, lit(480)).otherwise(lit(0)).as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(0)).as("sample_rate"),
      when(col("doc_id") % 3 =!= 0, col("n_chars") * 10).otherwise(lit(0L))
        .cast("long").as("duration_ms")
    ).as[MediaRow]
  }
}
