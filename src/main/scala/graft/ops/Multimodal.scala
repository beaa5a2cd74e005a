package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (LLM-pipeline mandate): media payloads as
  * opaque BINARY columns with typed metadata, processed by a
  * per-partition decode/feature-extract stage.
  *
  * The decode step is a STUB — this container has no image/audio codecs
  * — but everything Spark-side is real: the schema (binary payload +
  * metadata struct), the partition-parallel `mapPartitions` decode stage
  * (the Scala analogue of `mapInPandas` batch UDFs), and the
  * deterministic feature output. A real deployment swaps
  * `StubCodec.decodeFeatures` for an actual codec; nothing else changes.
  */
object Multimodal {

  /** One media row: payload plus typed metadata, as a training-data
    * pipeline would store frames/clips alongside provenance. */
  final case class MediaRow(
      media_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, histogram: Array[Long],
      frame_samples: Array[Long])

  /** Deterministic stand-in for an image/audio decoder. */
  object StubCodec {
    /** "Decode" = 16-bin byte histogram + 3 sampled "frames"
      * (first/middle/last byte). Deterministic; a real codec returns
      * real features with the same shape. */
    def decodeFeatures(r: MediaRow): MediaFeatures = {
      val hist = new Array[Long](16)
      r.payload.foreach(b => hist((b & 0xff) >> 4) += 1)
      val samples =
        if (r.payload.isEmpty) Array.empty[Long]
        else Array(
          (r.payload(0) & 0xffL),
          (r.payload(r.payload.length / 2) & 0xffL),
          (r.payload(r.payload.length - 1) & 0xffL))
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hist, samples)
    }
  }

  /** Synthesize a media table from `documents` (text bytes as payload —
    * the container ships no real media; the column types are the point). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      col("text").cast("binary").as("payload"))

  /** Feature extraction over media rows: partition-parallel decode, no
    * shuffle until the final per-kind aggregation. At 100 TB the decode
    * stage scales linearly with partitions; the payload never crosses a
    * shuffle boundary (only the small feature vectors do). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.map(StubCodec.decodeFeatures))
      .toDF()
  }

  /** q35 — multimodal feature pipeline: synthesize → decode (stub) →
    * per-kind aggregate of feature statistics. Driver check is
    * rows-only (no oracle: the stub codec is engine-specific). */
  def q35MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(mediaTable(spark, dir))
      .withColumn("hist_peak_bin",
        expr("array_position(histogram, array_max(histogram))").cast("bigint"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("hist_peak_bin")).as("min_peak_bin"),
        max(col("hist_peak_bin")).as("max_peak_bin"))
      .orderBy("kind")
  }
}
