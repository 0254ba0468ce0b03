package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as
 * opaque `binary` columns with typed metadata; heavy per-item work
 * (decode, resize, feature extraction) runs batched per partition so a
 * real decoder library would amortize model/codec setup per batch, and
 * the binary payloads never shuffle — metadata extraction is a pure
 * projection.
 *
 * The decode step itself is a clearly-marked deterministic STUB (no
 * image/audio codecs exist in this environment); the Spark-side schema,
 * partitioning, batch shape, and typed output are real and tested.
 */
object Multimodal {

  /** A blob row: payload + the metadata a media pipeline tracks. */
  final case class MediaBlob(media_id: Long, payload: Array[Byte], media_type: String)

  /** Typed result of the (stubbed) decode/feature step. */
  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, width: Long, height: Long, mean_byte: Double)

  /** Wrap a text column as an opaque binary payload column. */
  def toBlob(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** Pure-projection metadata: byte length + derived (fake) dimensions.
   *  Everything here is integer arithmetic on octet_length — cheap,
   *  codegen'd, and computable without touching a decoder.
   */
  def meta(blobs: DataFrame): DataFrame =
    blobs.select(
      col("media_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("width", lit(64L) + pmod(col("n_bytes"), lit(512L)))
      .withColumn("height", lit(64L) + pmod(col("n_bytes") * 7L, lit(512L)))
      .withColumn("n_frames", lit(1L) + pmod(col("n_bytes"), lit(30L)))

  /** Frame sampling: every `stepK`-th frame index per media item,
   *  exploded to one row per sampled frame. Frame count comes from the
   *  metadata projection; the per-frame score is a deterministic stand-
   *  in for a decoded-frame statistic (the decode itself is the stub in
   *  decodeFeatures). The explode is the real plumbing: a video
   *  pipeline's per-frame fan-out happens BEFORE any shuffle, and
   *  downstream work scales with sampled frames, not source bytes.
   */
  def frameSample(blobs: DataFrame, stepK: Int): DataFrame =
    meta(blobs)
      .select(
        col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stepK.toLong)))
          .as("frame_idx"))
      .select(
        col("media_id"), col("frame_idx"),
        pmod(col("n_bytes") * 131L + col("frame_idx") * 31L, lit(997L))
          .as("frame_score"))

  /** Resize plan: target dims + per-axis scale factors and the output
   *  payload size a real resampler would produce. Pure typed projection
   *  — the payload itself never moves or shuffles for planning.
   */
  def resizePlan(blobs: DataFrame, outW: Long, outH: Long): DataFrame =
    meta(blobs).select(
      col("media_id"),
      lit(outW).as("out_w"),
      lit(outH).as("out_h"),
      (lit(outW.toDouble) / col("width")).as("scale_x"),
      (lit(outH.toDouble) / col("height")).as("scale_y"),
      lit(outW * outH * 3L).as("out_bytes"))

  /**
   * Batched "decode" over partitions. A real implementation would hand
   * each partition's payloads to a codec in batches; the stub derives
   * deterministic fake pixels from the payload bytes so the plumbing is
   * testable end-to-end.
   */
  def decodeFeatures(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch => // batch shape: a codec call per ≤64 items
          batch.map { case (id, bytes) =>
            val n = bytes.length.toLong
            // STUB decoder: a real one would produce pixels; this derives
            // deterministic fake stats from the payload itself.
            val head = bytes.take(64)
            val mean =
              if (head.isEmpty) 0.0
              else head.map(b => (b & 0xFF).toDouble).sum / head.length
            MediaFeatures(id, n, 64L + n % 512L, 64L + (n * 7L) % 512L, mean)
          }
        }
      }
  }
}
