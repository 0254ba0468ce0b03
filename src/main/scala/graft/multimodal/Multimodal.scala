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
