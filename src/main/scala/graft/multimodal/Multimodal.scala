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

  /** Average-hash (aHash) perceptual signature over the stub-decoded
   *  byte grid: 64 cells sampled at evenly-spaced payload positions,
   *  each bit = cell ≥ grid mean (integer-exact: `cell·64 ≥ Σcells`),
   *  packed as two 32-bit words so neither engine shifts into a
   *  BIGINT sign bit. With a real decoder the cells would be 8×8
   *  downsampled luma — the sampling/threshold/packing pipeline is
   *  identical. Small payload edits flip only the cells that sample
   *  near them, so perceptual near-copies land within a few bits.
   */
  def aHash64(blobsText: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explode the 64 cells to ROWS and build the words by aggregation,
    // NOT by nested higher-order lambdas over a shared `cells` alias:
    // projection collapse inlines such an alias into every lambda
    // reference, re-evaluating the 64-substring transform 64× per row
    // (measured 200 s on a 5.5k-doc corpus — a 4096× arithmetic blowup).
    // The explode computes each cell exactly once; the per-media grid
    // sum rides one window over the same shuffle the aggregate needs.
    // shiftleft must shift a BIGINT one: shiftleft(1, 31) in INT
    // arithmetic lands on the sign bit and negates the word.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("media_id")
    blobsText
      .select(col(idCol).cast("long").as("media_id"),
        col(textCol).as("t"), length(col(textCol)).as("n"))
      .where(col("n") > 0)
      .select(col("media_id"),
        posexplode(expr("transform(sequence(0, 63), " +
          "i -> ascii(substring(t, 1 + CAST(i * n DIV 64 AS INT), 1)))"))
          .as(Seq("i", "cell")))
      .withColumn("sumc", sum(col("cell").cast("long")).over(w))
      .groupBy("media_id")
      .agg(
        sum(expr("IF(i < 32 AND cell * 64 >= sumc, " +
          "shiftleft(CAST(1 AS BIGINT), i), 0L)")).as("h0"),
        sum(expr("IF(i >= 32 AND cell * 64 >= sumc, " +
          "shiftleft(CAST(1 AS BIGINT), i - 32), 0L)")).as("h1"))
  }

  /** Perceptual near-dup pairs: 16-bit band blocking over the two hash
   *  words (any shared band ⇒ candidate), then the exact Hamming cut
   *  via bit_count(xor). The pigeonhole GUARANTEES capture for pairs
   *  within 3 flips; 4..maxHamming-flip pairs are found iff the flips
   *  leave some band untouched — the operator's contract (and its
   *  oracle) is exactly these banded-candidate semantics, the standard
   *  SimHash-table trade (more tables ⇔ wider guarantee). Candidate
   *  volume is band-bucket grain — the corpus never self-joins
   *  all-pairs.
   */
  def phashPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col("media_id"), col("h0"), col("h1"),
      explode(expr(
        "array(struct(0 AS band, h0 & 65535 AS key), " +
          "struct(1 AS band, shiftright(h0, 16) & 65535 AS key), " +
          "struct(2 AS band, h1 & 65535 AS key), " +
          "struct(3 AS band, shiftright(h1, 16) & 65535 AS key))")).as("b"))
      .select(col("media_id"), col("h0"), col("h1"),
        col("b.band").as("band"), col("b.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(
        col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        (expr("bit_count(a.h0 ^ b.h0)") + expr("bit_count(a.h1 ^ b.h1)"))
          .cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
