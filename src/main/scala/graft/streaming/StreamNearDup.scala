package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/**
 * Streaming NEAR-dup candidate detection — the fuzzy complement of
 * StreamDedup's exact hash suppression: as documents stream in, emit
 * candidate near-duplicate pairs from banded MinHash bucket collisions,
 * without any batch recomputation.
 *
 * Architecture: signatures are computed per-ROW by the codegen'd
 * `MinhashRowSignature` (no stateful aggregation — a streaming groupBy
 * per doc would shuffle and checkpoint every shingle), then band
 * buckets become join keys for Spark's symmetric hash STREAM-STREAM
 * self-join: the state store holds each bucket's recent signatures,
 * keyed by (band, bucket), and the event-time bound + watermark evict
 * state older than the dedup horizon — state is O(doc-rate × horizon),
 * independent of stream length, exactly the interval-join contract
 * StreamJoin documents. The signature-agreement estimate prunes weak
 * collisions BEFORE emission, so downstream (exact verification, or a
 * suppression sink) sees candidate volume, not collision volume.
 *
 * Per-band duplicate emissions of the same pair are inherent to banded
 * LSH (a pair can collide in several bands); they are emitted as-is —
 * a per-pair distinct would be a second stateful operator paying state
 * ∝ pairs, while the downstream batch verify dedups for free.
 *
 * Signatures here are UNCAPPED (no corpus-wide document-frequency cap —
 * a stream cannot know global df); the batch `minhashDedup` caps hot
 * shingles before signing, so streamed candidates parity-check against
 * the uncapped batch pipeline (spec + oracle do exactly that).
 */
object StreamNearDup {

  /** (doc_id, text, ts_us) → (doc_id, mh array<long>, ts timestamp).
   *  Works identically on a stream or a batch frame (the parity spec
   *  relies on that). Shingle-less docs (< 3 tokens) are dropped,
   *  matching the batch path where they produce no signature rows.
   */
  def signatures(docs: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    val shs = array_distinct(TextOps.shinglesOf(TextOps.tokens(col("text")), 3))
    docs
      .select(
        col("doc_id").cast("long").as("doc_id"),
        shs.as("shs"),
        timestamp_micros(col("ts_us").cast("long")).as("ts"))
      .where(size(col("shs")) > 0)
      .select(
        col("doc_id"),
        toCol(graft.functions.MinhashRowSignature(
          toExpr(transform(col("shs"), s => xxhash64(s))),
          toExpr(transform(col("shs"), s => xxhash64(lit("graft-mh2"), s))),
          k)).as("mh"),
        col("ts"))
  }

  /** Banded bucket self-join over signed docs: pairs sharing a band
   *  bucket within `tolS` seconds whose signature-agreement estimate is
   *  ≥ `minEst`. Output (a_id, b_id, est) — per-band duplicates
   *  possible (see scaladoc).
   */
  def candidatePairs(
      sigs: DataFrame, k: Int = 64, bands: Int = 16,
      minEst: Double = 0.25, tolS: Int = 3000, delayS: Int = 30): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), hash(slice(col("mh"), b * r + 1, r)).as("bucket"))
    }
    val wm = s"${tolS + delayS} seconds"
    val buckets = sigs
      .withWatermark("ts", wm)
      .select(col("doc_id"), col("mh"), col("ts"), explode(array(bandCols: _*)).as("bb"))
      .select(
        col("doc_id"), col("mh"), col("ts"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = buckets.select(
      col("doc_id").as("a_id"), col("mh").as("a_mh"), col("ts").as("a_ts"),
      col("band"), col("bucket"))
    val b = buckets.select(
      col("doc_id").as("b_id"), col("mh").as("b_mh"), col("ts").as("b_ts"),
      col("band").as("r_band"), col("bucket").as("r_bucket"))
    val eq = aggregate(
      zip_with(col("a_mh"), col("b_mh"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    val joined = a.join(b,
        col("band") === col("r_band") && col("bucket") === col("r_bucket") &&
          col("b_ts") >= col("a_ts") - expr(s"INTERVAL $tolS SECONDS") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $tolS SECONDS"))
      .withColumn("est", eq.cast("double") / k)
      .select(col("a_id"), col("b_id"), col("est"))
    // NOTHING beyond (keys ∧ time bounds) may reach the join condition:
    // Catalyst pushes Column predicates into it, and any non-temporal
    // conjunct makes StreamingJoinHelper fail to derive the state value
    // watermark — leaving join state UNEVICTABLE. So both the pair
    // ordering (a < b, which also drops the trivial self-collisions)
    // and the est cut live in a TYPED filter — a deserialization
    // barrier the optimizer cannot push through. The per-row object
    // cost applies only to band-collision rows, which the bucket join
    // already made rare.
    val cut = minEst
    joined.filter((r: org.apache.spark.sql.Row) =>
      r.getLong(0) < r.getLong(1) && r.getDouble(2) >= cut)
  }
}
