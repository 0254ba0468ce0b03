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
    // The whole tokens→shingles→hashes→mins pipeline is ONE expression
    // (MinhashRowSignature): an expression-composition formulation
    // re-splits the document per shingle element and re-builds the
    // shingle array per reference after projection collapse — measured
    // 10×+ the entire signing cost at sf0.1 (see the expression's
    // scaladoc). The shingle-less-doc filter tests the cheap token
    // count, the only other tokenization.
    docs
      .where(size(TextOps.tokens(col("text"))) >= 3)
      .select(
        col("doc_id").cast("long").as("doc_id"),
        toCol(graft.functions.MinhashRowSignature(
          toExpr(TextOps.tokens(col("text"))), k)).as("mh"),
        timestamp_micros(col("ts_us").cast("long")).as("ts"))
  }

  /** Banded bucket self-join over signed docs: pairs sharing a band
   *  bucket within `tolS` seconds. Output (a_id, b_id) — per-band
   *  duplicates possible (see scaladoc).
   *
   *  The signature itself is NOT carried through the join: a
   *  stream-stream join stores each side's input rows in the state
   *  store (snapshot-committed per micro-batch), and a 64-long
   *  signature is ~500 B/row where the id+time projection is ~25 B —
   *  measured 25%+ of the whole pipeline's wall time at sf0.1. The
   *  signature-agreement estimate therefore moves to the verifier
   *  (which exact-verifies candidates anyway); a variant that prunes
   *  in-stream would pay the wide state back. This is the same
   *  narrow-state discipline as StreamJoin: state carries keys and
   *  event times, nothing payload-sized.
   */
  def candidatePairs(
      sigs: DataFrame, k: Int = 64, bands: Int = 16,
      tolS: Int = 3000, delayS: Int = 30): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    require(k % bands == 0, "bands must divide k")
    val wm = s"${tolS + delayS} seconds"
    // MinhashBandBuckets references the signature ONCE — a per-band
    // hash(slice(mh, …)) array would inline the whole upstream signing
    // expression `bands` times after projection collapse (see the
    // expression's scaladoc; measured 16× per-doc signing cost here)
    val buckets = sigs
      .withWatermark("ts", wm)
      .select(
        col("doc_id"), col("ts"),
        posexplode(toCol(graft.functions.MinhashBandBuckets(
          toExpr(col("mh")), bands))).as(Seq("band", "bucket")))
    val a = buckets.select(
      col("doc_id").as("a_id"), col("ts").as("a_ts"),
      col("band"), col("bucket"))
    val b = buckets.select(
      col("doc_id").as("b_id"), col("ts").as("b_ts"),
      col("band").as("r_band"), col("bucket").as("r_bucket"))
    val joined = a.join(b,
        col("band") === col("r_band") && col("bucket") === col("r_bucket") &&
          col("b_ts") >= col("a_ts") - expr(s"INTERVAL $tolS SECONDS") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $tolS SECONDS"))
      .select(col("a_id"), col("b_id"))
    // NOTHING beyond (keys ∧ time bounds) may reach the join condition:
    // Catalyst pushes Column predicates into it, and any non-temporal
    // conjunct makes StreamingJoinHelper fail to derive the state value
    // watermark — leaving join state UNEVICTABLE. So the pair ordering
    // (a < b, which also drops the trivial self-collisions) lives in a
    // TYPED filter — a deserialization barrier the optimizer cannot
    // push through.
    joined.filter((r: org.apache.spark.sql.Row) => r.getLong(0) < r.getLong(1))
  }
}
