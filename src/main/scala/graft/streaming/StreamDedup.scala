package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming exact dedup-on-ingest: suppress any document whose content
 * hash was already seen within the watermark horizon — the streaming
 * complement of the batch anti-join dedup (Tables.ingestBatch with
 * dedup) and the `dedup_exact` operator.
 *
 * Deliberately BUILT-IN state, not custom: Spark's
 * `dropDuplicatesWithinWatermark` is exactly this operator — keyed
 * state per hash, first arrival wins, state evicted once the event-time
 * watermark passes (so the state store is bounded by the dedup horizon
 * × ingest rate, not by stream history). Hand-rolling it with
 * `flatMapGroupsWithState` (as Sessionize legitimately must, for
 * gap-close semantics no built-in has) would re-implement the same
 * state machine with none of the operator's incremental-checkpoint
 * maturity.
 *
 * Within one micro-batch, ties among copies of the same hash are
 * arbitrary — irrelevant here because COPIES ARE IDENTICAL in the
 * deduped column set (hash of the content); a caller who needs a
 * deterministic survivor among differing rows with equal keys wants
 * the batch `dedup_exact`/`cluster_canonical` path instead.
 *
 * Re-admission caveat (inherent to ANY bounded-state streaming dedup):
 * a duplicate arriving after the horizon expires is emitted again —
 * the horizon is the explicit contract, matching the batch path's
 * day-range-pruned anti-join.
 */
object StreamDedup {

  /** `docs` must carry (`doc_id`, `text`, `ts_us` epoch-µs). Output:
   *  first occurrence of each distinct text within the horizon.
   */
  def dedupped(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("text"),
        col("ts_us").cast("long").as("ts_us"))
      .withColumn("h", md5(col("text")))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")
      .select("doc_id", "text", "ts_us")
}
