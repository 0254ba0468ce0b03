package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked event-time window aggregation — the Structured Streaming
 * analytics idiom (in contrast to the ingest path, which deliberately
 * avoids watermarks to honor the reference's unbounded lateness; see
 * StreamIngest). Use this when bounded lateness IS acceptable and the
 * consumer wants finalized per-window aggregates pushed incrementally:
 * append mode emits each (dataset, window) row exactly once, when the
 * watermark passes the window end.
 *
 * Scale shape: state is bounded by (active windows × series) — the
 * watermark evicts finalized windows, so state size is O(lateness ×
 * series), independent of stream length. The aggregation itself is the
 * same mergeable (min/max/sum/cnt) monoid as the batch rollup, computed
 * with map-side partial aggregation per micro-batch.
 */
object StreamWindow {

  /** Tumbling `widthS`-second windows over canonical long form
   *  (dataset_id, ts_us, value), tolerating `delayS` seconds of event
   *  lateness. Output matches the batch rollup shape:
   *  (dataset_id, bucket_s, min_v, max_v, sum_v, cnt).
   */
  def windowedRollup(long: DataFrame, widthS: Int, delayS: Int): DataFrame =
    long
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$delayS seconds")
      .groupBy(col("dataset_id"), window(col("ts"), s"$widthS seconds"))
      .agg(
        min("value").as("min_v"),
        max("value").as("max_v"),
        sum("value").as("sum_v"),
        count(lit(1)).as("cnt"))
      .select(
        col("dataset_id"),
        unix_timestamp(col("window.start")).as("bucket_s"),
        col("min_v"), col("max_v"), col("sum_v"), col("cnt"))
}
