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

  /** Windowed fixed-grid QUANTILE state: per-(window, bucket) counts on
   *  a PRE-CONFIGURED (lo, hi, b) grid — the streaming leg of the
   *  fixed-grid quantile sketch (Sketches.quantileGridCounts). The
   *  range must be fixed upfront: a stream cannot two-pass for min/max,
   *  which is the documented contract of every fixed-grid sketch (and
   *  why production latency histograms configure their bucket bounds).
   *  State per window is ≤ b counters regardless of event volume;
   *  watermark evicts finalized windows. Quantile extraction (rank
   *  probing the cumulative counts) runs batch-side over the sink —
   *  counts are order-free integer sums, so the streamed state equals
   *  the batch grid bit-for-bit.
   */
  def windowedGridCounts(
      long: DataFrame, widthS: Int, delayS: Int,
      lo: Double, hi: Double, b: Int): DataFrame = {
    require(b >= 2 && b <= 65536 && hi > lo, "bad grid")
    long
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$delayS seconds")
      .withColumn("bucket",
        least(lit(b - 1),
          greatest(lit(0),
            floor((col("value") - lit(lo)) / lit(hi - lo) * b).cast("int"))))
      .groupBy(window(col("ts"), s"$widthS seconds"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_s"),
        col("bucket"), col("cnt"))
  }
}
