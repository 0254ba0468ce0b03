package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * A7 / A6 / O2 / P7 — visible-range min/max and the equal-width
 * histogram.
 *
 * The reference renders ≤30 equal-width bars over the points in the
 * visible range, using the mean for aggregated points and the raw value
 * otherwise, with bucket count = min(#distinct values, 30)
 * (reference: public/histogram.js:58-132, max bars public/histogram.js:38;
 * range filter public/histogram.js:68-70; value/mean coalesce
 * public/histogram.js:157-163). Y-axis bounds are min/max over the same
 * in-range points (public/axes.js:118-164).
 *
 * Spark-first: two distributed aggregations — a 1-row stats pass
 * (min/max/distinct), then a groupBy on the computed bucket index. The
 * reference instead sorts all values client-side (histogram.js:73);
 * a sort is exactly what we avoid at scale. The 1-row stats result is
 * cross-joined (broadcast, 1 row) rather than collected so the whole
 * thing stays one lazy plan.
 */
object Histogram {

  /** A6 — min/max of the coalesced value over the visible range. */
  def minMax(points: DataFrame, valueCol: String = "value"): DataFrame =
    points.agg(
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /**
   * A7 — equal-width histogram, ≤ maxBars buckets.
   * Output: (bucket BIGINT, lo, hi DOUBLE, cnt BIGINT), bucket ∈
   * [0, n). The last bucket is closed on both sides (a value equal to
   * the global max falls in bucket n-1), matching the reference's
   * "last bar absorbs the max" single-pass fill (histogram.js:100-120).
   */
  def histogram(points: DataFrame, valueCol: String, maxBars: Int = 30): DataFrame = {
    val v = col(valueCol)
    val stats = points.agg(
      min(v).as("h_min"),
      max(v).as("h_max"),
      count_distinct(v).as("h_distinct"))
    val n = least(col("h_distinct"), lit(maxBars.toLong))
    val width = (col("h_max") - col("h_min")) / n.cast("double")
    points
      .crossJoin(broadcast(stats))
      .withColumn(
        "bucket",
        when(col("h_distinct") <= 1L, lit(0L)).otherwise(
          least(
            floor((v - col("h_min")) / width).cast("long"),
            n - 1L)))
      .groupBy(col("bucket"), col("h_min"), col("h_max"), n.as("n_buckets"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bucket"),
        (col("h_min") + col("bucket") * (col("h_max") - col("h_min")) / col("n_buckets")).as("lo"),
        (col("h_min") + (col("bucket") + 1) * (col("h_max") - col("h_min")) / col("n_buckets")).as("hi"),
        col("cnt"))
  }
}
