package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-fill with linear interpolation over the long series table
 * (`dataset_id, ts_us, value`) — the standard chart/feature-pipeline
 * "align to a regular grid" operator the reference leaves to its
 * client (the frontend simply draws over gaps, public/plot.js): bucket
 * each series at `bucketS`, then fill every missing bucket between a
 * series' first and last observation from its nearest observed
 * neighbors.
 *
 * Scale shape: one hash aggregation (map-side combined) to the bucket
 * grain, then ONE O(n) running `lead` window over the OBSERVED buckets
 * only, then a per-gap explode of the missing buckets. Work is
 * proportional to observed rows + emitted rows; nothing touches an
 * unbounded-FOLLOWING frame (Spark executes those by re-scanning
 * current→end for every row — O(n²) per series) and the full grid is
 * never joined, only generated where a gap exists. The window
 * partitions by series, so work distributes across however many series
 * the corpus has. No driver materialization.
 *
 * Determinism (oracle parity): bucket means use the fixed-point ppm
 * pattern — sum exact integers, divide identical operands — and the
 * interpolation formula `pv + (nv-pv) * ((b-pb)/(nb-pb))` runs the
 * same IEEE operation tree on bit-identical doubles in both engines,
 * so the output is NOT rounded: rounding is what would introduce a
 * tie hazard here, not remove one.
 */
object Interpolate {

  /** Regular-grid gap fill. Output: `dataset_id, bucket_s, v, filled`
   *  for every bucket between each series' first and last observation.
   */
  def fillLinear(long: DataFrame, bucketS: Long): DataFrame = {
    val us = bucketS * 1000000L
    // exact per-bucket mean: integer ppm sum / (cnt · 1e6)
    val r = long
      .withColumn("ppm", round(col("value") * lit(1e6)).cast("long"))
      .groupBy(col("dataset_id"), expr(s"ts_us div ${us}L").as("b"))
      .agg((sum(col("ppm")).cast("double") /
        (count(lit(1)).cast("double") * lit(1e6))).as("v_obs"))

    // consecutive observed pairs per series: a 1-row lookahead (O(n)
    // running frame), computed over OBSERVED buckets only — the grid
    // between them is generated, never joined
    val byDs = Window.partitionBy("dataset_id").orderBy("b")
    val seg = r
      .withColumn("nb", lead(col("b"), 1).over(byDs))
      .withColumn("nv", lead(col("v_obs"), 1).over(byDs))

    val observed = seg.select(
      col("dataset_id"),
      (col("b") * lit(bucketS)).as("bucket_s"),
      col("v_obs").as("v"),
      lit(false).as("filled"))

    // every missing bucket lies strictly inside exactly one observed
    // pair (the grid spans first..last observed); interpolate with the
    // same IEEE tree as before: pv + (nv-pv) * ((b-pb)/(nb-pb))
    val filled = seg
      .where(col("nb").isNotNull && col("nb") > col("b") + lit(1L))
      .select(
        col("dataset_id"), col("b").as("pb"), col("v_obs").as("pv"),
        col("nb"), col("nv"),
        explode(sequence(col("b") + lit(1L), col("nb") - lit(1L))).as("bm"))
      .select(
        col("dataset_id"),
        (col("bm") * lit(bucketS)).as("bucket_s"),
        (col("pv") + (col("nv") - col("pv")) *
          ((col("bm") - col("pb")).cast("double") /
            (col("nb") - col("pb")).cast("double"))).as("v"),
        lit(true).as("filled"))

    observed.unionByName(filled)
  }
}
