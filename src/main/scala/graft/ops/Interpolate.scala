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
 * grain, then per-series windows. The exploded grid is bounded by
 * span/bucketS per series — a function of TIME, not of raw cardinality
 * — and the windows partition by series, so work distributes across
 * however many series the corpus has. No driver materialization.
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

    // the regular grid spans first..last observed bucket per series
    val grid = r.groupBy("dataset_id")
      .agg(min("b").as("b0"), max("b").as("b1"))
      .select(col("dataset_id"), explode(sequence(col("b0"), col("b1"))).as("b"))

    val byDs = Window.partitionBy("dataset_id").orderBy("b")
    val back = byDs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byDs.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsB = when(col("v_obs").isNotNull, col("b"))

    grid.join(r, Seq("dataset_id", "b"), "left")
      .withColumn("pv", last(col("v_obs"), ignoreNulls = true).over(back))
      .withColumn("pb", last(obsB, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v_obs"), ignoreNulls = true).over(fwd))
      .withColumn("nb", first(obsB, ignoreNulls = true).over(fwd))
      .select(
        col("dataset_id"),
        (col("b") * lit(bucketS)).as("bucket_s"),
        when(col("v_obs").isNotNull, col("v_obs"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("b") - col("pb")).cast("double") /
              (col("nb") - col("pb")).cast("double")))
          .as("v"),
        col("v_obs").isNull.as("filled"))
  }
}
