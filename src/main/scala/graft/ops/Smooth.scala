package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exponentially-weighted moving average over per-series bucket means —
 * the classic telemetry smoothing the reference's frontend leaves to
 * the chart (public/plot.js draws raw series); here it is a first-class
 * engine operator.
 *
 * EWMA is sequentially dependent (`s_i = α·v_i + (1−α)·s_{i−1}`), so
 * like LTTB it runs per series inside `flatMapGroups` over a BOUNDED
 * routed range (span/bucketS buckets per series), parallel across
 * series, nothing driver-side.
 *
 * Determinism (oracle parity): bucket means use the fixed-point ppm
 * pattern (exact integer sums / identical operands), α is a
 * binary-exact literal, and the engine evaluates the recurrence with
 * the same IEEE operation order the oracle's recursive CTE does —
 * `α·v + (1−α)·s` — so every smoothed value is bit-identical and the
 * output is deliberately unrounded (rounding would ADD a tie hazard,
 * not remove one).
 */
object Smooth {

  /** Per-series EWMA of `bucketS`-second bucket means over
   *  [startUs, endUs]. `alpha` must be binary-exact (0.25, 0.5, …) for
   *  cross-engine bit parity. Output: dataset_id, bucket_s, ewma.
   */
  def ewma(
      long: DataFrame, startUs: Long, endUs: Long,
      bucketS: Long, alpha: Double): DataFrame = {
    val sess = long.sparkSession
    import sess.implicits._
    val us = bucketS * 1000000L
    val beta = 1.0 - alpha
    long
      .where(col("ts_us").between(startUs, endUs))
      .withColumn("ppm", round(col("value") * lit(1e6)).cast("long"))
      .groupBy(col("dataset_id"), (expr(s"ts_us div ${us}L") * lit(bucketS)).as("bucket_s"))
      .agg((sum(col("ppm")).cast("double") /
        (count(lit(1)).cast("double") * lit(1e6))).as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (id: String, it: Iterator[(String, Long, Double)]) =>
        val buckets = it.map(p => (p._2, p._3)).toArray.sortBy(_._1)
        var s = 0.0
        var first = true
        buckets.iterator.map { case (b, v) =>
          s = if (first) { first = false; v } else alpha * v + beta * s
          (id, b, s)
        }
      }
      .toDF("dataset_id", "bucket_s", "ewma")
  }

  /** Per-series HOLT linear (double-exponential) smoothing: level +
   *  trend state, one-step-ahead forecast = level + trend. Same
   *  execution and determinism discipline as [[ewma]]: bounded routed
   *  range, flatMapGroups per series, fixed-point bucket means,
   *  binary-exact α/β, and the recurrence evaluated in the exact IEEE
   *  operation order the oracle's recursive CTE spells out
   *  (`s' = α·v + (1−α)·(s + t)`, then `t' = β·(s' − s) + (1−β)·t`).
   *  Init: s₁ = v₁, t₁ = 0. Output: dataset_id, bucket_s, level,
   *  trend, forecast (unrounded, like ewma).
   */
  def holt(
      long: DataFrame, startUs: Long, endUs: Long,
      bucketS: Long, alpha: Double, beta: Double): DataFrame = {
    val sess = long.sparkSession
    import sess.implicits._
    val us = bucketS * 1000000L
    long
      .where(col("ts_us").between(startUs, endUs))
      .withColumn("ppm", round(col("value") * lit(1e6)).cast("long"))
      .groupBy(col("dataset_id"), (expr(s"ts_us div ${us}L") * lit(bucketS)).as("bucket_s"))
      .agg((sum(col("ppm")).cast("double") /
        (count(lit(1)).cast("double") * lit(1e6))).as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (id: String, it: Iterator[(String, Long, Double)]) =>
        val buckets = it.map(p => (p._2, p._3)).toArray.sortBy(_._1)
        var s = 0.0
        var t = 0.0
        var first = true
        buckets.iterator.map { case (b, v) =>
          if (first) { first = false; s = v; t = 0.0 }
          else {
            val sPrev = s
            s = alpha * v + (1.0 - alpha) * (s + t)
            t = beta * (s - sPrev) + (1.0 - beta) * t
          }
          (id, b, s, t, s + t)
        }
      }
      .toDF("dataset_id", "bucket_s", "level", "trend", "forecast")
  }
}
