package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * A1 / A2 / A4 — the multi-resolution rollup pyramid, the heart of the
 * reference engine.
 *
 * The reference aggregates each ingest batch into 6 tumbling-window
 * levels (durations 10^0..10^5 s), bucket key = epoch-aligned window
 * START in whole seconds, `int(int(ts/d)*d)` (reference:
 * src/index.py:277-326), and folds late batches into existing buckets
 * with the (min, max, sum, count) monoid merge (src/index.py:328-374).
 *
 * Spark-first design: `groupBy(dataset_id, bucket)` hash aggregation —
 * Catalyst already does partial (map-side) + final aggregation of this
 * exact monoid, so a 100 TB rollup is one shuffle of pre-combined
 * partials, not a sort. The ingest-time sort the reference needs for
 * its single-pass merge (src/index.py:117-122) is unnecessary here:
 * hash aggregation is order-independent.
 *
 * Schema of every rollup: (dataset_id STRING, bucket_s BIGINT,
 * min_v, max_v, sum_v DOUBLE, cnt BIGINT). `mean = sum_v / cnt` is
 * always derived at read time, never stored (src/index.py:588).
 */
object Rollup {

  val aggCols: Seq[String] =
    Seq("dataset_id", "bucket_s", "min_v", "max_v", "sum_v", "cnt")

  /** Epoch-aligned bucket start, pure integer arithmetic:
   *  bucket_s = (ts_us div (d * 1e6)) * d   (src/index.py:299).
   */
  private def bucketExpr(durationS: Long) =
    expr(s"ts_us div ${durationS * 1000000L}") * durationS

  /** A1 — tumbling-window aggregate of a canonical long DF at one level. */
  def aggregate(long: DataFrame, durationS: Long): DataFrame =
    long
      .groupBy(col("dataset_id"), bucketExpr(durationS).as("bucket_s"))
      .agg(
        min("value").as("min_v"),
        max("value").as("max_v"),
        sum("value").as("sum_v"),
        count(lit(1)).as("cnt"))

  /**
   * A2 — monoid merge of two partial rollups at the same level
   * (src/index.py:328-374). Associative + commutative, so it is safe as
   * a distributed combiner and for unbounded-lateness folds.
   */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    mergePartials(a.unionByName(b))

  /** Re-combine rows that share (dataset_id, bucket_s). */
  def mergePartials(partials: DataFrame): DataFrame =
    partials
      .groupBy(col("dataset_id"), col("bucket_s"))
      .agg(
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        sum("sum_v").as("sum_v"),
        sum("cnt").as("cnt"))

  /**
   * Cascade step: roll a finer level up to a coarser one without
   * touching raw data — valid because (min,max,sum,count) composes
   * (the reference recomputes every level from raw instead,
   * src/index.py:137-177; the cascade reads 10× less input per level).
   */
  def cascade(finer: DataFrame, coarserDurationS: Long): DataFrame =
    finer
      .groupBy(
        col("dataset_id"),
        (expr(s"bucket_s div $coarserDurationS") * coarserDurationS)
          .as("bucket_s"))
      .agg(
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        sum("sum_v").as("sum_v"),
        sum("cnt").as("cnt"))

  /** Projected mean for API reads (S5 / A8 / P8). */
  def withMean(rollup: DataFrame): DataFrame =
    rollup.withColumn("mean_v", col("sum_v") / col("cnt"))
}
