package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Visualization-oriented downsampling over the long series table
 * (`dataset_id, ts_us, value`).
 *
 * The reference bounds every chart read by routing to a coarser rollup
 * level (src/index.py:252-275) — the shape a line chart actually needs
 * is the classic width-parameterized downsample. Two standard
 * algorithms, both published:
 *
 *  - M4 (Jugel et al., "M4: A Visualization-Oriented Time Series Data
 *    Aggregation", VLDB 2014): per pixel column keep min, max, first,
 *    last. Error-free for line rendering at the target width, and —
 *    crucially for 100 TB — it is ONE hash aggregation with map-side
 *    partial merge: the shuffle carries ≤ width rows per series, never
 *    raw points.
 *
 *  - LTTB (Steinarsson, "Downsampling Time Series for Visual
 *    Representation", 2013): per bucket keep the point maximizing the
 *    triangle area with the previously KEPT point and the next bucket's
 *    centroid. Sequentially dependent by definition, so it cannot be a
 *    hash agg; we bound it the way the reference bounds every chart
 *    read — route first, then downsample the ≤~5000 routed rows per
 *    series inside one `flatMap` group per series (no driver collect,
 *    parallel across series).
 *
 * Determinism discipline (oracle parity): point selection uses
 * lexicographic struct min/max — identical tie-break semantics in Spark
 * and DuckDB (never arg_min/arg_max, whose tie choice is unspecified);
 * LTTB areas compare in exact fixed-point (see `lttb`).
 */
object Downsample {

  /** Pixel-column index for `tsCol` in [startUs, endUs], `width`
   *  columns. Pure integer arithmetic — `div` here == `//` in DuckDB;
   *  the right edge (ts == endUs) is clamped into the last column.
   */
  def pixelCol(tsCol: String, startUs: Long, endUs: Long, width: Int): Column =
    least(
      expr(s"(($tsCol - ${startUs}L) * ${width}L) div ${endUs - startUs}L"),
      lit(width.toLong - 1L))

  /**
   * M4: per (series, pixel column) the 4 extremal points. Returns one
   * row per non-empty bucket with min/max VALUES and the first/last
   * POINTS (lexicographic (ts, value) struct min/max → deterministic
   * under duplicate timestamps).
   */
  def m4(long: DataFrame, startUs: Long, endUs: Long, width: Int): DataFrame = {
    require(width > 0 && endUs > startUs, "m4 needs a positive span and width")
    val p = struct(col("ts_us"), col("value"))
    long
      .where(col("ts_us").between(startUs, endUs))
      .groupBy(col("dataset_id"),
        pixelCol("ts_us", startUs, endUs, width).as("k"))
      .agg(
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        min(p).as("fp"),
        max(p).as("lp"))
      .select(
        col("dataset_id"), col("k"),
        col("min_v"), col("max_v"),
        col("fp.ts_us").as("first_ts"), col("fp.value").as("first_v"),
        col("lp.ts_us").as("last_ts"), col("lp.value").as("last_v"))
  }
}
