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

  /** SQL-round-compatible half-away-from-zero ppm fixed-point (Scala's
   *  `math.round` is half-towards-+∞ and would diverge on negatives).
   */
  private def ppm(v: Double): Long = {
    val s = v * 1e6
    if (s >= 0) math.floor(s + 0.5).toLong else math.ceil(s - 0.5).toLong
  }

  /**
   * LTTB (Steinarsson 2013): keep first and last point; split the
   * middle points into `nBuckets - 2` equal-COUNT buckets and from each
   * keep the point forming the largest triangle with the previously
   * kept point and the NEXT bucket's centroid.
   *
   * Sequential by definition (each pick depends on the previous), so it
   * runs inside one `flatMapGroups` per series — bounded input because
   * callers route the visible range first (§3.1: ≤ ~5000 points per
   * series), parallel across series, nothing on the driver.
   *
   * Determinism: areas are exact integers — x in µs offset from
   * `startUs`, y in ppm fixed point, the next-bucket centroid folded in
   * scaled by its point count (`nc·area` preserves the argmax) — and
   * BigInt (engine) mirrors HUGEINT (oracle), with ties broken toward
   * the smallest (ts, value). No float ever enters a comparison.
   */
  def lttb(long: DataFrame, startUs: Long, endUs: Long, nBuckets: Int): DataFrame = {
    require(nBuckets >= 3, "lttb needs at least first/middle/last buckets")
    val sess = long.sparkSession
    import sess.implicits._
    val m = nBuckets - 2
    long
      .where(col("ts_us").between(startUs, endUs))
      .select(col("dataset_id"), col("ts_us"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (id: String, it: Iterator[(String, Long, Double)]) =>
        val pts = it.map(p => (p._2, p._3)).toArray
          .sorted(Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering))
        val n = pts.length
        if (n <= nBuckets) pts.iterator.map(p => (id, p._1, p._2))
        else {
          val xs = pts.map(_._1 - startUs)
          val ys = pts.map(p => ppm(p._2))
          // index bucket j holds points lo(j)..hi(j): the exact inverse
          // of `j = ⌊(i-1)·m / (n-2)⌋` (the oracle's assignment), which
          // makes the bounds CEIL divisions — floor bounds are NOT the
          // same split when (n-2)/m is fractional
          def ceilDiv(a: Long, b: Long) = ((a + b - 1) / b).toInt
          def lo(j: Int) = ceilDiv(j.toLong * (n - 2), m) + 1
          def hi(j: Int) = ceilDiv((j + 1).toLong * (n - 2), m)
          val out = new scala.collection.mutable.ArrayBuffer[(String, Long, Double)](nBuckets)
          out += ((id, pts(0)._1, pts(0)._2))
          var a = 0 // previously kept point
          var j = 0
          while (j < m) {
            // next anchor: centroid of bucket j+1, scaled by its count;
            // the final middle bucket anchors on the last point
            var sx = BigInt(0); var sy = BigInt(0); var nc = 0L
            if (j == m - 1) { sx = BigInt(xs(n - 1)); sy = BigInt(ys(n - 1)); nc = 1L }
            else {
              var i = lo(j + 1); val h = hi(j + 1)
              while (i <= h) { sx += xs(i); sy += ys(i); nc += 1; i += 1 }
            }
            val xa = BigInt(xs(a)); val ya = BigInt(ys(a))
            val t1 = nc * xa - sx // nc·x_a − Σx
            val t2 = sy - nc * ya // Σy − nc·y_a
            var best = -1
            var bestArea = BigInt(-1)
            var i = lo(j); val h = hi(j)
            while (i <= h) {
              // nc · triangle area(prev, candidate, centroid), exact
              val area = (t1 * (BigInt(ys(i)) - ya) - (xa - BigInt(xs(i))) * t2).abs
              if (area > bestArea) { bestArea = area; best = i } // strict: first wins ties
              i += 1
            }
            out += ((id, pts(best)._1, pts(best)._2))
            a = best
            j += 1
          }
          out += ((id, pts(n - 1)._1, pts(n - 1)._2))
          out.iterator
        }
      }
      .toDF("dataset_id", "ts_us", "value")
  }
}
