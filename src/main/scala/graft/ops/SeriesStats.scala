package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-series statistical analysis over bucketed telemetry: sample
 * autocorrelation, ordinary-least-squares trend (detrend companion),
 * and two-sided integer CUSUM change detection.
 *
 * The reference serves raw series to its frontend and leaves analysis
 * to the client (reference: src/index.py:179-217 range query,
 * public/plot.js); here these are first-class engine operators over the
 * same routed day window the chart would request.
 *
 * Determinism discipline (cross-engine oracle bit-parity):
 *  - bucket means use the fixed-point ppm pattern (exact integer sums /
 *    identical operands), then re-quantize to an integer ppm series
 *    `y = round(mean·10⁶)` — both engines round the SAME double, so y
 *    is integral-exact everywhere downstream;
 *  - ACF and OLS moments are EXACT BigInt sums per series (the DuckDB
 *    oracle mirrors them in HUGEINT) — only the final division touches
 *    floating point, on bit-identical operands;
 *  - CUSUM is pure 64-bit integer arithmetic end to end via the
 *    running-min reformulation (no floats at all, no recursion).
 *
 * Scale: every operator here aggregates to the (series × bucket) grain
 * first — at 100 TB the shuffle carries at most `span/bucketS` rows per
 * series (864 for the day window at 100 s), so cost is bounded by the
 * CATALOG, not the data volume. The per-series sequential parts run in
 * `flatMapGroups` over those bounded groups, parallel across series.
 */
object SeriesStats {

  /** (dataset_id, bucket_s, y) with y = round(bucketMean·10⁶) ppm. */
  private def ppmBuckets(
      long: DataFrame, startUs: Long, endUs: Long, bucketS: Long): DataFrame = {
    val us = bucketS * 1000000L
    long
      .where(col("ts_us").between(startUs, endUs))
      .withColumn("ppm", round(col("value") * lit(1e6)).cast("long"))
      .groupBy(col("dataset_id"),
        (expr(s"ts_us div ${us}L") * lit(bucketS)).as("bucket_s"))
      .agg((sum(col("ppm")).cast("double") /
        (count(lit(1)).cast("double") * lit(1e6))).as("m"))
      .withColumn("y", round(col("m") * lit(1e6)).cast("long"))
      .select("dataset_id", "bucket_s", "y")
  }

  /** Sample autocorrelation r_k for k = 1..maxLag per series, over the
   *  ppm bucket-mean series in [startUs, endUs]:
   *    r_k = Σ_{i≤n−k}(y_i−ȳ)(y_{i+k}−ȳ) / Σ_{i≤n}(y_i−ȳ)²
   *  computed from exact integer moments (multiply through by n²):
   *    num = n²·Σyᵢyᵢ₊ₖ − n·Sy·(Sa+Sb) + (n−k)·Sy²
   *    den = n·(n·Σyᵢ² − Sy²)
   *  Output: dataset_id, lag, n, acf (unrounded — the single division of
   *  bit-identical exact operands needs no tie-hazard rounding).
   */
  def autocorr(
      long: DataFrame, startUs: Long, endUs: Long,
      bucketS: Long, maxLag: Int): DataFrame = {
    val sess = long.sparkSession
    import sess.implicits._
    ppmBuckets(long, startUs, endUs, bucketS)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (id: String, it: Iterator[(String, Long, Long)]) =>
        val y = it.map(p => (p._2, p._3)).toArray.sortBy(_._1).map(_._2)
        val n = y.length
        val nB = BigInt(n)
        val sy = y.foldLeft(BigInt(0))(_ + _)
        val syy = y.foldLeft(BigInt(0))((a, v) => a + BigInt(v) * v)
        val den = nB * (nB * syy - sy * sy)
        (1 to math.min(maxLag, n - 1)).iterator.map { k =>
          var sab, sa, sb = BigInt(0)
          var i = 0
          while (i < n - k) {
            sab += BigInt(y(i)) * y(i + k)
            sa += y(i)
            sb += y(i + k)
            i += 1
          }
          val num = nB * nB * sab - nB * sy * (sa + sb) + BigInt(n - k) * sy * sy
          val acf =
            if (den == 0) 0.0 else num.toDouble / den.toDouble
          (id, k.toLong, n.toLong, acf)
        }
      }
      .toDF("dataset_id", "lag", "n", "acf")
  }

  /** Per-series OLS line over (x = bucket rank 1..n, y = ppm bucket
   *  mean): slope/intercept/r² from exact integer moments.
   *    slope = (n·Σxy − Sx·Sy) / (n·Σx² − Sx²)      [exact ÷ exact]
   *    intercept = (Sy − slope·Sx) / n               [identical IEEE order]
   *    r² = (n·Σxy − Sx·Sy)² / ((n·Σx² − Sx²)·(n·Σy² − Sy²))
   *  slope/intercept are in ppm units per bucket step. Output:
   *  dataset_id, n, slope_ppm, intercept_ppm, r2 (unrounded).
   */
  def olsTrend(
      long: DataFrame, startUs: Long, endUs: Long, bucketS: Long): DataFrame = {
    val sess = long.sparkSession
    import sess.implicits._
    ppmBuckets(long, startUs, endUs, bucketS)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (id: String, it: Iterator[(String, Long, Long)]) =>
        val y = it.map(p => (p._2, p._3)).toArray.sortBy(_._1).map(_._2)
        val n = y.length
        val nB = BigInt(n)
        var sx, sy, sxx, sxy, syy = BigInt(0)
        var i = 0
        while (i < n) {
          val x = BigInt(i + 1)
          val v = BigInt(y(i))
          sx += x; sy += v; sxx += x * x; sxy += x * v; syy += v * v
          i += 1
        }
        val numXy = nB * sxy - sx * sy
        val denX = nB * sxx - sx * sx
        val denY = nB * syy - sy * sy
        val slope = if (denX == 0) 0.0 else numXy.toDouble / denX.toDouble
        val intercept =
          if (n == 0) 0.0 else (sy.toDouble - slope * sx.toDouble) / n.toDouble
        val r2 =
          if (denX == 0 || denY == 0) 0.0
          else (numXy * numXy).toDouble / (denX * denY).toDouble
        (id, n.toLong, slope, intercept, r2)
      }
      .toDF("dataset_id", "n", "slope_ppm", "intercept_ppm", "r2")
  }

  /** Lagged cross-correlation between two named series: Pearson r of
   *  (x_b, y_{b+k·bucketS}) over the common bucket grid for each lag
   *  k ∈ [−maxLag, maxLag] — the "does click lead view?" question.
   *  Same exactness discipline as [[autocorr]]: ppm-integer bucket
   *  means, BigInt moments per lag group (≤ span/bucketS pairs each),
   *  one float division + sqrt on bit-identical operands at the end.
   *  Output: lag, n_pairs, xcorr (unrounded).
   */
  def xcorr(
      long: DataFrame, startUs: Long, endUs: Long, bucketS: Long,
      aSeries: String, bSeries: String, maxLag: Int): DataFrame = {
    val sess = long.sparkSession
    import sess.implicits._
    val pb = ppmBuckets(long, startUs, endUs, bucketS)
    val x = pb.where(col("dataset_id") === aSeries)
      .select(col("bucket_s"), col("y").as("xv"))
    val yv = pb.where(col("dataset_id") === bSeries)
      .select(col("bucket_s").as("yb"), col("y").as("yv"))
    val lags = sess.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("int").as("k"))
    x.crossJoin(broadcast(lags))
      .join(yv, col("yb") === col("bucket_s") + col("k") * lit(bucketS))
      .select(col("k"), col("xv"), col("yv"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (k: Int, it: Iterator[(Int, Long, Long)]) =>
        var n = 0L
        var sx, sy, sxy, sxx, syy = BigInt(0)
        it.foreach { case (_, a, b) =>
          n += 1; sx += a; sy += b
          sxy += BigInt(a) * b; sxx += BigInt(a) * a; syy += BigInt(b) * b
        }
        val nB = BigInt(n)
        val num = nB * sxy - sx * sy
        val denx = nB * sxx - sx * sx
        val deny = nB * syy - sy * sy
        val r =
          if (n == 0 || denx == 0 || deny == 0) 0.0
          else num.toDouble / math.sqrt(denx.toDouble * deny.toDouble)
        (k.toLong, n, r)
      }
      .toDF("lag", "n_pairs", "xcorr")
  }

  /** Two-sided CUSUM change detection over the ppm bucket-mean series —
   *  pure integer arithmetic via the running-min reformulation of
   *    S⁺_i = max(0, S⁺_{i−1} + (y_i − μ − slack))
   *    S⁻_i = max(0, S⁻_{i−1} + (μ − slack − y_i))
   *  With prefix P_i = Σ_{j≤i} y_j and c = μ + slack, unrolling gives
   *  S⁺_i = max_{0≤j≤i} (D_i − D_j) where D_j = P_j − j·c (D_0 = 0), so
   *    S⁺_i = (P_i − i·c) − min(0, min_{1≤j≤i}(P_j − j·c))
   *  (and symmetrically for S⁻): the recurrence becomes one prefix
   *  sum and one running min (INCLUDING the current row; the outer 0 is
   *  the j = 0 term) — plain window functions, distributed, no
   *  recursion, no floats. μ is the series mean re-quantized to ppm
   *  (round of an identical double in both engines).
   *  Output: dataset_id, bucket_s, y, cusum_pos, cusum_neg, alarm.
   */
  def cusum(
      long: DataFrame, startUs: Long, endUs: Long,
      bucketS: Long, slackPpm: Long, thresholdPpm: Long): DataFrame = {
    val y = ppmBuckets(long, startUs, endUs, bucketS)
    val mu = y.groupBy("dataset_id")
      .agg(round(sum(col("y")).cast("double") / count(lit(1))).cast("long").as("mu"))
    val ord = Window.partitionBy("dataset_id").orderBy("bucket_s")
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    y.join(broadcast(mu), Seq("dataset_id"))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("p", sum(col("y")).over(run))
      .withColumn("dpos", col("p") - col("i") * (col("mu") + lit(slackPpm)))
      .withColumn("dneg", col("i") * (col("mu") - lit(slackPpm)) - col("p"))
      .withColumn("cusum_pos",
        col("dpos") - least(lit(0L), min(col("dpos")).over(run)))
      .withColumn("cusum_neg",
        col("dneg") - least(lit(0L), min(col("dneg")).over(run)))
      .withColumn("alarm",
        col("cusum_pos") > thresholdPpm || col("cusum_neg") > thresholdPpm)
      .select("dataset_id", "bucket_s", "y", "cusum_pos", "cusum_neg", "alarm")
  }

  /** SAX-style symbolization on exact rank quartiles: each bucket mean
   *  maps to one of `alphabet` symbols by its RANK within the series —
   *  the distribution-free variant of SAX's Gaussian breakpoints, and
   *  exactly integer-reproducible (no mean/σ floats): sym =
   *  (rank−1)·alphabet div n. Symbol streams feed motif mining and
   *  cheap series clustering. Per-series rank windows over the bounded
   *  bucket grain — the rollup skew/bound argument applies unchanged.
   */
  def saxSymbols(
      long: DataFrame, startUs: Long, endUs: Long,
      bucketS: Long, alphabet: Int): DataFrame = {
    val y = ppmBuckets(long, startUs, endUs, bucketS)
    y.withColumn("rk", row_number()
        .over(Window.partitionBy("dataset_id").orderBy("y", "bucket_s"))
        .cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("dataset_id")))
      .select(col("dataset_id"), col("bucket_s"), col("y"),
        expr(s"((rk - 1) * $alphabet) div n").as("sym"))
  }

  /** Hour-of-day-conditioned anomaly detection: flag buckets whose mean
   *  deviates > 3σ from the series' profile FOR THAT HOUR — the
   *  seasonal-residual upgrade of a global z-score, which a daily-cycle
   *  series fools (every rush hour looks anomalous globally).
   *
   *  The 3σ test is multiplied through to pure integer arithmetic on
   *  the ppm series: with rₙ = n·y − Σy (the residual scaled by n),
   *  |resid| > 3σ ⇔ rₙ² > 9·(n·Σy² − (Σy)²) — exact in decimal(38)/
   *  HUGEINT, zero float-order hazard. Scale: the profile is a
   *  (series × 24)-grain agg with map-side combine over the bucket
   *  grain (itself bounded by span/bucketS per series); the flag join
   *  attaches 24 rows per series back to its buckets on the equi-key.
   */
  def seasonalAnomaly(
      long: DataFrame, startUs: Long, endUs: Long,
      bucketS: Long): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val b = ppmBuckets(long, startUs, endUs, bucketS)
      .withColumn("hour", expr("(bucket_s % 86400) div 3600"))
    val g = b.groupBy("dataset_id", "hour")
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("sy"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
    b.join(g, Seq("dataset_id", "hour"))
      .withColumn("rn", col("y") * col("n") - col("sy"))
      .where(col("rn").cast(dec) * col("rn") >
        lit(9).cast(dec) *
          (col("n").cast(dec) * col("syy") - col("sy").cast(dec) * col("sy")))
      .select(col("dataset_id"), col("bucket_s"), col("y"),
        col("rn").as("resid_n_ppm"), col("n"))
  }
}
