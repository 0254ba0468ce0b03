package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SeriesStats

/** ACF / OLS / CUSUM semantics over per-series bucket means. */
class SeriesStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val t0 = TestSpark.isoUs("2024-01-01T00:00:00")

  /** one point per 10s bucket so bucket mean == value */
  private def series(vals: Double*) = {
    val sp = spark
    import sp.implicits._
    vals.zipWithIndex
      .map { case (v, i) => ("a", t0 + i * 10_000_000L, v) }
      .toDF("dataset_id", "ts_us", "value")
  }

  test("autocorr of a linear ramp matches the closed form") {
    // y = 1..6 ppm-scaled; ACF_1 of 1..n with the biased estimator:
    // r_k = Σ(y_i−ȳ)(y_{i+k}−ȳ)/Σ(y_i−ȳ)². For n=6, k=1:
    // deviations (-2.5,-1.5,-0.5,.5,1.5,2.5)·1e6 ppm;
    // num = Σ d_i d_{i+1} = 3.75+0.75-0.25+0.75+3.75 = 8.75; den = 17.5
    val out = SeriesStats.autocorr(
      series(1, 2, 3, 4, 5, 6), t0, t0 + 60_000_000L, 10L, 2)
      .orderBy("lag").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(math.abs(out(0).getDouble(3) - 0.5) < 1e-12) // 8.75/17.5
    // k=2: num = Σ d_i d_{i+2} = (-2.5·-0.5)+(-1.5·0.5)+(-0.5·1.5)+(0.5·2.5)
    //          = 1.25-0.75-0.75+1.25 = 1.0 → 1/17.5
    assert(math.abs(out(1).getDouble(3) - 1.0 / 17.5) < 1e-12)
  }

  test("autocorr caps lags at n-1 and zero-variance series yield 0") {
    val out = SeriesStats.autocorr(
      series(7, 7, 7), t0, t0 + 30_000_000L, 10L, 5)
      .orderBy("lag").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // n=3 → lags 1,2
    assert(out.forall(_.getDouble(3) == 0.0))
  }

  test("olsTrend recovers an exact line with r2 = 1") {
    // y = 3 + 2x over x=1..5 (bucket means 5,7,9,11,13)
    val out = SeriesStats.olsTrend(
      series(5, 7, 9, 11, 13), t0, t0 + 50_000_000L, 10L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2) - 2e6) < 1e-6) // slope in ppm
    assert(math.abs(r.getDouble(3) - 3e6) < 1e-6) // intercept in ppm
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("xcorr peaks at the true lead-lag offset") {
    val sp = spark
    import sp.implicits._
    // series b is a shifted one bucket later: at lag +1 the pairs are
    // (v, v) → r = 1; at lag 0 the pairs are misaligned noise
    val va = Seq(1.0, 5.0, 2.0, 8.0, 3.0)
    val rows =
      va.zipWithIndex.map { case (v, i) => ("a", t0 + i * 10_000_000L, v) } ++
      va.zipWithIndex.map { case (v, i) => ("b", t0 + (i + 1) * 10_000_000L, v) }
    val df = rows.toDF("dataset_id", "ts_us", "value")
    val out = graft.ops.SeriesStats.xcorr(
      df, t0, t0 + 80_000_000L, 10L, "a", "b", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 5L)
    assert(math.abs(out(1L)._2 - 1.0) < 1e-12, s"lag1 should be perfect: $out")
    assert(out(0L)._1 == 4L) // overlap shrinks off the true lag
    assert(out(0L)._2 < 0.9)
  }

  test("cusum accumulates drift above slack and resets at zero") {
    // flat 10.0 then a +4 step; μ(ppm)=12e6, slack=1e6.
    // y−μ−slack per bucket (ppm): pre-step -3e6 (clamps at 0),
    // post-step +1e6 per bucket → cusum_pos ramps 1e6, 2e6, 3e6.
    val out = SeriesStats.cusum(
      series(10, 10, 10, 14, 14, 14), t0, t0 + 60_000_000L, 10L,
      slackPpm = 1000000L, thresholdPpm = 2500000L)
      .orderBy("bucket_s").collect()
    assert(out.map(_.getLong(3)).toSeq ==
      Seq(0L, 0L, 0L, 1000000L, 2000000L, 3000000L))
    // negative side mirrors: μ−slack−y = +1e6 pre-step
    assert(out.map(_.getLong(4)).toSeq ==
      Seq(1000000L, 2000000L, 3000000L, 0L, 0L, 0L))
    assert(out.map(_.getBoolean(5)).toSeq ==
      Seq(false, false, true, false, false, true))
  }

  test("seasonal anomaly flags a >3σ bucket within its own hour") {
    // 21 buckets in one hour: 20 at 10.0, one at 100.0. A single
    // outlier among n−1 equals sits at exactly resid/σ = √(n−1)
    // regardless of magnitude — for n=21 that is √20 ≈ 4.5σ → flagged
    // (n=10 would be 3σ exactly, the > comparison's knife edge); the
    // 20 constants sit far inside.
    val vals = Seq.fill(20)(10.0) :+ 100.0
    val out = SeriesStats.seasonalAnomaly(
      series(vals: _*), t0, t0 + 210_000_000L, 10L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 100000000L) // y ppm of the outlier
    // rn = n·y − Σy = 21·1e8 − (20·1e7 + 1e8) = 18e8
    assert(out.head.getLong(3) == 1800000000L)
  }

  test("seasonal anomaly: zero-variance hours never flag") {
    val out = SeriesStats.seasonalAnomaly(
      series(Seq.fill(12)(5.0): _*), t0, t0 + 120_000_000L, 10L)
      .collect()
    assert(out.isEmpty)
  }
}
