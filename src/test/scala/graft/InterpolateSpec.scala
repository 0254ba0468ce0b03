package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Interpolate

/** Gap-fill semantics: regular grid per series, linear interpolation
 *  between nearest observed buckets, observed buckets pass through.
 */
class InterpolateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val series = {
    val sp = spark
    import sp.implicits._
    // series "a": buckets 0, 1, 4 observed (10s buckets) — 2,3 missing.
    // bucket 1 has two points (mean = 3.0); series "b": single bucket.
    Seq(
      ("a", 1_000_000L, 10.0),
      ("a", 12_000_000L, 2.0), ("a", 15_000_000L, 4.0),
      ("a", 45_000_000L, 9.0),
      ("b", 107_000_000L, 5.0)
    ).toDF("dataset_id", "ts_us", "value")
  }

  private def rows =
    Interpolate.fillLinear(series, 10L)
      .orderBy("dataset_id", "bucket_s")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3)))
      .toMap

  test("observed buckets pass through with filled=false") {
    val m = rows
    assert(m(("a", 0L)) == ((10.0, false)))
    assert(m(("a", 10L)) == ((3.0, false)), "two-point bucket averages")
    assert(m(("a", 40L)) == ((9.0, false)))
    assert(m(("b", 100L)) == ((5.0, false)))
  }

  test("missing buckets linearly interpolate between nearest neighbors") {
    val m = rows
    // between (b=1, 3.0) and (b=4, 9.0): step = 2.0 per bucket
    assert(m(("a", 20L)) == ((5.0, true)))
    assert(m(("a", 30L)) == ((7.0, true)))
  }

  test("grid is exactly first..last observed bucket per series") {
    val m = rows
    assert(m.keys.count(_._1 == "a") == 5)
    assert(m.keys.count(_._1 == "b") == 1)
    assert(!m.contains(("a", 50L)) && !m.contains(("b", 90L)))
  }
}
