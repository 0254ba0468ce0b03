package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.Downsample

/**
 * M4 downsample semantics (Jugel et al., VLDB 2014): per pixel column
 * keep min/max values and the first/last points, with deterministic
 * lexicographic tie-break on duplicate timestamps.
 */
class DownsampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // 10-second span, 5 pixel columns of 2 s each, one series.
  private val t0 = TestSpark.isoUs("2024-01-01T00:00:00")
  private def at(s: Double) = t0 + (s * 1e6).toLong

  private lazy val series = {
    val sp = spark
    import sp.implicits._
    Seq(
      // bucket 0: [0,2s) — simple
      ("a", at(0.0), 5.0), ("a", at(1.0), 9.0), ("a", at(1.5), 1.0),
      // bucket 1: [2,4s) — duplicate ts at both edges exercises ties
      ("a", at(2.0), 4.0), ("a", at(2.0), 2.0),
      ("a", at(3.9), 8.0), ("a", at(3.9), 6.0),
      // bucket 3: [6,8s) — bucket 2 left empty on purpose
      ("a", at(6.5), 3.0),
      // right edge: ts == endUs clamps into the last bucket (4)
      ("a", at(10.0), 7.0)
    ).toDF("dataset_id", "ts_us", "value")
  }

  private def m4Rows =
    Downsample.m4(series, t0, at(10.0).longValue, 5)
      .orderBy("dataset_id", "k")
      .collect()
      .map(r => (r.getLong(1), (r.getDouble(2), r.getDouble(3),
        r.getLong(4) -> r.getDouble(5), r.getLong(6) -> r.getDouble(7))))
      .toMap

  test("m4 keeps min/max/first/last per pixel column; empty buckets absent") {
    val rows = m4Rows
    assert(rows.keySet == Set(0L, 1L, 3L, 4L), "bucket 2 is empty, edge clamps to 4")
    val (min0, max0, first0, last0) = rows(0L)
    assert(min0 == 1.0 && max0 == 9.0)
    assert(first0 == (at(0.0) -> 5.0) && last0 == (at(1.5) -> 1.0))
    assert(rows(3L) == ((3.0, 3.0, at(6.5) -> 3.0, at(6.5) -> 3.0)))
    assert(rows(4L)._3 == (at(10.0) -> 7.0), "ts == endUs lands in the last column")
  }

  test("duplicate timestamps tie-break lexicographically on (ts, value)") {
    val (min1, max1, first1, last1) = m4Rows(1L)
    assert(min1 == 2.0 && max1 == 8.0)
    assert(first1 == (at(2.0) -> 2.0), "first = struct-min → smaller value wins the tie")
    assert(last1 == (at(3.9) -> 8.0), "last = struct-max → larger value wins the tie")
  }

  test("m4 output is bounded by 4 points x width per series") {
    val n = Downsample.m4(series, t0, at(10.0).longValue, 5).count()
    assert(n <= 5, "one row per non-empty bucket")
  }

  // ---- LTTB ----------------------------------------------------------

  private def lttbPts(df: org.apache.spark.sql.DataFrame, b: Int) =
    Downsample.lttb(df, t0, at(100.0).longValue, b)
      .orderBy("dataset_id", "ts_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("lttb passes small series (n <= buckets) through whole") {
    val sp = spark
    import sp.implicits._
    val tiny = Seq(("a", at(1.0).longValue, 1.0), ("a", at(2.0).longValue, 5.0))
      .toDF("dataset_id", "ts_us", "value")
    assert(lttbPts(tiny, 3).toSeq ==
      Seq(("a", at(1.0), 1.0), ("a", at(2.0), 5.0)))
  }

  test("lttb keeps first/last, one point per bucket, spike survives") {
    val sp = spark
    import sp.implicits._
    // 20 flat points with one large spike at t=13 — any area-maximizing
    // downsample must keep the spike
    val df = (0 until 20).map { i =>
      ("a", at(i.toDouble).longValue, if (i == 13) 100.0 else 1.0)
    }.toDF("dataset_id", "ts_us", "value")
    val out = lttbPts(df, 6)
    assert(out.length == 6, "exactly nBuckets points for n > buckets")
    assert(out.head._2 == at(0.0) && out.last._2 == at(19.0), "endpoints kept")
    assert(out.exists(p => p._3 == 100.0), "spike selected")
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(identity).toSeq, "time-ordered")
  }

  test("lttb on collinear points is deterministic: first of each bucket") {
    val sp = spark
    import sp.implicits._
    // all areas are zero → strict-> keeps the earliest candidate
    val df = (0 until 12).map(i => ("a", at(i.toDouble).longValue, 2.0 * i))
      .toDF("dataset_id", "ts_us", "value")
    val a = lttbPts(df, 5).toSeq
    val b = lttbPts(df, 5).toSeq
    assert(a == b)
    assert(a.size == 5 && a.head._2 == at(0.0) && a.last._2 == at(11.0))
  }
}
