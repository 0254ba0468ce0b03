package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Smooth

/** EWMA recurrence semantics: seed with the first bucket mean, then
 *  s = α·v + (1−α)·s per bucket, per series, time-ordered.
 */
class SmoothSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ewma seeds on the first bucket and folds the recurrence in order") {
    val sp = spark
    import sp.implicits._
    val t0 = TestSpark.isoUs("2024-01-01T00:00:00")
    // 10s buckets: means 2.0, (4+8)/2=6.0, 10.0
    val df = Seq(
      ("a", t0, 2.0),
      ("a", t0 + 10_000_000L, 4.0), ("a", t0 + 11_000_000L, 8.0),
      ("a", t0 + 20_000_000L, 10.0)
    ).toDF("dataset_id", "ts_us", "value")
    val out = Smooth.ewma(df, t0, t0 + 30_000_000L, 10L, 0.5)
      .orderBy("bucket_s").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(2.0, 4.0, 7.0), s"got $out") // 2; .5·6+.5·2=4; .5·10+.5·4=7
  }

  test("series are independent and out-of-range points are excluded") {
    val sp = spark
    import sp.implicits._
    val t0 = TestSpark.isoUs("2024-01-01T00:00:00")
    val df = Seq(
      ("a", t0, 1.0), ("b", t0, 100.0),
      ("a", t0 - 10_000_000L, 999.0) // before the window
    ).toDF("dataset_id", "ts_us", "value")
    val out = Smooth.ewma(df, t0, t0 + 10_000_000L, 10L, 0.25)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == Map("a" -> 1.0, "b" -> 100.0))
  }
}
