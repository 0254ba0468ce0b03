package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Excursion, StreamAlert}

/**
 * Deterministic multi-batch exercise of the streaming excursion
 * detector: MemoryStream pins which points arrive per micro-batch so
 * both emission paths are covered — close-by-data (a below-threshold
 * point after an open excursion) and close-by-watermark (the
 * quiet-stream event-time timeout).
 */
class StreamAlertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = 1600000000000000L // 2020-09-13, µs
  private def us(s: Long): Long = Base + s * 1000000L

  private def run(name: String)(
      feed: MemoryStream[(String, Long, Long, Long)] =>
        org.apache.spark.sql.streaming.StreamingQuery => Unit): Set[Excursion] = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val out = StreamAlert.excursions(
      input.toDF().toDF("dataset_id", "ts_us", "ppm", "thr_ppm"),
      watermarkDelay = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try feed(input)(q) finally q.stop()
    spark.table(name).as[Excursion].collect().toSet
  }

  test("excursions close by data and flush by event-time timeout") {
    val got = run("alert_out") { input => q =>
      // series a: above at +0,+10, below at +20 (closes by DATA),
      // above again at +30 (stays open). thr = 100.
      input.addData(
        ("a", us(0), 150L, 100L), ("a", us(10), 180L, 100L),
        ("a", us(20), 50L, 100L), ("a", us(30), 120L, 100L))
      q.processAllAvailable()
      // far-future point on another series advances the watermark →
      // timeout flushes a's open [+30, +30]
      input.addData(("zz", us(10000), 0L, Long.MaxValue))
      q.processAllAvailable()
    }
    assert(got == Set(
      Excursion("a", us(0), us(10), 2L, 180L),
      Excursion("a", us(30), us(30), 1L, 120L)))
  }

  test("an all-below series emits nothing; peaks track the maximum") {
    val got = run("alert_out2") { input => q =>
      input.addData(
        ("b", us(0), 10L, 100L), ("b", us(10), 99L, 100L),
        ("c", us(0), 500L, 100L), ("c", us(5), 900L, 100L),
        ("c", us(9), 600L, 100L))
      q.processAllAvailable()
      input.addData(("zz", us(10000), 0L, Long.MaxValue))
      q.processAllAvailable()
    }
    assert(got == Set(Excursion("c", us(0), us(9), 3L, 900L)))
  }
}
