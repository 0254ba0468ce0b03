package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamWindow

/** Watermarked tumbling-window semantics: append mode emits a window
  * exactly once, only after the watermark passes its end; late data
  * inside the delay still folds in; data later than the watermark is
  * dropped. 2020-era timestamps (see StreamSessionSpec note).
  */
class StreamWindowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = 1600000000000000L
  private def us(s: Double): Long = Base + (s * 1000000L).toLong

  test("append emits finalized windows once; lateness within delay folds in") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(String, Long, Double)]
    val out = StreamWindow.windowedRollup(
      input.toDF().toDF("dataset_id", "ts_us", "value"), widthS = 10, delayS = 5)
    val q = out.writeStream
      .format("memory").queryName("win_out").outputMode("append").start()
    try {
      // batch 1: two points in window [0,10), one in [10,20)
      input.addData(("a", us(1), 1.0), ("a", us(3), 3.0), ("a", us(12), 5.0))
      q.processAllAvailable()
      assert(spark.table("win_out").isEmpty,
        "nothing may emit before the watermark moves")

      // batch 2: a LATE point for [0,10) arriving within the delay
      // (watermark after batch 1 is 12-5=7 < 10, window still open),
      // plus an advancer at t=40 that pushes the watermark to 35
      input.addData(("a", us(8), 2.0), ("a", us(40), 9.0))
      q.processAllAvailable()
      // batch 3: emission applies the watermark a batch behind — nudge
      input.addData(("a", us(41), 0.5))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .as[(String, Long, Double, Double, Double, Long)].collect().sortBy(_._2)
      val base = Base / 1000000L
      assert(rows.map(_._2).toSeq == Seq(base, base + 10),
        s"exactly the two closed windows must emit: ${rows.toSeq}")
      // the late point folded into [0,10): min 1, max 3, sum 6, cnt 3
      assert(rows(0) == (("a", base, 1.0, 3.0, 6.0, 3L)))
      assert(rows(1) == (("a", base + 10, 5.0, 5.0, 5.0, 1L)))

      // batch 4: data behind the watermark (t=2 << 35) is dropped
      input.addData(("a", us(2), 100.0), ("a", us(70), 1.0))
      q.processAllAvailable()
      input.addData(("a", us(71), 1.0))
      q.processAllAvailable()
      val after = spark.table("win_out")
        .as[(String, Long, Double, Double, Double, Long)].collect()
      assert(!after.exists(r => r._2 == base && r._6 == 4L),
        "a point behind the watermark must not reopen its window")
      // the t=40 window [40,50) closed via the t=70/71 advancers
      assert(after.exists(r => r._2 == base + 40 && r._5 == 9.5 && r._6 == 2L))
    } finally q.stop()
  }
}
