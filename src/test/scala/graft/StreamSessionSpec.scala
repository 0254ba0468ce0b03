package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Session, Sessionize}

/**
 * Deterministic multi-batch exercise of the flatMapGroupsWithState
 * sessionizer: MemoryStream controls exactly which events arrive in
 * which micro-batch, so both emission paths are pinned — close-by-data
 * (a later event beyond the gap) and close-by-watermark (event-time
 * timeout flushing idle users).
 *
 * Timestamps ride on a 2020-era base: epoch-0-adjacent event times sit
 * at/below the INITIAL watermark (0) and would be dropped as late.
 */
class StreamSessionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = 1600000000000000L // 2020-09-13, µs
  private def us(s: Long): Long = Base + s * 1000000L

  test("sessions close by gap across batches and flush by event-time timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long)]
    val sessions = Sessionize.sessions(
      input.toDF().toDF("user_id", "ts_us"),
      gapUs = 60L * 1000000L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // batch 1: user 1 at +0 s and +30 s (one session), user 2 at +10 s
      input.addData((1L, us(0)), (1L, us(30)), (2L, us(10)))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // nothing closed yet

      // batch 2: user 1 at +200 s — gap 170 s > 60 s closes [+0, +30]
      // by DATA; the same trigger advances the watermark to +200 s, and
      // the follow-up no-data batch fires user 2's event-time TIMEOUT
      // (+10+60 < +200), flushing [+10, +10]
      input.addData((1L, us(200)))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect().toSet
      assert(closed == Set(
        Session(1L, us(0), us(30), 2L),
        Session(2L, us(10), us(10), 1L)))

      // batch 3: a far-future event pushes the watermark past user 1's
      // last+gap — timeout flushes the still-open [+200, +200]
      input.addData((3L, us(10000)))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[Session].collect().toSet
      assert(all.contains(Session(1L, us(200), us(200), 1L)))
    } finally q.stop()
  }

  test("multi-batch incremental result equals one-shot batch sessionization") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // in-order event feed for 3 users split across 3 micro-batches
    val batches: Seq[Seq[(Long, Long)]] = Seq(
      Seq((1L, us(0)), (2L, us(5)), (1L, us(20))),
      Seq((1L, us(100)), (2L, us(30)), (3L, us(50))),
      Seq((1L, us(130)), (2L, us(300))))
    val gapUs = 60L * 1000000L

    val input = MemoryStream[(Long, Long)]
    val q = Sessionize.sessions(
      input.toDF().toDF("user_id", "ts_us"), gapUs, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_inc").outputMode("append").start()
    try {
      for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
      // flush the tail sessions with a watermark push
      input.addData((99L, us(1000000)))
      q.processAllAvailable()

      val streamed = spark.table("sess_inc").as[Session].collect()
        .filter(_.user_id != 99L).toSet

      // batch truth: sort each user's events, split on gap
      val expected = batches.flatten.groupBy(_._1).flatMap { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        val out = scala.collection.mutable.Buffer[Session]()
        var start = ts.head; var last = ts.head; var n = 1L
        for (t <- ts.tail) {
          if (t - last <= gapUs) { last = t; n += 1 }
          else { out += Session(u, start, last, n); start = t; last = t; n = 1 }
        }
        out += Session(u, start, last, n)
        out
      }.toSet
      assert(streamed == expected)
    } finally q.stop()
  }
}
