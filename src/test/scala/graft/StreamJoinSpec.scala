package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream interval join semantics: same-key rows within the
  * tolerance match (including across micro-batches, from buffered
  * state), different keys and out-of-tolerance rows never match.
  * 2020-era timestamps (see StreamSessionSpec note).
  */
class StreamJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = 1600000000000000L
  private def ts(s: Long) = new java.sql.Timestamp((Base + s * 1000000L) / 1000L)

  test("interval join matches within tolerance across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val left = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoin(
      left.toDF().toDF("p_id", "user_id", "p_ts"),
      right.toDF().toDF("user_id", "v_ts"),
      "user_id", "p_ts", "v_ts", tolS = 30)
    val q = joined.writeStream
      .format("memory").queryName("sj_out").outputMode("append").start()
    try {
      // batch 1: purchase u1@100; views u1@90 (in), u1@10 (out), u2@100
      // (wrong user)
      left.addData((1L, 1L, ts(100)))
      right.addData((1L, ts(90)), (1L, ts(10)), (2L, ts(100)))
      q.processAllAvailable()
      val b1 = spark.table("sj_out")
        .select(col("p_id"), unix_micros(col("v_ts"))).as[(Long, Long)].collect()
      assert(b1.toSet == Set((1L, Base + 90000000L)),
        s"exactly the in-tolerance same-user view must match: ${b1.toSeq}")

      // batch 2: a view for u1@120 arrives later — the buffered purchase
      // from batch 1 must still match it (symmetric state)
      right.addData((1L, ts(120)))
      q.processAllAvailable()
      val b2 = spark.table("sj_out")
        .select(col("p_id"), unix_micros(col("v_ts"))).as[(Long, Long)].collect()
      assert(b2.map(_._2).toSet ==
        Set(Base + 90000000L, Base + 120000000L), s"cross-batch match lost: ${b2.toSeq}")

      // batch 3: a new purchase matches a view buffered since batch 1
      left.addData((2L, 2L, ts(95)))
      q.processAllAvailable()
      val b3 = spark.table("sj_out")
        .select(col("p_id"), col("user_id")).as[(Long, Long)].collect()
      assert(b3.count(_._1 == 2L) == 1, s"buffered right row not joined: ${b3.toSeq}")
    } finally q.stop()
  }
}
