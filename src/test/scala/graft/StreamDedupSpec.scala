package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Multi-batch duplicate suppression: same-batch copies collapse, a
  * cross-batch duplicate within the horizon is dropped, fresh content
  * always passes. 2020-era timestamps (see StreamSessionSpec note).
  */
class StreamDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = 1600000000000000L
  private def us(s: Long): Long = Base + s * 1000000L

  test("first occurrence wins within and across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, Long)]
    val out = StreamDedup.dedupped(
      input.toDF().toDF("doc_id", "text", "ts_us"), horizon = "1 hour")
    val q = out.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: two copies of A in one batch, one B
      input.addData((1L, "doc A", us(0)), (2L, "doc A", us(1)), (3L, "doc B", us(2)))
      q.processAllAvailable()
      val b1 = spark.table("dedup_out").as[(Long, String, Long)].collect()
      assert(b1.map(_._2).sorted.toSeq == Seq("doc A", "doc B"))

      // batch 2: A re-arrives within the horizon → suppressed; C passes
      input.addData((4L, "doc A", us(60)), (5L, "doc C", us(61)))
      q.processAllAvailable()
      val b2 = spark.table("dedup_out").as[(Long, String, Long)].collect()
      assert(b2.count(_._2 == "doc A") == 1, "cross-batch duplicate leaked")
      assert(b2.map(_._2).toSet == Set("doc A", "doc B", "doc C"))
    } finally q.stop()
  }
}
