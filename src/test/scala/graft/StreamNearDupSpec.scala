package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.streaming.StreamNearDup

/**
 * Streaming near-dup candidates: the per-row codegen signature must
 * equal the batch aggregate signature on identical shingle sets, and a
 * near-duplicate arriving in a LATER micro-batch must still pair with
 * the earlier doc through the banded bucket join's state.
 */
class StreamNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = 1600000000000000L
  private def us(s: Long): Long = Base + s * 1000000L

  private val doc =
    "the quick brown fox jumps over the lazy dog again and again today"

  test("per-row signature equals the batch aggregate signature") {
    import spark.implicits._
    val docs = Seq(
      (0L, doc, us(0)),
      (1L, "completely different words about spark catalyst tungsten shuffles", us(1)))
      .toDF("doc_id", "text", "ts_us")
    val perRow = StreamNearDup.signatures(docs)
      .select("doc_id", "mh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // batch path: shingle rows (uncapped) → MinhashSignatureAgg
    val sh = Dedup.shingleSet(
      docs.select("doc_id", "text"), "doc_id", "text", maxDf = 1000000L)
    val agg = Dedup.minhashSignature(sh, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(perRow == agg)
  }

  test("a cross-batch near-dup pairs through banded bucket state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, Long)]
    val cands = StreamNearDup.candidatePairs(
      StreamNearDup.signatures(
        input.toDF().toDF("doc_id", "text", "ts_us")),
      tolS = 3600)
    val q = cands.writeStream
      .format("memory").queryName("nd_out").outputMode("append").start()
    try {
      // batch 1: the original and one unrelated doc — no pairs yet
      input.addData(
        (0L, doc, us(0)),
        (9L, "completely different words about spark catalyst tungsten shuffles", us(5)))
      q.processAllAvailable()
      assert(spark.table("nd_out").isEmpty)

      // batch 2: a near-dup of doc 0 arrives later — must pair with the
      // batch-1 signature held in join state
      input.addData((1L, doc + " extra", us(60)))
      q.processAllAvailable()
      val pairs = spark.table("nd_out")
        .select("a_id", "b_id").distinct().as[(Long, Long)].collect().toSet
      assert(pairs == Set((0L, 1L)))
    } finally q.stop()
  }
}
