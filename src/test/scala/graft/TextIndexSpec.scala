package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextIndex

/**
 * Persisted inverted text index: sharded ingest folds df/stats
 * correctly, torn commits stay invisible, redelivery is exactly-once,
 * and queries prune to the terms' token buckets.
 */
class TextIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "spark merge sort merge"),
    (1L, "window scan window window"),
    (2L, "merge window table"),
    (3L, "totally unrelated words here"),
    (4L, "scan scan scan merge"))
    .toDF("doc_id", "text")

  test("sharded index equals single-shard index; torn commits invisible; buckets prune") {
    val idxA = TestSpark.tmpDir("text_idx_a")
    val idxB = TestSpark.tmpDir("text_idx_b")
    TextIndex.ingestShard(spark, idxA, corpus, "doc_id", "text")
    TextIndex.ingestShard(spark, idxB,
      corpus.where(col("doc_id") < 2), "doc_id", "text", key = Some("s0"))
    TextIndex.ingestShard(spark, idxB,
      corpus.where(col("doc_id") >= 2), "doc_id", "text", key = Some("s1"))
    def run(idx: String) = TextIndex
      .searchBm25(spark, idx, Seq("merge", "window"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val one = run(idxA)
    assert(one == run(idxB),
      "sharded df/stats fold must equal the single-shard index")
    assert(one.map(_._2).toSet == Set(0L, 1L, 2L, 4L), s"got $one")
    // doc 1 matches one term (window ×3), doc 2 matches both once each
    assert(one.find(_._2 == 2L).get._4 == 2L)
    assert(one.find(_._2 == 1L).get._4 == 1L)

    // torn commit: staged dirs with no published version are invisible
    Seq(("merge", 99L, 100L, 100L, 0L)).toDF("token", "doc_id", "tf", "dl", "tb")
      .write.partitionBy("tb").parquet(s"$idxB/data/c-torn/post")
    assert(run(idxB) == one, "torn commit dir leaked into the query")

    // redelivery: exactly-once
    val ex = intercept[IllegalArgumentException] {
      TextIndex.ingestShard(spark, idxB,
        corpus.where(col("doc_id") < 2), "doc_id", "text", key = Some("s0"))
    }
    assert(ex.getMessage.contains("already ingested"))
    assert(run(idxB) == one, "redelivery mutated the index")

    // plan shape: the posting scan must carry a partition filter on the
    // token-bucket column — the directory-pruning contract
    val plan = TextIndex.searchBm25(spark, idxB, Seq("merge"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb#"),
      s"token-bucket pruning missing:\n${plan.take(2000)}")
  }
}
