package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.text.TextOps

/**
 * Characterization for the round's similarity/curation additions:
 *  - phash banding recall against exhaustive Hamming pairs (the
 *    AnnRecallSpec pattern: approximate candidates vs brute force);
 *  - DSIR weight signal direction on the labeled corpus.
 */
class PhashDsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.dataDir

  test("phash banded candidates: precision 1 after the cut, high recall vs brute force") {
    assume(TestSpark.hasData, s"dataset $sf not present")
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(
      d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 3)"), lit("zzz"))
            .as("text")))
    val sigs = Multimodal.aHash64(corpus, "doc_id", "text").cache()
    try {
      val banded = Multimodal.phashPairs(sigs, maxHamming = 6)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exhaustive ground truth (test-only; the operator never does this)
      val exact = sigs.as("a").join(sigs.as("b"),
          col("a.media_id") < col("b.media_id"))
        .where(expr("bit_count(a.h0 ^ b.h0) + bit_count(a.h1 ^ b.h1)") <= 6)
        .select(col("a.media_id"), col("b.media_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded.subsetOf(exact), "no false positives after the Hamming cut")
      assert(exact.nonEmpty, "planted near-copies must exist")
      val recall = banded.size.toDouble / exact.size
      assert(recall >= 0.9, s"banding recall $recall below 0.9 " +
        s"(${banded.size}/${exact.size})")
    } finally sigs.unpersist(): Unit
  }

  test("DSIR weights point toward the target slice") {
    assume(TestSpark.hasData, s"dataset $sf not present")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = TextOps.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("sum_w_ppm").cast("double") / col("n_tok")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"mean per-token weight: en ${w(true)} must exceed non-en ${w(false)}")
    assert(w(true) > 0 && w(false) < 0,
      "target slice scores positive, complement negative on average")
  }
}
