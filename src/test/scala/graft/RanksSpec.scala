package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Ranks

/** Global-rank primitive and the sorted-neighborhood dedup built on it. */
class RanksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ranks are contiguous 0..n-1 and follow the sort order across partitions") {
    val sp = spark
    import sp.implicits._
    // keys deliberately out of id order so the range exchange must move rows
    val df = (0L until 1000L).map(id => ((id * 37L) % 1000L, id))
      .toDF("k", "id")
    val out = Ranks.withGlobalRank(df, "rnk", Seq(col("k"), col("id")))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 1000L))
    val keys = out.map(t => (t._2, t._3))
    assert(keys.sliding(2).forall { case Array(a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
  }

  test("ties without a tiebreaker column still yield contiguous distinct ranks") {
    val sp = spark
    import sp.implicits._
    val df = Seq.fill(64)(1L).zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "id")
    val out = Ranks.withGlobalRank(df, "rnk", Seq(col("k"), col("id")))
    assert(out.select("rnk").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 64L))
  }

  test("sorted-neighborhood finds the planted adjacent near-dup pair only") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six"),
      (4L, "red green blue white black grey"),
      (5L, "north south east west up down")
    ).toDF("doc_id", "text")
    val out = Dedup.sortedNeighborhoodPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // shingle sets share 3 of 5 distinct 3-grams: 3/5 = 600000 ppm
    assert(out.toSeq == Seq((1L, 2L, 600000L)))
  }

  test("docs shorter than one shingle never pair") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "aa"))
      .toDF("doc_id", "text")
    assert(Dedup.sortedNeighborhoodPairs(docs).count() == 0L)
  }

  test("SNM recall vs exact high-similarity pairs on the sf documents table") {
    assume(TestSpark.hasData,
      s"dataset ${TestSpark.dataDir} not present — skipping recall check")
    // ground truth: ALL pairs with shingle-Jaccard ≥ 0.5 (exact,
    // df-capped join); SNM finds the subset whose 40-char sort keys
    // land within its w=4 window — near-dups that share a prefix.
    // This is the documented trade: a HARD (w-1)·n candidate bound in
    // exchange for prefix-sensitivity; the measured recall pins the
    // trade so a sort-key regression (e.g. key too short) shows here.
    val d = spark.read.parquet(s"${TestSpark.dataDir}/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val sh = Dedup.shingleSet(d, "doc_id", "text")
    val exact = Dedup.exactJaccardPairs(sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val snm = Dedup.sortedNeighborhoodPairs(d, thresholdPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain high-similarity pairs")
    assert(snm.subsetOf(exact),
      s"SNM must not invent pairs: ${(snm -- exact).take(3)}")
    val recall = snm.size.toDouble / exact.size
    info(f"SNM recall vs exact J>=0.5: $recall%.2f " +
      s"(${snm.size}/${exact.size})")
    assert(recall >= 0.5, f"prefix-window recall collapsed: $recall%.2f")
  }
}
