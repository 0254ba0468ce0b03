package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curate.Mixing
import graft.dedup.Dedup

/**
 * Randomized cross-checks for the session-3 curation operators against
 * independent in-memory reference implementations: substring dup spans
 * vs a brute-force window scan, domainMix vs its closed-form feasibility
 * invariants, and the per-row MinHash signature vs the aggregate on
 * random corpora. Seeded RNG — failures reproduce.
 */
class CurationPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  test("substringDupSpans matches a brute-force window scan on random corpora") {
    val k = 5
    for (round <- 0 until 8) {
      val nDocs = 3 + rnd.nextInt(4)
      val docs = (0 until nDocs).map { i =>
        val len = k + rnd.nextInt(25)
        (i.toLong, Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString)
      }
      // brute force: per doc the distinct k-windows; dup = shared with
      // another doc
      val winSets = docs.map { case (id, t) =>
        id -> t.sliding(k).toSet
      }.toMap
      val expect = winSets.flatMap { case (id, ws) =>
        val dup = ws.count(w => winSets.exists { case (o, ows) => o != id && ows(w) })
        if (dup == 0) None
        else Some((id, ws.size.toLong, dup.toLong,
          math.round(dup.toDouble / ws.size * 1e6)))
      }.toSet
      val got = Dedup.substringDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expect, s"round $round corpus: $docs")
    }
  }

  test("domainMix satisfies the feasibility invariants on random inputs") {
    for (round <- 0 until 8) {
      val nSrc = 2 + rnd.nextInt(5)
      val rows = (0 until nSrc).flatMap { s =>
        (0 to rnd.nextInt(3)).map(_ => (s"src$s", (1 + rnd.nextInt(1000)).toLong))
      }
      val got = Mixing.domainMix(
          rows.toDF("source", "tok"), "source", "tok",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 3 + 1)
        .collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      // no source upsamples; the binding source runs at (rounded) rate 1
      assert(got.forall(_._4 <= 1000000L), s"round $round upsampled: ${got.toSeq}")
      assert(got.exists(_._4 >= 999999L), s"round $round no binding source: ${got.toSeq}")
      // expected tokens never exceed available; weights normalize to 1e6 ±1 per source
      assert(got.forall(r => r._5 <= r._2), s"round $round overdraw: ${got.toSeq}")
      val wsum = got.map(_._3).sum
      assert(math.abs(wsum - 1000000L) <= got.length,
        s"round $round weights sum $wsum: ${got.toSeq}")
    }
  }

  test("per-row MinHash signature equals the aggregate on random token docs") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0 until 8).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text").withColumn("ts_us", lit(0L))
    val perRow = graft.streaming.StreamNearDup.signatures(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val agg = Dedup.minhashSignature(
        Dedup.shingleSet(docs.select("doc_id", "text"), "doc_id", "text",
          maxDf = 1000000L), 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(perRow == agg)
  }

  test("salted top-k equals the direct window on random hot-key data, any salt count") {
    for (round <- 0 until 6) {
      val n = 200 + rnd.nextInt(300)
      // 3 keys, one of them hot (~80% of rows) — the regime salting is for
      val rows = (0 until n).map { i =>
        val key = if (rnd.nextInt(10) < 8) 0L else 1L + rnd.nextInt(2)
        (key, i.toLong, rnd.nextInt(50).toLong)
      }
      val df = rows.toDF("key", "id", "v")
      val ord = Seq(col("v").desc, col("id"))
      def res(d: org.apache.spark.sql.DataFrame) =
        d.select("key", "id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val direct = res(graft.ops.Temporal.topKPerKey(df, Seq("key"), ord, 4))
      for (salts <- Seq(2, 7, 16)) {
        val salted = res(graft.ops.Temporal.saltedTopKPerKey(
          df, Seq("key"), ord, 4, saltOn = col("id"), salts = salts))
        assert(salted == direct, s"round $round salts=$salts diverged")
      }
    }
  }
}
