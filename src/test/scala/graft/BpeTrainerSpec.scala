package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.BpeTrainer

/**
 * Proves the distributed BPE trainer learns exactly the rules a plain
 * single-machine reference implementation learns: same greedy
 * left-to-right merge convention, same (count DESC, lhs, rhs)
 * tie-break, on both a hand-checkable corpus (the Sennrich et al. ACL
 * 2016 running example) and random corpora.
 */
class BpeTrainerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference trainer over (word, count) on plain collections. */
  private def refTrain(
      words: Map[String, Long], k: Int): Seq[(Long, String, String, Long)] = {
    var reprs: Map[Vector[String], Long] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ BpeTrainer.EndOfWord) -> c
    }
    (1 to k).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- reprs; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      val ((x, y), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      reprs = reprs.groupMapReduce { case (syms, _) =>
        // greedy left-to-right non-overlapping rewrite
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (t <- syms)
          if (out.nonEmpty && out.last == x && t == y) out(out.size - 1) = x + y
          else out += t
        out.toVector
      } { case (_, c) => c }(_ + _)
      (r.toLong, x, y, n)
    }
  }

  private def sparkTrain(
      words: Map[String, Long], k: Int): Seq[(Long, String, String, Long)] = {
    val df = words.toSeq.toDF("word", "cnt")
    BpeTrainer.train(spark, df, "word", "cnt", k)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("Sennrich running example: first merges pick the dominant suffix pairs") {
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = sparkTrain(corpus, 6)
    assert(got == refTrain(corpus, 6))
    // the canonical first rule: ('e','s') with 9 occurrences
    // (newest×6 + widest×3) — ties on ('s','t') broken by lhs
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    // later rounds must build on merged symbols, not raw chars only
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1))
  }

  test("random corpora: learned rules match the reference exactly") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val words = (1 to 30).map { _ =>
        (1 to (2 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val corpus = words.groupBy(identity).map { case (w, g) =>
        w -> (g.size * (1 + rnd.nextInt(5))).toLong
      }
      assert(sparkTrain(corpus, 5) == refTrain(corpus, 5), s"trial $trial")
    }
  }

  test("repeated-symbol overlap resolves left-to-right non-overlapping") {
    // "aaaa" under a a -> aa must become (aa)(aa), not a(aa)a: pair
    // counting is overlapping (3 per word), but the rewrite is not.
    // Round 2 then sees pairs (aa,aa) and (aa,</w>) at 10 each and the
    // (lhs, rhs) tie-break picks (aa,</w>) — a wrong rewrite to
    // a(aa)a would surface (a,</w>) instead.
    val corpus = Map("aaaa" -> 10L, "b" -> 1L)
    val got = sparkTrain(corpus, 2)
    assert(got == refTrain(corpus, 2))
    assert(got(0)._2 == "a" && got(0)._3 == "a" && got(0)._4 == 30L)
    assert(got(1)._2 == "aa" && got(1)._3 == BpeTrainer.EndOfWord &&
      got(1)._4 == 10L)
  }
}
