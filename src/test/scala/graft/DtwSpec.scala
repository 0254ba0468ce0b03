package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dtw

/**
 * Proves the band-linearized DTW fold (ops/Dtw.scala) computes exactly
 * the textbook banded DP: an independent O(n²) reference DP here, the
 * single-expression fold in Spark, equal on random vectors across
 * lengths and band radii — including the row-seam cases (first/last
 * padded cell of each row) that a naive linear buffer gets wrong.
 */
class DtwSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook banded DTW: full (n+1)² table, ∞ outside |i-j| ≤ r. */
  private def refDtw(a: Array[Long], b: Array[Long], r: Int): Long = {
    val n = a.length
    val INF = Long.MaxValue / 4
    val d = Array.fill(n + 1, n + 1)(INF)
    d(0)(0) = 0L
    for (i <- 1 to n; j <- math.max(1, i - r) to math.min(n, i + r)) {
      d(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
    }
    d(n)(n)
  }

  private def sparkDtw(pairs: Seq[(Array[Long], Array[Long])], len: Int, r: Int): Seq[Long] =
    pairs.toDF("a", "b")
      .select(Dtw.banded(col("a"), col("b"), len, r).as("d"))
      .collect().map(_.getLong(0)).toSeq

  test("fold equals reference DP on random vectors, all band radii") {
    val rnd = new Random(42)
    for (len <- Seq(1, 2, 5, 13, 40); r <- Seq(0, 1, 3, 8) if r <= len) {
      val pairs = Seq.fill(8)((
        Array.fill(len)(rnd.nextInt(2000000).toLong - 1000000L),
        Array.fill(len)(rnd.nextInt(2000000).toLong - 1000000L)))
      val got = sparkDtw(pairs, len, r)
      val want = pairs.map { case (a, b) => refDtw(a, b, r) }
      assert(got == want, s"len=$len r=$r")
    }
  }

  test("degenerate cases: identical vectors cost 0; radius 0 is the diagonal") {
    val a = Array(5L, -3L, 7L, 7L, 0L)
    assert(sparkDtw(Seq((a, a)), a.length, 2) == Seq(0L))
    val b = Array(1L, 2L, 3L, 4L, 5L)
    val c = Array(2L, 2L, 3L, 4L, 9L)
    // radius 0: no warping allowed — plain L1 distance
    assert(sparkDtw(Seq((b, c)), 5, 0) == Seq(5L))
  }

  test("warping beats lockstep on a phase-shifted spike") {
    // same spike one step apart: lockstep (r=0) pays it twice,
    // DTW with any band ≥ 1 realigns and pays only the seam
    val a = Array(0L, 100L, 0L, 0L, 0L, 0L)
    val b = Array(0L, 0L, 100L, 0L, 0L, 0L)
    val lock = sparkDtw(Seq((a, b)), 6, 0).head
    val warp = sparkDtw(Seq((a, b)), 6, 2).head
    assert(warp < lock)
    assert(warp == refDtw(a, b, 2))
  }
}
