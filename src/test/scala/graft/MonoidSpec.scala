package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rollup

/**
 * ScalaCheck laws for the A2 aggregate monoid (src/index.py:328-374;
 * SURVEY §5.2): the merge is associative and commutative with the empty
 * rollup as identity, and aggregating a concatenation equals merging the
 * per-part aggregations — the property that makes distributed partial
 * aggregation and unbounded-lateness folds correct.
 */
class MonoidSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def assertProp(p: Prop, min: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  // pure mirror of the monoid for fast law checking
  private type A = (Double, Double, Double, Long)
  private def m(a: A, b: A): A =
    (math.min(a._1, b._1), math.max(a._2, b._2), a._3 + b._3, a._4 + b._4)

  private val genA: Gen[A] = for {
    mn <- Gen.choose(-1e6, 1e6)
    mx <- Gen.choose(mn, 1e6)
    sm <- Gen.choose(-1e9, 1e9)
    c <- Gen.choose(1L, 1000000L)
  } yield (mn, mx, sm, c)

  test("merge is associative (sum up to fp reassociation)") {
    assertProp(Prop.forAll(genA, genA, genA) { (a, b, c) =>
      val l = m(m(a, b), c); val r = m(a, m(b, c))
      l._1 == r._1 && l._2 == r._2 && l._4 == r._4 &&
        math.abs(l._3 - r._3) <= 1e-6 * math.max(1.0, math.abs(l._3))
    })
  }

  test("merge is commutative in min/max/count (sum up to fp reassociation)") {
    assertProp(Prop.forAll(genA, genA) { (a, b) =>
      val ab = m(a, b); val ba = m(b, a)
      ab._1 == ba._1 && ab._2 == ba._2 && ab._4 == ba._4 &&
        math.abs(ab._3 - ba._3) <= 1e-6 * math.max(1.0, math.abs(ab._3))
    })
  }

  test("aggregate(a ++ b) == merge(aggregate(a), aggregate(b)) on DataFrames") {
    val gen = Gen.listOfN(40, for {
      d <- Gen.oneOf("s1", "s2")
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (d, t * 100000L, v))

    assertProp(Prop.forAll(gen, gen) { (xs, ys) =>
      val s = spark
      import s.implicits._
      def df(zs: List[(String, Long, Double)]) =
        zs.toDF("dataset_id", "ts_us", "value")
      val whole = Rollup.aggregate(df(xs ++ ys), 10)
        .orderBy("dataset_id", "bucket_s").collect().toSeq
      val merged = Rollup.merge(
        Rollup.aggregate(df(xs), 10), Rollup.aggregate(df(ys), 10))
        .orderBy("dataset_id", "bucket_s").collect().toSeq
      whole.size == merged.size && whole.zip(merged).forall { case (w, g) =>
        w.getString(0) == g.getString(0) && w.getLong(1) == g.getLong(1) &&
          w.getDouble(2) == g.getDouble(2) && w.getDouble(3) == g.getDouble(3) &&
          math.abs(w.getDouble(4) - g.getDouble(4)) < 1e-9 &&
          w.getLong(5) == g.getLong(5)
      }
    }, min = 8)
  }
}
