package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.Sketches

/** Portable-HLL behavior: estimate accuracy at known cardinalities,
  * register-grain bounds, and duplicate insensitivity.
  */
class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def report(n: Long, dups: Int = 1) = {
    val base = spark.range(0, n)
    val d = (1 until dups).foldLeft(base)((acc, _) => acc.union(base))
    Sketches.hllReport(d.toDF("k"), col("k")).head()
  }

  test("estimate lands within the HLL error envelope at 50k keys") {
    val r = report(50000)
    val est = r.getDouble(3)
    val exact = r.getLong(4)
    assert(exact == 50000L)
    // σ ≈ 1.04/√1024 ≈ 3.25%; 5σ bound with headroom for no bias table
    assert(math.abs(est - exact) / exact < 0.17, s"est=$est exact=$exact")
  }

  test("duplicates do not move the sketch: registers are max-merged") {
    val once = report(5000)
    val tripled = report(5000, dups = 3)
    assert(once.getLong(2) == tripled.getLong(2), "t_sum differs under dups")
    assert(once.getDouble(3) == tripled.getDouble(3), "estimate differs under dups")
  }

  test("small cardinality takes the linear-counting branch and stays close") {
    val r = report(300)
    val est = r.getDouble(3)
    assert(r.getLong(1) > 0, "small set must leave empty registers")
    assert(math.abs(est - 300.0) < 60.0, s"est=$est")
  }

  test("empty input yields v_zero = m and a zero estimate") {
    val r = Sketches.hllReport(
      spark.range(0, 10).where(col("id") < 0).toDF("k"), col("k"))
      .head()
    assert(r.getLong(1) == 1024L)
    // V = m ⇒ raw = alpha·m²·2⁵⁰/(m·2⁵⁰) ≈ 0.72·m ≤ 2.5m and v_zero > 0
    // ⇒ linear counting ln(m/m) = 0
    assert(r.getDouble(3) == 0.0)
    assert(r.getLong(4) == 0L)
  }
}
