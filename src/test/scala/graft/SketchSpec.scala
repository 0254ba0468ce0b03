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

  // ---- Count-Min sketch -------------------------------------------

  test("CMS is exact when the key set is far below the grid width") {
    // 10 keys in a 4×2048 grid: an all-rows collision is ~(10/2048)^4
    val df = spark.range(0, 1000).select((col("id") % 10).as("k"))
    val rows = Sketches.cmsTopK(df, col("k"), k = 5).orderBy("rank").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 100L, "exact count wrong")
      assert(r.getLong(2) == 100L, "estimate should equal exact here")
    }
    // rank ties broken by key text ascending
    assert(rows.map(_.getString(0)).toSeq == Seq("0", "1", "2", "3", "4"))
  }

  test("CMS overestimates but never underestimates under heavy collision load") {
    // 20k keys into a 2×256 grid: every cell is heavily shared
    val skew = spark.range(0, 20000)
      .select(when(col("id") < 5, lit(0L)).otherwise(col("id")).as("k"))
    val rows = Sketches.cmsTopK(skew, col("k"), k = 10, d = 2, wBits = 8).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1), s"CMS underestimated: $r"))
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "expected at least one collision-inflated estimate at this load")
    // the planted heavy hitter (5 occurrences of key 0) ranks first
    assert(rows.minBy(_.getLong(3)).getString(0) == "0")
  }

  test("CMS grids from disjoint shards merge by addition") {
    // the grid over A∪B must equal grid(A) + grid(B) cell-by-cell —
    // the mergeability contract that makes the sketch shard-parallel
    def grid(df: org.apache.spark.sql.DataFrame) = {
      val counts = df.groupBy(col("k").cast("string").as("key"))
        .agg(count(lit(1)).as("n_exact"))
      counts
        .select(col("key"), col("n_exact"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .groupBy(col("j"),
          conv(substring(md5(concat_ws("_", col("j"), col("key"))), 1, 15), 16, 10)
            .cast("long").bitwiseAND(lit(2047L)).as("cell"))
        .agg(sum("n_exact").as("cnt"))
    }
    val a = spark.range(0, 500).select((col("id") % 7).as("k"))
    val b = spark.range(500, 900).select((col("id") % 13).as("k"))
    val merged = grid(a).unionByName(grid(b))
      .groupBy("j", "cell").agg(sum("cnt").as("cnt"))
    val whole = grid(a.unionByName(b))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  // ---- fixed-grid quantile sketch ---------------------------------

  test("quantile estimates land within one grid cell of the exact quantile") {
    // uniform 0..9999: exact p-quantile ≈ 9999·p, grid error ≤ 10
    val df = spark.range(0, 10000).toDF("x")
    val rows = Sketches.quantileSketch(df, col("x"), Seq(0.5, 0.9, 0.99))
      .orderBy("p").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val exact = 9999.0 * r.getDouble(0)
      assert(math.abs(r.getDouble(3) - exact) <= 9999.0 / 1024 + 1.0,
        s"estimate off-grid: $r vs exact $exact")
    }
    // ranks are the exact selection ranks
    assert(rows.map(_.getLong(1)).toSeq == Seq(5000L, 9000L, 9900L))
  }

  test("grouped quantile sketch: per-key estimates stay within grid error") {
    import org.apache.spark.sql.functions.{col, lit}
    // key a: 1..1000 uniform; key b: constant 7.5 (degenerate grid)
    val df = spark.range(1, 1001)
      .select(lit("a").as("k"), col("id").cast("double").as("v"))
      .unionByName(spark.range(0, 50)
        .select(lit("b").as("k"), lit(7.5).as("v")))
    val rows = graft.sketch.Sketches
      .groupedQuantileSketch(df, "k", col("v"), Seq(0.5, 0.95))
      .orderBy("k", "p").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 0.5), ("a", 0.95), ("b", 0.5), ("b", 0.95)))
    val gridErr = (1000.0 - 1.0) / 1024 + 1e-6
    val Seq(a50, a95, b50, b95) = rows.map(_.getDouble(4)).toSeq
    assert(math.abs(a50 - 500.0) <= gridErr && math.abs(a95 - 950.0) <= gridErr,
      s"a: $a50 / $a95")
    assert(b50 == 7.5 && b95 == 7.5, "constant key must be exact")
  }

  test("constant column degenerates to bucket 0 with the exact value") {
    val df = spark.range(0, 100).select(lit(42.5).as("x"))
    val rows = Sketches.quantileSketch(df, col("x"), Seq(0.5)).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(2) == 0L && rows.head.getDouble(3) == 42.5)
  }

  // ---- Bloom membership -------------------------------------------

  test("Bloom membership never false-negatives and keeps probe columns") {
    val keys = spark.range(0, 100).select(col("id").cast("string").as("k"))
    val probes = spark.range(0, 2000)
      .select(col("id").as("pid"), col("id").cast("string").as("pk"))
    val got = Sketches.bloomMember(keys, "k", probes, "pk").collect()
    val flagged = got.map(_.getLong(0)).toSet
    assert((0L until 100L).toSet.subsetOf(flagged), "false negative!")
    // 1900 negatives × (300/2^18)^3 FP rate ⇒ essentially zero extras
    assert(flagged.size <= 110, s"implausible FP count: ${flagged.size - 100}")
    assert(got.head.schema.fieldNames.toSeq == Seq("pid", "pk"))
  }

  test("Bloom false positives appear at small m and are a strict superset") {
    val keys = spark.range(0, 200).select(col("id").cast("string").as("k"))
    val probes = spark.range(0, 3000)
      .select(col("id").as("pid"), col("id").cast("string").as("pk"))
    val flagged = Sketches.bloomMember(keys, "k", probes, "pk", kHash = 2, mBits = 9)
      .collect().map(_.getLong(0)).toSet
    assert((0L until 200L).toSet.subsetOf(flagged), "false negative!")
    assert(flagged.size > 200, "a 512-bit filter over 200 keys must collide")
  }
}
