package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Rollup, SeriesSim}

/**
 * Series-similarity tier: the exact pair join must be guarded against
 * quadratic catalogs (the bruteTopK pattern), and the vectorized IVF
 * route must retrieve substantially the same neighbors as exact cosine
 * over the same vectors while scanning only probed cells.
 */
class SeriesSimSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.dataDir
  private val Day5S = 1704412800L
  private val Day6S = 1704499200L

  private def means = {
    assume(TestSpark.hasData, s"dataset ${TestSpark.dataDir} not present — skipping")
    Rollup.aggregate(graft.api.CoreQueries.ev(spark, sf), 100)
      .select(col("dataset_id"), col("bucket_s"),
        round(col("sum_v") / col("cnt"), 6).as("m"))
  }

  test("exactPairs maxSeries guard fails loudly instead of launching the pair join") {
    val ex = intercept[Exception] {
      SeriesSim.exactPairs(means, 3, maxSeries = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("annTopK")),
      s"expected the maxSeries guard message, got: $ex")
  }

  test("exactPairs under the cap matches the registered query") {
    val viaHelper = SeriesSim.exactPairs(means, 3)
      .orderBy("dataset_id", "rank").collect().toSeq
    val registered = SparkEntry.queries("series_similarity_100s")(spark, sf)
      .collect().toSeq
    assert(viaHelper == registered)
  }

  test("vectorize emits fixed-dim centered vectors with dense ids") {
    val rows = SeriesSim.vectorize(means, Day5S, Day6S, 100)
      .orderBy("vec_id").collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("vec_id")).toSeq
    assert(ids == ids.indices.map(_.toLong), s"ids not dense: $ids")
    rows.foreach { r =>
      val v = r.getSeq[Double](r.fieldIndex("v"))
      assert(v.size == 864, s"wrong dim ${v.size}")
      // centered: slot sum over PRESENT buckets ≈ 0 isn't guaranteed
      // (absent slots are 0, not the mean), but the norm must be real
      assert(v.map(x => x * x).sum > 0)
    }
  }

  test("annTopK recall vs exact cosine over the same vectors") {
    val vecs = SeriesSim.vectorize(means, Day5S, Day6S, 100)
    val mat = vecs.orderBy("vec_id").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("dataset_id"), r.getSeq[Double](r.fieldIndex("v")).toArray))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact: Map[String, Set[String]] = mat.map { case (q, (qds, qv)) =>
      qds -> mat.collect { case (n, (nds, nv)) if n != q => (nds, cos(qv, nv)) }
        .toSeq.sortBy { case (nds, c) => (-c, nds) }.take(3).map(_._1).toSet
    }
    val ann = SeriesSim.annTopK(vecs, 3, centroidStep = 2L, nProbe = 2)
      .collect()
      .groupBy(_.getAs[String]("dataset_id"))
      .map { case (ds, rows) => ds -> rows.map(_.getAs[String]("neighbor")).toSet }
    val recalls = exact.map { case (ds, want) =>
      ann.getOrElse(ds, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    info(f"series ANN mean recall@3 = $mean%.2f over ${recalls.size} series")
    assert(recalls.nonEmpty)
    assert(mean >= 0.5, f"series ANN recall collapsed: $mean%.2f")
  }
}
