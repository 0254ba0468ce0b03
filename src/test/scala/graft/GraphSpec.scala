package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** Min-label propagation semantics on hand-checkable graphs. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def df(pairs: Seq[(Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("src", "dst")
  }
  private def nodes(n: Int) = {
    val sp = spark
    import sp.implicits._
    (0L until n.toLong).toDF("id")
  }
  private def undirected(pairs: (Long, Long)*) =
    df(pairs ++ pairs.map(p => (p._2, p._1)))

  private def labels(out: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one round moves each node to its neighborhood min") {
    val l = labels(Graph.minLabelPropagate(
      nodes(4), undirected((0L, 1L), (1L, 2L), (2L, 3L)), 1))
    assert(l == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("a path of length k converges in k rounds") {
    val l = labels(Graph.minLabelPropagate(
      nodes(4), undirected((0L, 1L), (1L, 2L), (2L, 3L)), 3))
    assert(l.values.toSet == Set(0L))
  }

  test("disjoint components keep distinct labels; isolates keep their own") {
    val l = labels(Graph.minLabelPropagate(
      nodes(5), undirected((0L, 1L), (2L, 3L)), 4))
    assert(l == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  // canonical undirected edge list (a < b, distinct) for the
  // triangle / link-prediction kernels
  private def canon(pairs: (Long, Long)*) = {
    val sp = spark
    import sp.implicits._
    pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("a", "b")
  }

  test("K4: every node sits in 3 of the 4 triangles") {
    val out = Graph.triangleCounts(canon(
        (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("C4 square has no triangles") {
    val out = Graph.triangleCounts(canon(
      (0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)))
    assert(out.count() == 0L)
  }

  test("star + one leaf-leaf edge yields exactly one triangle (skew-safe orientation)") {
    // hub 0 has degree 5: the orientation must enumerate wedges at the
    // low-degree leaves, and still find triangle {0,1,2} exactly once
    val out = Graph.triangleCounts(canon(
        (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (1L, 2L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("path 0-1-2 predicts exactly the (0,2) link at full Jaccard") {
    val out = Graph.commonNeighborJaccard(canon((0L, 1L), (1L, 2L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L, 1L, 1000000L)))
  }

  test("complete graph has no links left to predict") {
    val out = Graph.commonNeighborJaccard(canon(
      (0L, 1L), (0L, 2L), (1L, 2L)))
    assert(out.count() == 0L)
  }

  test("triangle counts match O(n³) brute force on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 12
      val edges = for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.35
      } yield (a.toLong, b.toLong)
      val es = edges.toSet
      val expected = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for {
        a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n
        if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) &&
          es((a.toLong, c.toLong))
      } Seq(a, b, c).foreach(v => expected(v.toLong) += 1L)
      val got = Graph.triangleCounts(canon(edges: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.toMap.filter(_._2 > 0L))
    }
  }
}
