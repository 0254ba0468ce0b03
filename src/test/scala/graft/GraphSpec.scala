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
}
