package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed iterative graph primitives over DataFrames. Both follow
 * the classic Pregel-on-relations shape: state is a NODE-grain vector,
 * each round is one equi-join against the edge list plus one
 * destination-grain aggregation — the edge list is never collected,
 * re-clustered, or self-joined, so a round's cost is one shuffle of
 * |E| keyed by node id at any scale (PageRank lives inline in the
 * graph_pagerank query; this object holds the label-propagation
 * kernel shared by query and spec).
 */
object Graph {

  /** Synchronous min-label propagation: `iters` rounds of
   *  l(v) ← min(l(v), min over neighbors' l(u)) over DIRECTED edges
   *  (pass both directions for the undirected semantics). With enough
   *  rounds this converges to connected components; few rounds give
   *  community seeds. Pure integer arithmetic.
   *
   *  @param nodes (id) one row per node
   *  @param edges (src, dst) directed adjacency
   *  @return (id, lab) final labels
   */
  def minLabelPropagate(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    var lab = nodes.select(col("id"), col("id").as("lab"))
    for (_ <- 1 to iters) {
      val nbr = edges
        .join(lab.select(col("id").as("dst"), col("lab").as("nl")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nl")).as("nl"))
      // eager node-grain checkpoint per round (the standard iterative-
      // algorithm discipline): `lab` feeds BOTH the neighbor join and
      // the carry join, and an unmaterialized lineage re-executes the
      // whole previous round for each occurrence — measured 2× work
      // per round without it
      lab = lab.join(nbr, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("lab"), coalesce(col("nl"), col("lab"))).as("lab"))
        .localCheckpoint(true)
    }
    lab
  }

  /** Per-node triangle counts with degree orientation (Suri &
   *  Vassilvitskii, WWW'11): each undirected edge is directed from its
   *  lower-(degree, id) endpoint to the higher, wedges are enumerated
   *  only at the LOW endpoint, and closed against the oriented edge
   *  set. Wedge volume is bounded by O(|E|^{3/2}) on any degree
   *  distribution — a hub of degree d contributes d spoke-wedges,
   *  never d² center-wedges — the property that keeps the last
   *  reducer alive on power-law graphs at scale. Three equi-join
   *  shuffles keyed by node/pair ids; the edge list never leaves the
   *  executors.
   *
   *  @param und (a, b) distinct undirected edges with a < b
   *  @return (id, n_tri) for every node in at least one triangle
   */
  def triangleCounts(und: DataFrame): DataFrame = {
    // ori feeds THREE plan legs (both wedge sides + the closing probe):
    // scoped persist or each leg re-runs the degree join — measured 2×
    val ori = orientByDegree(und)
    graft.dedup.Dedup.withScopedPersist(ori) {
      val tri = ori.as("e1")
        .join(ori.as("e2"), col("e1.u") === col("e2.u"))
        .where(col("e1.kv") < col("e2.kv"))
        .select(col("e1.u").as("t0"), col("e1.v").as("t1"),
          col("e2.v").as("t2"))
        .join(ori.select(col("u").as("t1"), col("v").as("t2")),
          Seq("t1", "t2"))
      tri.select(explode(array(col("t0"), col("t1"), col("t2"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
    }
  }

  /** Common-neighbor link prediction: for every NON-adjacent pair with
   *  at least one shared neighbor, the neighborhood-Jaccard score in
   *  integer ppm (rank-stable across engines — no float order
   *  sensitivity). Candidate volume is the wedge count Σ deg²; on
   *  power-law graphs cap or sample hub neighborhoods before calling
   *  (hubs predict links no better than raw degree).
   *
   *  @param und (a, b) distinct undirected edges with a < b
   *  @return (x, y, cn, jaccard_ppm) with x < y
   */
  def commonNeighborJaccard(und: DataFrame): DataFrame = {
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .unionByName(und.select(col("b").as("id"), col("a").as("nb")))
    // adj feeds the wedge self-join (both sides) and the degree agg:
    // scoped persist or the union re-materializes per leg
    graft.dedup.Dedup.withScopedPersist(adj) {
      val deg = adj.groupBy("id").agg(count(lit(1)).as("dg"))
      val cn = adj.as("l").join(adj.as("r"), col("l.nb") === col("r.nb"))
        .where(col("l.id") < col("r.id"))
        .select(col("l.id").as("x"), col("r.id").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("cn"))
      cn.join(und,
          col("x") === col("a") && col("y") === col("b"), "left_anti")
        .join(deg.select(col("id").as("x"), col("dg").as("dx")), "x")
        .join(deg.select(col("id").as("y"), col("dg").as("dy")), "y")
        .select(col("x"), col("y"), col("cn"),
          expr("(1000000 * cn) div (dx + dy - cn)").as("jaccard_ppm"))
    }
  }

  /** Orient each undirected edge (a < b) from its lower-(degree, id)
   *  endpoint to the higher; returns (u, v, kv) where kv is the HIGH
   *  endpoint's packed (degree·2³² + id) total-order key. */
  private def orientByDegree(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    und
      .join(deg.select(col("id").as("a"),
        (col("dg") * lit(4294967296L) + col("id")).as("ka")), "a")
      .join(deg.select(col("id").as("b"),
        (col("dg") * lit(4294967296L) + col("id")).as("kb")), "b")
      .select(
        when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
        greatest(col("ka"), col("kb")).as("kv"))
  }
}
