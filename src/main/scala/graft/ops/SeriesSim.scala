package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/**
 * Time-series similarity search: "which series behave like this one".
 *
 * Two routes, mirroring the embedding ANN tier (reference semantics:
 * the catalog-of-series view the reference exposes through its search
 * endpoint, src/server.py:47-175, generalized to behavioral search):
 *
 *  - [[exactPairs]] — exact all-pairs Pearson over shared rollup
 *    buckets. Correct and the right tool at CATALOG scale (pairs are
 *    series², never points²), but quadratic in the series count, so the
 *    pair join is guarded IN-PLAN the same way `Similarity.bruteTopK`
 *    guards its cartesian: a 1-row broadcast series-count crossed in
 *    and `assert_true`'d. An over-cap catalog fails loudly at execution
 *    instead of silently launching an S² shuffle on a skew-prone
 *    low-cardinality bucket key.
 *
 *  - [[vectorize]] + [[annTopK]] — the 10⁶-series scale path: each
 *    series becomes one fixed-dimension vector over a fixed time grid
 *    (bucket means, centered per series so cosine ranks like Pearson on
 *    the grid; absent buckets contribute 0 = the centered mean), then
 *    neighbors come from the IVF tier ([[Similarity.ivfTopKWith]]) —
 *    probe work ∝ nProbe/#centroids of the catalog, never all pairs.
 *    Everything is deterministic (fixed-point mean, index-ordered
 *    folds), so the whole route is DuckDB-oracle-checkable.
 */
object SeriesSim {

  /** Series-count guard: cross a broadcast 1-row count into `df` and
   *  assert it. Same in-plan pattern as Similarity.bruteTopK's
   *  maxCorpus guard — fails at execution, before the pair join runs.
   */
  private def guarded(df: DataFrame, series: DataFrame, maxSeries: Long): DataFrame =
    df.crossJoin(broadcast(
        series.agg(count_distinct(col("dataset_id")).as("_series_n"))))
      .where(assert_true(col("_series_n") <= maxSeries,
        lit(s"exact all-pairs series similarity is quadratic in the series " +
          s"count (maxSeries=$maxSeries); vectorize the catalog and route " +
          "through SeriesSim.annTopK/ivfTopK instead")).isNull)
      .drop("_series_n")

  /**
   * Exact top-k most-Pearson-correlated series per series over shared
   * `bucket_s` buckets of `means` (dataset_id, bucket_s, m — bucket
   * means already rounded to 6 decimals by the caller). Zero-variance
   * pairs are dropped, r is rounded BEFORE ranking so rank order is
   * engine-deterministic. Output (dataset_id, neighbor, r, rank).
   */
  def exactPairs(means: DataFrame, k: Int, maxSeries: Long = 8192): DataFrame = {
    val a = guarded(
      means.select(col("dataset_id").as("a"), col("bucket_s"), col("m").as("x")),
      means, maxSeries)
    val b = means.select(col("dataset_id").as("b"), col("bucket_s"), col("m").as("y"))
    a.join(b, Seq("bucket_s")).where(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // constant series (zero variance on the shared buckets) carry
      // no correlation signal — drop the pair, don't divide by zero
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .where(col("vx") > 0 && col("vy") > 0)
      .withColumn("r",
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("vx")) * sqrt(col("vy"))), 6))
      .withColumn("rank",
        row_number().over(Window.partitionBy("a").orderBy(col("r").desc, col("b")))
          .cast("long"))
      .where(col("rank") <= k)
      .select(col("a").as("dataset_id"), col("b").as("neighbor"),
        col("r"), col("rank"))
  }

  /**
   * One fixed-dimension vector per series over the grid
   * `[startS, endS)` step `widthS`: slot i = (bucket mean − series
   * mean), absent slots 0. The series mean uses the fixed-point trick
   * (Σ round(m·10⁶) is a sum of integral doubles — exact in any order —
   * divided by identical operands), so every engine computes the SAME
   * vector bit-for-bit regardless of aggregation order. Series with no
   * in-window buckets or zero norm (exactly constant) are dropped.
   *
   * `vec_id` is a dense rank over the (bounded, catalog-sized) series
   * list — a single-partition window sort, fine for a catalog, and
   * exactly reproducible as SQL `row_number() OVER (ORDER BY ds) - 1`.
   *
   * Output (dataset_id, vec_id, v: array<double>[dim]).
   */
  def vectorize(
      means: DataFrame, startS: Long, endS: Long, widthS: Long): DataFrame = {
    val dim = ((endS - startS) / widthS).toInt
    require(dim > 0 && dim <= (1 << 20), s"grid dim $dim out of range")
    val slots = means
      .where(col("bucket_s") >= startS && col("bucket_s") < endS)
      .select(col("dataset_id"),
        ((col("bucket_s") - startS) / widthS).cast("int").as("i"),
        col("m"))
    slots.groupBy("dataset_id")
      .agg(
        map_from_entries(collect_list(struct(col("i"), col("m")))).as("slot"),
        (sum(round(col("m") * 1000000.0)) / (lit(1000000.0) * count(lit(1))))
          .as("mu"))
      .select(col("dataset_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("slot"), i) - col("mu"), lit(0.0)))
          .as("v"))
      .where(aggregate(transform(col("v"), x => x * x),
        lit(0.0), (acc, x) => acc + x) > 0)
      .withColumn("vec_id",
        row_number().over(Window.orderBy("dataset_id")).cast("long") - 1L)
  }

  /**
   * ANN series similarity: IVF probe/rank over [[vectorize]]d series.
   * Centroids are the deterministic stride sample (`vec_id %
   * centroidStep == 0`, driver-resident, bounded by `collectBounded`'s
   * 65536 cap inside ivfTopK); each series probes its `nProbe` nearest
   * cells, so scanned fraction ≈ nProbe/#centroids — no S² pair join
   * anywhere. Output (dataset_id, neighbor, cos, rank).
   */
  def annTopK(
      vecs: DataFrame, k: Int,
      centroidStep: Long = 7L, nProbe: Int = 3): DataFrame = {
    val corpus = vecs.select(col("vec_id"), col("v"))
    val names = broadcast(vecs.select(col("vec_id"), col("dataset_id")))
    // self-similarity: queries == the whole catalog, so the probe side
    // must NOT broadcast — both sides hash-join on cell instead
    Similarity.ivfTopK(corpus, corpus, k, centroidStep, nProbe,
        broadcastProbes = false)
      .join(names.select(col("vec_id").as("q_id"), col("dataset_id")), Seq("q_id"))
      .join(names.select(col("vec_id").as("n_id"), col("dataset_id").as("neighbor")),
        Seq("n_id"))
      .select(col("dataset_id"), col("neighbor"), col("cos"), col("rank"))
  }
}
