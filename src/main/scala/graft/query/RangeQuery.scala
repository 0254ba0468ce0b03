package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Fidelity

/**
 * §3.1 — the flagship range query: `get(dataset_id, start, end,
 * fidelity?)`.
 *
 * The reference routes to the coarsest covering resolution
 * (src/index.py:179-217, 252-275) and returns whole storage buckets;
 * we filter exactly at the engine (deliberate divergence, SURVEY §7.5).
 * On partitioned storage the two `.where` clauses below are pure
 * partition pruning + parquet min/max skipping — no shuffle anywhere in
 * this path, and the fidelity router bounds any result to ~5000 rows
 * (src/index.py:46), which is what makes driver-side materialization of
 * a query result legal at 100 TB.
 */
object RangeQuery {

  /** FULL-fidelity read: raw points in [startUs, endUs]. (S4, P1, P2) */
  def full(long: DataFrame, datasetId: String, startUs: Long, endUs: Long): DataFrame =
    long
      .where(col("dataset_id") === datasetId)
      .where(col("ts_us").between(startUs, endUs))
      .select(col("ts_us"), col("value"))

  /** Aggregate-fidelity read with derived mean (S5, P8, A8). A bucket is
   *  returned iff its START lies in range — the reference keys files and
   *  buckets by start timestamps (src/index.py:299, 453-456).
   */
  def agg(rollup: DataFrame, datasetId: String, startS: Long, endS: Long): DataFrame =
    rollup
      .where(col("dataset_id") === datasetId)
      .where(col("bucket_s").between(startS, endS))
      .select(
        col("bucket_s"),
        col("min_v"),
        (col("sum_v") / col("cnt")).as("mean_v"),
        col("max_v"))

  /**
   * A5 — resolution routing + scan guard. Picks the recommended
   * fidelity when none is forced (src/index.py:200-201, 252-275) and
   * refuses pathological spans the way the reference's max_steps=500
   * guard does (src/index.py:414, 445-448) — same user-visible
   * contract: bounded work per query.
   */
  def route(startUs: Long, endUs: Long, forced: Option[Fidelity]): Fidelity = {
    val spanS = (endUs - startUs) / 1e6
    val f = forced.getOrElse(Fidelity.recommended(spanS))
    val filesTouched =
      if (f.isFull) spanS / (Fidelity.GroupSize / 10.0)
      else spanS / (Fidelity.GroupSize.toDouble * f.seconds)
    require(filesTouched <= 500.0, s"span too large for fidelity ${f.name}")
    f
  }

  /** Column-level A5 router (for routing whole tables of spans at once):
   *  finest level whose ~5000-point file span still covers the query
   *  span (src/index.py:252-275). Mirrors `Fidelity.recommended`.
   */
  def recommendedCol(spanS: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Fidelity.all.init.foldRight(
      lit(Fidelity.S100000.name): org.apache.spark.sql.Column) { (f, fallback) =>
      when(spanS < f.maxSpanSeconds, lit(f.name)).otherwise(fallback)
    }

  /** Routed get over a full storage view: `tables(fidelity)` returns the
   *  long raw table for Full and the rollup table otherwise.
   */
  def get(
      tables: Fidelity => DataFrame,
      datasetId: String,
      startUs: Long,
      endUs: Long,
      forced: Option[Fidelity] = None): DataFrame =
    getWith(tables, (f, _, _) => tables(f), datasetId, startUs, endUs, forced)

  /** Routed get where the AGGREGATE levels come from a range-aware
   *  reader — the merge-on-read store needs the series/bucket bounds
   *  BELOW its fold (`ManifestStore.readLevelRange`), which a plain
   *  per-level table view cannot express. One routing dispatch serves
   *  both storage backends; `agg` re-applies the filters, which is
   *  idempotent over an already-pruned read.
   */
  def getWith(
      raw: Fidelity => DataFrame,
      aggLevel: (Fidelity, Long, Long) => DataFrame,
      datasetId: String,
      startUs: Long,
      endUs: Long,
      forced: Option[Fidelity] = None): DataFrame = {
    val f = route(startUs, endUs, forced)
    val (startS, endS) = (startUs / 1000000L, endUs / 1000000L)
    if (f.isFull) full(raw(f), datasetId, startUs, endUs)
    else agg(aggLevel(f, startS, endS), datasetId, startS, endS)
  }
}
