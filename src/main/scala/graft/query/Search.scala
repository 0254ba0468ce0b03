package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S7 / P6 / O4 — dataset catalog + substring search.
 *
 * The reference lists the `data/full` child directory names, keeps those
 * containing the query substring, capped at 300 (src/index.py:219-239).
 * Here the catalog is a distinct-aggregate over the long table — on a
 * real deployment it is maintained incrementally at ingest (a tiny
 * dimension table), so the search itself never scans fact data.
 */
object Search {

  /** Catalog of known dataset ids. */
  def catalog(long: DataFrame): DataFrame =
    long.select(col("dataset_id")).distinct()

  /** Substring search, deterministic order, cap 300 (src/index.py:219). */
  def datasets(long: DataFrame, query: String, maxCount: Int = 300): DataFrame =
    catalog(long)
      .where(col("dataset_id").contains(query))
      .orderBy(col("dataset_id"))
      .limit(maxCount)
}
