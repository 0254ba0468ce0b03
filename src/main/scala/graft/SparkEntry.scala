package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.{CoreQueries, PipelineQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the §3.1 range query at
   *  FULL fidelity (reference: src/index.py:179-217).
   */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("range_full")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
   *  LLM-pipeline tier (dedup / similarity / text / multimodal) and
   *  general join/window analytics.
   */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++ TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY query has a full value oracle —
    * including both approximate-ANN paths (ann_lsh's md5-derived planes
    * and bit-sum buckets are engine-portable; ann_ivf's centroid choice
    * is deterministic), whose recall AnnRecallSpec characterizes
    * separately against the brute-force baseline.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ PipelineQueries.oracle ++ TpchQueries.oracle
}
