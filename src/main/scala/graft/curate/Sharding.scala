package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ranks

/**
 * Balanced training-shard export planning — the handoff artifact a
 * training job consumes: K output shards with near-equal token mass,
 * each described by (doc count, token mass, min/max doc size, content
 * checksum) so the consumer can validate what it received.
 *
 * Assignment is SERPENTINE over the global size rank: docs sorted by
 * weight descending get positions 0,1,2,…; position p lands in shard
 * p when p < K and in shard 2K-1-p otherwise, so every full pass deals
 * each shard one larger and one smaller doc — deterministic,
 * single-pass, and within one max-doc of greedy balance on realistic
 * size distributions (exact greedy is inherently sequential; this is
 * the parallelizable standard substitute). The rank comes from
 * [[Ranks.withGlobalRank]] (TeraSort two-pass), never a
 * single-partition window, so the plan scales to any corpus.
 *
 * The checksum is an order-free modular sum of per-row md5-derived
 * 60-bit integers — mergeable across partitions and engine-portable
 * (the DuckDB oracle reproduces it exactly).
 */
object Sharding {

  val ChecksumMod = 1000000007L

  /** Per-shard plan row: (shard, n_docs, n_tokens, min_tokens,
   *  max_tokens, checksum), one row per shard in [0, k).
   */
  def shardPlan(
      docs: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"shard count must be positive: $k")
    val ranked = Ranks.withGlobalRank(
      docs.select(col(idCol).as("doc_id"), col(weightCol).as("w")),
      "rk", Seq(col("w").desc, col("doc_id")))
    val p = pmod(col("rk"), lit(2L * k))
    val h = conv(substring(
      md5(concat_ws("|", col("doc_id"), col("w"))), 1, 15), 16, 10)
      .cast("long")
    ranked
      .withColumn("shard", when(p < k, p).otherwise(lit(2L * k - 1) - p))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("w").as("n_tokens"),
        min("w").as("min_tokens"),
        max("w").as("max_tokens"),
        pmod(sum(pmod(h, lit(ChecksumMod))), lit(ChecksumMod)).as("checksum"))
  }
}
