package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus mixture planning: given per-document token counts, a source
 * (domain) column, and target mixture weights, compute the per-source
 * sampling rates that realize the target mixture at the largest total
 * token budget achievable WITHOUT upsampling any source past rate 1 —
 * the standard "epoch-bounded" mixing computation a training-data
 * pipeline runs before materializing a blend (the optimization DoReMi /
 * data-mixing recipes start from).
 *
 * With normalized weights w_s and available tokens t_s, the largest
 * feasible total is T = min_s t_s / w_s, and each source samples at
 * r_s = w_s · T / t_s (the argmin source at rate 1, everything else
 * downsampled).
 *
 * Scale shape: one hash aggregation by source, then two scalar
 * reductions over the per-source table (|sources| rows — thousands at
 * most, never corpus-sized) broadcast back. Float parity: weights are
 * integer-valued, token counts are exact longs, and every derived
 * number is a fixed sequence of scalar double ops on those exact
 * inputs, so both engines compute bit-identical results before the one
 * terminal round.
 */
object Mixing {

  /**
   * @param docTokens one row per document, carrying `sourceCol` and
   *                  `tokenCol` (exact integer token count)
   * @param weightCol unnormalized INTEGER target weight, an expression
   *                  over `sourceCol` only
   * Output: (source, n_docs, tokens, weight_ppm, rate_ppm, exp_tokens)
   */
  def domainMix(
      docTokens: DataFrame, sourceCol: String, tokenCol: String,
      weightCol: Column): DataFrame = {
    val per = docTokens.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("tokens"))
      .withColumn("w_raw", weightCol.cast("double"))
    val wSum = per.agg(sum(col("w_raw")).as("w_sum"))
    val withSum = per.crossJoin(broadcast(wSum))
    // T = min_s tokens_s · w_sum / w_raw_s  (== min_s t_s / w_norm_s)
    val budget = withSum
      .agg(min(col("tokens").cast("double") * col("w_sum") / col("w_raw")).as("t_max"))
    withSum.crossJoin(broadcast(budget))
      .select(
        col("source"), col("n_docs"), col("tokens"),
        round(col("w_raw") / col("w_sum") * 1e6).cast("long").as("weight_ppm"),
        round(col("w_raw") / col("w_sum") * col("t_max")
          / col("tokens").cast("double") * 1e6).cast("long").as("rate_ppm"),
        round(col("w_raw") / col("w_sum") * col("t_max")).cast("long").as("exp_tokens"))
  }
}
