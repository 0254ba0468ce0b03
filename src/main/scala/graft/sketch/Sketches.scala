package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cardinality sketching for 100 TB-scale pipelines: a HyperLogLog
 * (Flajolet et al. 2007) built entirely from engine-portable
 * primitives, so the WHOLE sketch — registers, sum, estimate — is
 * reproducible in ANSI SQL and carries a full value oracle (unlike
 * `approx_count_distinct`, whose binary sketch is engine-private).
 *
 * Portability discipline:
 *  - the 60-bit hash is md5-derived (first 15 hex chars → BIGINT),
 *    identical across engines;
 *  - bucket / remainder come from bit ops (`&`, `>>`), not division;
 *  - the leading-zero rank uses an integer comparison ladder — no
 *    float log2, which differs at exact powers of two;
 *  - the register sum Σ 2^(50−M_j) is EXACT long arithmetic (rank
 *    capped at 50 keeps every term integral; ≤ 2^60 total), so partial
 *    aggregation order cannot change it;
 *  - the final estimate divides/multiplies identical operands on both
 *    engines (bit-deterministic IEEE), with the standard linear-counting
 *    branch for small cardinalities expressed identically.
 *
 * Scale shape: one hash aggregation to register grain (m=2^p rows,
 * map-side combined — a mergeable sketch by construction: max() per
 * register IS the merge operator), then a constant-size reduction.
 * No shuffle carries more than m rows.
 */
object Sketches {

  /** Leading-rank of the (60−p)-bit remainder: position of the first
   *  set bit from the MSB (1-based), 50-capped; an integer comparison
   *  ladder so no float log is involved.
   */
  private def rankCol(rem: Column, width: Int): Column = {
    val bitlen = (0 until width)
      .map(k => when(rem >= lit(1L << k), 1).otherwise(0))
      .reduce[Column](_ + _)
    least(lit(width + 1) - bitlen, lit(50))
  }

  /** One-row HLL report over `key`: (m, v_zero, t_sum, est, n_exact).
   *  `n_exact` is the true distinct count, computed alongside so the
   *  sketch's error is visible in the output (and the oracle compares
   *  both paths).
   */
  def hllReport(df: DataFrame, key: Column, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "p out of the sane HLL range")
    val m = 1 << p
    val width = 60 - p
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val regs = df
      .select(h.as("h"))
      .select(
        col("h").bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        shiftright(col("h"), p).as("rem"))
      .groupBy("bucket")
      .agg(max(rankCol(col("rem"), width)).as("m_rank"))
    val agg = regs.agg(
      count(lit(1)).as("seen"),
      sum(expr("shiftleft(cast(1 as bigint), cast(50 - m_rank as int))")).as("t_obs"))
    val exact = df.agg(count_distinct(key).as("n_exact"))
    // alpha and the 2^50 scale are literals — identical doubles on any
    // engine; T is exact integer, so est = f(identical operands)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    agg.crossJoin(exact)
      .withColumn("v_zero", lit(m.toLong) - col("seen"))
      .withColumn("t_sum", // empty input: sum() is NULL, not 0
        coalesce(col("t_obs"), lit(0L)) + col("v_zero") * lit(1L << 50))
      .withColumn("raw",
        alpha * lit(m.toDouble) * lit(m.toDouble) *
          lit((1L << 50).toDouble) / col("t_sum"))
      .withColumn("est",
        round(
          when(col("v_zero") > 0 && col("raw") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
            .otherwise(col("raw")),
          6))
      .select(
        lit(m.toLong).as("m"), col("v_zero"), col("t_sum"),
        col("est"), col("n_exact"))
  }

  /** The matching DuckDB oracle for `hllReport` over `keyExpr` of
   *  `table` — generated from the SAME constants so engine and oracle
   *  cannot drift.
   */
  def hllOracleSql(table: String, keyExpr: String, p: Int = 10): String = {
    val m = 1 << p
    val width = 60 - p
    val bitlen = (0 until width)
      .map(k => s"CASE WHEN rem >= ${1L << k} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH h AS (
       |  SELECT ('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM $table),
       |b AS (SELECT h & ${m - 1} AS bucket, h >> $p AS rem FROM h),
       |r AS (SELECT bucket, least(${width + 1} - ($bitlen), 50) AS rank FROM b),
       |regs AS (SELECT bucket, max(rank) AS m_rank FROM r GROUP BY 1),
       |agg AS (
       |  SELECT count(*) AS seen,
       |    sum((1::BIGINT << (50 - m_rank))::BIGINT)::BIGINT AS t_obs
       |  FROM regs),
       |exact AS (SELECT count(DISTINCT $keyExpr) AS n_exact FROM $table),
       |s AS (
       |  SELECT $m - seen AS v_zero,
       |    coalesce(t_obs, 0) + ($m - seen) * (1::BIGINT << 50) AS t_sum, n_exact
       |  FROM agg, exact),
       |e AS (
       |  SELECT v_zero, t_sum, n_exact,
       |    0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / ${m.toDouble}::DOUBLE)
       |      * ${m.toDouble}::DOUBLE * ${m.toDouble}::DOUBLE *
       |      ${(1L << 50).toDouble} / t_sum AS raw
       |  FROM s)
       |SELECT ${m.toLong} AS m, v_zero, t_sum,
       |  round(CASE WHEN v_zero > 0 AND raw <= ${2.5 * m}::DOUBLE
       |        THEN ${m.toDouble}::DOUBLE * ln(${m.toDouble}::DOUBLE / v_zero)
       |        ELSE raw END, 6) AS est,
       |  n_exact
       |FROM e""".stripMargin
  }
}
