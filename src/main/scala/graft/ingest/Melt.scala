package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Fidelity

/**
 * S8 / P3 / P4 — loaders that bring arbitrary tables into the engine's
 * canonical long form `(dataset_id STRING, ts_us BIGINT, value DOUBLE)`.
 *
 * The reference's upload client melts a wide parquet (one time column +
 * N value columns) into one series per column, dropping NaNs and
 * prefixing names (reference: examples/upload_data.py:58-85). Ingest
 * validates dataset ids against `[a-zA-Z0-9._-]+` with no `..`
 * (reference: src/index.py:60, 112-115) and the client drops NaN values
 * (reference: examples/upload_data.py:79).
 *
 * `ts_us` is epoch MICROseconds as a BIGINT — exact integer arithmetic
 * end-to-end, no float truncation ambiguity, and it matches DuckDB's
 * `epoch_us()` for oracle parity.
 */
object Melt {

  /** Validation + NaN-drop applied to every ingest path (P3 + P4).
   *  Null timestamps are dropped HERE, explicitly: a null ts_us row can
   *  never be range-queried (and would land in a null partition
   *  window), and the ingest path's emptiness check treats null ts
   *  bounds as "no ingestable rows" — dropping at sanitize keeps that
   *  loud and principled instead of silent.
   */
  def sanitize(long: DataFrame): DataFrame =
    long
      .where(col("ts_us").isNotNull)
      .where(col("value").isNotNull && !isnan(col("value")))
      .where(
        col("dataset_id").rlike("^[a-zA-Z0-9._\\-]+$") &&
          !col("dataset_id").contains(".."))

  /**
   * Normalize any supported physical timestamp encoding to epoch-µs
   * BIGINT: TimestampType via `unix_micros`, raw INT64 nanos (parquet
   * TIMESTAMP(NANOS) read with spark.sql.legacy.parquet.nanosAsLong)
   * via integer division — both truncate toward zero exactly like
   * DuckDB's `epoch_us` on its µs-truncated read of the same file.
   */
  def tsUs(df: DataFrame, tsCol: String): org.apache.spark.sql.Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"`$tsCol` div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is pinned to UTC, so the NTZ→LTZ cast is instant-preserving
        unix_micros(col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col(tsCol))
    }

  /** Read a parquet file that may carry TIMESTAMP(NANOS) columns
   *  (earlier driver testdata generations did; current ones write
   *  TIMESTAMP(MICROS), which reads natively as TIMESTAMP_NTZ); Spark
   *  rejects NANOS by default, so we opt into the documented legacy
   *  nanos-as-long read. Downstream code must treat the resulting `ts`
   *  dtype as data-dependent — go through [[tsUs]] / [[tsLit]], never
   *  assume LongType.
   */
  def readTsParquet(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.util.SchemaMemo.read(spark, path)
  }

  /** Inverse of [[tsUs]]: render an epoch-µs instant as a literal in the
   *  given physical ts encoding, so synthesized rows (e.g. streaming
   *  watermark sentinels) stay schema-compatible with the source files
   *  whether the driver wrote TIMESTAMP(NANOS) (long nanos) or
   *  TIMESTAMP(MICROS) (TIMESTAMP_NTZ).
   */
  def tsLit(
      dt: org.apache.spark.sql.types.DataType,
      us: Long): org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.LongType => lit(us * 1000L)
    case org.apache.spark.sql.types.TimestampNTZType =>
      // session TZ is pinned to UTC, so the LTZ→NTZ cast is instant-preserving
      timestamp_micros(lit(us)).cast(org.apache.spark.sql.types.TimestampNTZType)
    case _ => timestamp_micros(lit(us))
  }

  /**
   * The driver's `events` table is already long-shaped telemetry:
   * `event_type` plays the dataset id, `ts` the timestamp, `value` the
   * value. This is the bridge between /root/testdata and every oracle
   * query (VERDICT.md round-1 item 8).
   */
  def events(events: DataFrame): DataFrame =
    sanitize(
      events.select(
        col("event_type").as("dataset_id"),
        tsUs(events, "ts").as("ts_us"),
        col("value")))

  /**
   * Generic wide→long melt (reference: examples/upload_data.py:58-85):
   * one row per (time, value-column), series named `<prefix><column>`.
   * Implemented with a single `stack` projection — no shuffle, fully
   * codegen'd, scales linearly with input splits.
   */
  def wide(
      df: DataFrame,
      timeCol: String,
      valueCols: Seq[String],
      prefix: String = ""): DataFrame = {
    val stacked = df.select(
      tsUs(df, timeCol).as("ts_us"),
      expr(
        valueCols
          .map(c => s"'${prefix}${c}', cast(`$c` as double)")
          .mkString(s"stack(${valueCols.size}, ", ", ", ")"))
        .as(Seq("dataset_id", "value")))
    sanitize(stacked.select(col("dataset_id"), col("ts_us"), col("value")))
  }

  /** Assert-style id validation for API-side single ids (index.py:112-115). */
  def requireLegalId(id: String): Unit =
    require(Fidelity.isLegalDatasetId(id), s"illegal dataset id: $id")
}
