package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Session-lifetime memo of IMMUTABLE input tables' parquet schemas.
 *
 * `spark.read.parquet(path)` without a user schema runs a small
 * footer-inference job per call (measured 30-100 ms each). The driver
 * tables (documents/embeddings/lineitem/events…) are read by hundreds
 * of registered queries in one session, and the files never change
 * during a run — so the schema is inferred ONCE per path and every
 * later read passes it explicitly. This memoizes METADATA only (the
 * column shape, a few hundred bytes), never rows or results: each
 * query still computes from the parquet inputs. Unlike a hard-coded
 * schema it stays correct across testdata generations (e.g. the
 * events `ts` column's TIMESTAMP(NANOS)-vs-MICROS history — see
 * Melt.readTsParquet).
 */
object SchemaMemo {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(
      cache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    ).parquet(path)
}
