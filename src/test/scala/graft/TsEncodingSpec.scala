package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Melt

/**
 * The driver's events.parquet `ts` encoding has changed across testdata
 * generations (TIMESTAMP(NANOS) → long nanos with nanosAsLong, then
 * TIMESTAMP(MICROS) → TIMESTAMP_NTZ): every consumer must normalize
 * through Melt.tsUs and synthesize through Melt.tsLit rather than
 * assume a physical dtype. Round 6 lost both registered streaming
 * queries to a hardcoded long-nanos assumption; this spec pins the
 * contract for BOTH encodings.
 */
class TsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val usInstants = Seq(
    1704412800000000L,        // 2024-01-05T00:00:00Z
    1704412800123456L,        // sub-second µs survive
    1704499199999999L)

  test("tsUs normalizes long-nanos and NTZ-µs encodings to identical epoch-µs") {
    val asNs = usInstants.map(_ * 1000L).toDF("ts")
    val asNtz = usInstants.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(asNs.schema("ts").dataType == LongType)
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    val fromNs = asNs.select(Melt.tsUs(asNs, "ts").as("us")).collect().map(_.getLong(0))
    val fromNtz = asNtz.select(Melt.tsUs(asNtz, "ts").as("us")).collect().map(_.getLong(0))
    assert(fromNs.toSeq == usInstants)
    assert(fromNtz.toSeq == usInstants)
  }

  test("tsLit round-trips through tsUs in every encoding") {
    for (dt <- Seq(LongType, TimestampNTZType,
        org.apache.spark.sql.types.TimestampType)) {
      val df = Seq(1).toDF("one").select(Melt.tsLit(dt, usInstants.head).as("ts"))
      assert(df.schema("ts").dataType == dt, s"tsLit emitted wrong type for $dt")
      val back = df.select(Melt.tsUs(df, "ts").as("us")).head().getLong(0)
      assert(back == usInstants.head, s"round-trip broke for $dt: $back")
    }
  }
}
