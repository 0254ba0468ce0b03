package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream interval join — the third Structured Streaming posture
 * (after foreachBatch ingest and watermarked windows): correlate two
 * live event streams by key within a time tolerance, e.g. views within
 * ±30 s of each purchase by the same user.
 *
 * Scale shape: Spark's symmetric hash join keys state by the equi-key
 * (user), so state distributes with key cardinality; BOTH sides carry
 * event-time watermarks and the join condition bounds the match window,
 * which lets the engine evict state older than watermark − tolerance —
 * state is O(key-rate × (tolerance + lateness)), independent of stream
 * length. Inner-join matches emit as soon as both rows are present (no
 * watermark wait), so a bounded replay yields exactly the batch join.
 */
object StreamJoin {

  /** Inner interval join: rows of `left` and `right` with equal
   *  `keyCol` whose event times are within `tolS` seconds. `lTs`/`rTs`
   *  name TimestampType columns; both sides are watermarked at
   *  `tolS + delayS` so join state can be evicted.
   */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      lTs: String, rTs: String, tolS: Int, delayS: Int = 30): DataFrame = {
    // only keyCol is de-ambiguated by rename; identically-named ts
    // columns would make col(lTs)/col(rTs) ambiguous at analysis
    require(lTs != rTs,
      s"intervalJoin requires distinct timestamp column names (both '$lTs')")
    val wm = s"${tolS + delayS} seconds"
    val l = left.withWatermark(lTs, wm)
    val r = right
      .withColumnRenamed(keyCol, s"r_$keyCol")
      .withWatermark(rTs, wm)
    l.join(r,
      col(keyCol) === col(s"r_$keyCol") &&
        col(rTs) >= col(lTs) - expr(s"INTERVAL $tolS SECONDS") &&
        col(rTs) <= col(lTs) + expr(s"INTERVAL $tolS SECONDS"))
      .drop(s"r_$keyCol")
  }
}
