package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One series' open threshold excursion carried across micro-batches. */
case class OpenExcursion(startUs: Long, lastUs: Long, n: Long, peakPpm: Long)

/** A closed excursion emitted downstream — one alert-history row. */
case class Excursion(
    dataset_id: String, start_us: Long, end_us: Long,
    n_points: Long, peak_ppm: Long)

/**
 * Streaming threshold-excursion detection (live alerting): consecutive
 * above-threshold points of a series merge into ONE excursion row —
 * the debounced alert a pager wants, not a page per point. The batch
 * twin is the gaps-and-islands series_excursions query; this is the
 * same semantics driven by `flatMapGroupsWithState`.
 *
 * An excursion EMITS when (a) a later below-threshold point of the
 * same series closes it, or (b) the event-time watermark passes its
 * last point — the quiet-stream flush, so an alert never hangs open
 * waiting for traffic.
 *
 * Scale shape: state is ONE fixed-size OpenExcursion per series in
 * excursion (no point buffering); keyed state hash-partitions by
 * series. Thresholds arrive as a STATIC per-series frame joined into
 * the stream (the model-scoring-in-streams pattern) — broadcast-sized
 * at any catalog cardinality that fits a dimension table, and the join
 * is row-local so the stream never shuffles except into the keyed
 * state. Same in-order contract as Sessionize: within a micro-batch
 * points sort per series; across batches the watermark bounds
 * lateness.
 *
 * @param scored columns (dataset_id, ts_us, ppm, thr_ppm), already
 *               range-filtered; ts_us is event time in epoch-µs
 */
object StreamAlert {

  def excursions(
      scored: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[Excursion] = {
    val spark = scored.sparkSession
    import spark.implicits._

    def step(
        id: String,
        batch: Iterator[(String, Long, Long, Long, java.sql.Timestamp)],
        state: GroupState[OpenExcursion]): Iterator[Excursion] = {
      if (state.hasTimedOut) {
        val e = state.get
        state.remove()
        Iterator.single(Excursion(id, e.startUs, e.lastUs, e.n, e.peakPpm))
      } else {
        // (ts_us, ppm, thr): per-series ts is unique, so ts alone is a
        // total order — matches the oracle's ORDER BY ts_us exactly
        val rows = batch.map(r => (r._2, r._3, r._4)).toArray
        java.util.Arrays.sort(rows,
          Ordering.by((t: (Long, Long, Long)) => t._1))
        var open = state.getOption
        val closed = Vector.newBuilder[Excursion]
        for ((t, ppm, thr) <- rows) {
          if (ppm > thr) open match {
            case Some(e) if t > e.lastUs =>
              open = Some(OpenExcursion(
                e.startUs, t, e.n + 1, math.max(e.peakPpm, ppm)))
            case Some(e) =>
              // late arrival inside the open excursion: absorb without
              // rewinding lastUs (same discipline as Sessionize)
              open = Some(OpenExcursion(
                math.min(e.startUs, t), e.lastUs, e.n + 1,
                math.max(e.peakPpm, ppm)))
            case None =>
              open = Some(OpenExcursion(t, t, 1, ppm))
          } else open match {
            case Some(e) if t > e.lastUs =>
              closed += Excursion(id, e.startUs, e.lastUs, e.n, e.peakPpm)
              open = None
            case _ => () // below-threshold never extends or reopens
          }
        }
        open match {
          case Some(e) =>
            state.update(e)
            state.setTimeoutTimestamp(math.max(
              e.lastUs / 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
          case None if state.exists => state.remove()
          case None => ()
        }
        closed.result().iterator
      }
    }

    scored
      .select(col("dataset_id").cast("string").as("dataset_id"),
        col("ts_us").cast("long").as("ts_us"),
        col("ppm").cast("long").as("ppm"),
        col("thr_ppm").cast("long").as("thr_ppm"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step)
  }
}
