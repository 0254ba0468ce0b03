package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user's open session carried across micro-batches. */
case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)

/** A closed session emitted downstream. */
case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/**
 * Streaming gap-based sessionization — the engine's demonstration of
 * CUSTOM streaming state (`flatMapGroupsWithState`), complementing the
 * store-backed `foreachBatch` ingest path (StreamIngest) whose state
 * deliberately lives in tables.
 *
 * Semantics (matches the batch `user_sessions` operator): consecutive
 * events of a user belong to one session while the gap between them is
 * ≤ `gapUs`; a larger gap closes the session. A session is EMITTED when
 *  (a) a later event of the same user closes it, or
 *  (b) the event-time watermark passes `last + gap` — the event-time
 *      TIMEOUT — so idle users' last sessions flush deterministically
 *      without waiting for more of their events.
 *
 * Scale shape: state is ONE fixed-size OpenSession per active user
 * (no event buffering), keyed state is hash-partitioned by user_id
 * (cardinality grows with data → balanced), and the state store stays
 * bounded because every session either closes by data or times out by
 * watermark. Within a micro-batch events are sorted per user in memory —
 * a group's per-trigger slice, not the stream.
 *
 * In-order caveat (same contract as every incremental sessionizer):
 * events arriving ACROSS batches out of order by more than the
 * watermark delay are dropped by the watermark; within the delay they
 * may split a session that a batch recompute would join. The reference
 * engine's unbounded-lateness answer to that is the foreachBatch path;
 * this operator is the bounded-lateness streaming complement.
 */
object Sessionize {

  def sessions(
      events: DataFrame, gapUs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def step(
        userId: Long, batch: Iterator[(Long, Long, java.sql.Timestamp)],
        state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark passed last+gap with no new events: flush and clear
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, s.startUs, s.lastUs, s.nEvents))
      } else {
        val ts = batch.map(_._2).toArray
        java.util.Arrays.sort(ts)
        var open = state.getOption
        val closed = Vector.newBuilder[Session]
        for (t <- ts) open match {
          case Some(s) if t > s.lastUs =>
            if (t - s.lastUs <= gapUs)
              open = Some(s.copy(lastUs = t, nEvents = s.nEvents + 1))
            else {
              closed += Session(userId, s.startUs, s.lastUs, s.nEvents)
              open = Some(OpenSession(t, t, 1))
            }
          case Some(s) =>
            // out-of-order arrival (possible ACROSS batches within the
            // watermark delay): never rewind lastUs — that corrupts the
            // session bounds and re-arms the timeout too early. Inside
            // [start-gap, last] the event is absorbed (start may move
            // back); further back it is its own already-closed session.
            if (t >= s.startUs - gapUs)
              open = Some(s.copy(
                startUs = math.min(s.startUs, t), nEvents = s.nEvents + 1))
            else
              closed += Session(userId, t, t, 1)
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
        open.foreach { s =>
          state.update(s)
          // flush when the watermark proves no in-order event can extend
          // it (clamped: the timeout must sit beyond the current
          // watermark or Spark rejects it)
          state.setTimeoutTimestamp(math.max(
            (s.lastUs + gapUs) / 1000L + 1L,
            state.getCurrentWatermarkMs() + 1L))
        }
        closed.result().iterator
      }
    }

    // the watermarked `ts` column must survive INTO the grouped rows —
    // a typed map that drops it would strip the event-time attribute
    // and EventTimeTimeout rejects the plan
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts_us").cast("long").as("ts_us"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step)
  }
}
