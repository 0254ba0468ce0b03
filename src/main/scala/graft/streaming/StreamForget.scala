package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming TAKEDOWN maintenance for the persisted indexes — the
 * "right-to-be-forgotten queue" posture completing the index
 * lifecycle: deletion requests stream in (an id column), and each
 * micro-batch applies one exactly-once tombstone commit per target
 * index ([[graft.text.TextIndex.forgetDocs]],
 * [[graft.dedup.Dedup.indexForgetDocs]],
 * [[graft.sim.Similarity.ivfIndexForget]]) — the deleted documents
 * stop being served IMMEDIATELY on every probe path, and physical
 * erasure follows the usual full-fold + vacuum schedule.
 *
 * Exactly-once is the shared maintainer contract (StreamTextIndex /
 * StreamRagPipeline): Structured Streaming replays an uncommitted
 * batch after a crash with the SAME deterministic id, each index's
 * `#txn:b<id>` ledger entry makes the apply idempotent, and the three
 * ledgers are INDEPENDENT — a crash between the text and ANN commits
 * replays the batch, the text leg short-circuits on its committed
 * key, and the ANN leg completes; a full fresh-checkpoint redelivery
 * is a version-preserving no-op on every index. forgetDocs' no-op
 * path still ledgers its key, so a batch whose ids were already gone
 * (or never ingested) replays as done rather than re-staging.
 *
 * A takedown batch is request-grain small by contract (the ids
 * collect to the driver to become the tombstone — loud past the
 * 65536 cap, matching forgetDocs). Tombstones accumulate one
 * broadcast-anti-join input per batch until retired;
 * `retireAboveTombstones` opts into maintainer-driven TOMBSTONE-
 * SCOPED retirement past a live-tombstone threshold
 * ([[graft.text.TextIndex.retireTombstones]] and the dedup/IVF
 * mirrors — cost ∝ the covered commits holding the deleted rows,
 * never a whole-index fold, so it is safe to run mid-stream; shard
 * compaction remains a separate scheduled-maintenance decision).
 */
object StreamForget {

  /** ONE-SHOT CROSS-INDEX PREDICATE TAKEDOWN — "erase everything
   *  matching P across the serving stack" as a single replay-safe
   *  verb: resolve the doc ids ONCE from the TEXT index's live
   *  forward store ([[graft.text.TextIndex.docsWhere]] — gone-
   *  filtered, so already-deleted docs don't re-resolve) and
   *  tombstone every targeted index under derived keys `<key>.dedup`
   *  / `<key>.ann` / `<key>.text`. The ANN leg assumes the pipeline
   *  contract vec_id == doc_id (both composed pipelines embed that
   *  way).
   *
   *  Replay soundness rests on LEG ORDER: the text index is the
   *  resolution SOURCE, so its leg commits LAST — a replay that finds
   *  `<key>.text` committed knows the whole verb ran (earlier legs
   *  are individually key-guarded), and a replay that doesn't
   *  re-resolves the SAME ids, because dedup/ANN tombstones never
   *  touch the text forward store. A predicate matching nothing still
   *  ledgers `<key>.text` so redeliveries probe as done. Returns the
   *  number of docs taken down (0 on redelivery or no match).
   */
  def forgetWhereAll(
      spark: org.apache.spark.sql.SparkSession,
      predicate: org.apache.spark.sql.Column, key: String,
      textIdx: String, dedupIdx: Option[String] = None,
      annIdx: Option[String] = None): Long = {
    require(key.nonEmpty && !key.contains('\n'), s"bad delivery key: $key")
    // completion marker: the text leg is last, so its key being
    // ledgered means every leg already applied
    if (graft.text.TextIndex.hasDelivery(spark, textIdx, s"$key.text"))
      return 0L
    val ids = graft.text.TextIndex.docsWhere(spark, textIdx, predicate)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .distinct().limit(65537)
      .collect().map(_.getLong(0)).toSeq
    require(ids.length <= 65536,
      s"forgetWhereAll resolved > 65536 ids in $textIdx — narrow the " +
        "predicate or batch the takedown (a tombstone is a bounded " +
        "driver-side set)")
    if (ids.isEmpty) {
      // nothing live matches — ledger the completion marker only
      graft.text.TextIndex.forgetWhere(spark, textIdx, predicate,
        key = Some(s"$key.text")): Unit
      return 0L
    }
    dedupIdx.foreach { dir =>
      if (!graft.dedup.Dedup.indexHasDelivery(spark, dir, s"$key.dedup"))
        graft.dedup.Dedup.indexForgetDocs(spark, dir, ids,
          key = Some(s"$key.dedup"))
    }
    annIdx.foreach { dir =>
      if (!graft.sim.Similarity.ivfHasDelivery(spark, dir, s"$key.ann"))
        graft.sim.Similarity.ivfIndexForget(spark, dir, ids,
          key = Some(s"$key.ann"))
    }
    graft.text.TextIndex.forgetDocs(spark, textIdx, ids,
      key = Some(s"$key.text"))
    ids.length.toLong
  }

  /** Start the maintainer over a streaming Dataset of takedown
   *  requests carrying `idCol` (long doc/vec ids). Any subset of the
   *  three indexes may be targeted; at least one must be. Runs with
   *  `Trigger.AvailableNow` — drain, then stop — matching the
   *  bounded-replay harness. Returns the running query; callers
   *  `awaitTermination`.
   */
  def maintain(
      idsStream: DataFrame, checkpoint: String,
      textIdx: Option[String] = None,
      dedupIdx: Option[String] = None,
      annIdx: Option[String] = None,
      idCol: String = "doc_id",
      retireAboveTombstones: Option[Long] = None): StreamingQuery = {
    require(textIdx.orElse(dedupIdx).orElse(annIdx).nonEmpty,
      "StreamForget needs at least one target index")
    require(retireAboveTombstones.forall(_ >= 1),
      s"bad retireAboveTombstones: $retireAboveTombstones")
    idsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val s = b.sparkSession
        val key = s"b$id"
        // ONE bounded collect serves all three legs (the batch is
        // request-grain by contract; forgetDocs re-checks the cap)
        val ids = b.select(org.apache.spark.sql.functions
            .col(idCol).cast("long"))
          .distinct().limit(65537)
          .collect().map(_.getLong(0)).toSeq
        require(ids.length <= 65536,
          s"takedown batch $id carries > 65536 ids — split the request " +
            "stream (a tombstone is a bounded driver-side set)")
        if (ids.nonEmpty) {
          textIdx.foreach { dir =>
            if (!graft.text.TextIndex.hasDelivery(s, dir, key)) {
              try graft.text.TextIndex.forgetDocs(s, dir, ids,
                key = Some(key))
              catch {
                case _: IllegalStateException =>
                  // lost the tombstone-set race (a concurrent forget or
                  // full fold moved the live set) — forgetDocs' contract
                  // is "rerun against the new live set"; the maintainer
                  // owns that retry so an operator race doesn't fail the
                  // stream. Re-probe the ledger first: if the racer
                  // committed OUR key, the batch is already applied.
                  if (!graft.text.TextIndex.hasDelivery(s, dir, key))
                    graft.text.TextIndex.forgetDocs(s, dir, ids,
                      key = Some(key))
              }
              retireAboveTombstones.foreach { cut =>
                if (graft.text.TextIndex.tombstoneCount(s, dir) > cut)
                  graft.text.TextIndex.retireTombstones(s, dir): Unit
              }
            }
          }
          dedupIdx.foreach { dir =>
            if (!graft.dedup.Dedup.indexHasDelivery(s, dir, key)) {
              // NO retry wrapper here, BY DESIGN (asymmetric with the
              // text leg above): a dedup tombstone is a pure gone-id
              // set with no corpus-level deltas, so indexForgetDocs
              // has no stale-abort to lose — concurrent forgets
              // compose (gone sets union) and the publish only
              // refuses a raced redelivery of THIS key, which the
              // hasDelivery guard already makes a no-op. Adding the
              // text leg's IllegalStateException retry would mask a
              // genuine redelivery bug. (Dedup.indexForgetDocs docs.)
              graft.dedup.Dedup.indexForgetDocs(s, dir, ids,
                key = Some(key))
              retireAboveTombstones.foreach { cut =>
                if (graft.dedup.Dedup.indexTombstoneCount(s, dir) > cut)
                  graft.dedup.Dedup.indexRetireTombstones(s, dir): Unit
              }
            }
          }
          annIdx.foreach { dir =>
            if (!graft.sim.Similarity.ivfHasDelivery(s, dir, key)) {
              // NO retry wrapper, same reasoning as the dedup leg: an
              // IVF tombstone is a pure gone-vec-id set (no deltas, no
              // stale-abort); only a raced redelivery of this key can
              // refuse the publish, and hasDelivery already guards it.
              graft.sim.Similarity.ivfIndexForget(s, dir, ids,
                key = Some(key))
              retireAboveTombstones.foreach { cut =>
                if (graft.sim.Similarity.ivfTombstoneCount(s, dir) > cut)
                  graft.sim.Similarity.ivfIndexRetireTombstones(s, dir): Unit
              }
            }
          }
        }
      }
      .start()
  }
}
