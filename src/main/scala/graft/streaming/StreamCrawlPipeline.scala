package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.text.TextIndex

/**
 * The composed crawl-ingest pipeline: ONE document stream maintains
 * TWO persisted indexes — each micro-batch is near-dup-gated against
 * the dedup index, and only the SURVIVORS ingest into the text index.
 * This is the production shape ("dedup the crawl, search what's
 * left") and the reason the per-index maintainers were built.
 *
 * Exactly-once across two sinks without a cross-sink transaction:
 * each index keeps its own `#txn:b<batchId>` ledger, checked
 * independently — so a crash BETWEEN the two commits recovers
 * correctly (the replayed batch skips the already-committed dedup
 * append and still performs the missing text ingest). The subtle
 * requirement that makes this sound: the text leg's survivor set must
 * be identical on first run and on replay, so survivors derive from
 * THE BATCH'S OWN persisted pair report
 * ([[graft.dedup.Dedup.indexPairsForDelivery]] — published atomically
 * with the batch's shard, so it exists on first run and on replay and
 * is byte-identical both times), never from this attempt's in-memory
 * verdict. Dedup-before-text within the batch gives the report-read
 * its happens-before. The batch's report is also SUFFICIENT: it
 * contains every pair involving this batch's docs (the b_id side),
 * and doc ids are unique across the stream, so no other batch's
 * report can name them — reading the cumulative [[Dedup.indexPairs]]
 * union here would make per-batch cost grow with every duplicate the
 * stream ever found.
 *
 * A full fresh-checkpoint redelivery is a version-preserving no-op on
 * BOTH indexes; batches are micro-batch-sequential, which is the
 * dedup index's serial-shard requirement.
 *
 * At 100 TB: per-batch cost is batch-linear (shingle+sign,
 * tokenize) plus collision-proportional joins against stored dedup
 * state — the two corpora-at-rest are never re-read; the anti-join
 * against reported duplicates is BATCH-report-grain (this batch's
 * dups only, bounded by the batch), regardless of stream lifetime.
 */
object StreamCrawlPipeline {

  /** Start the pipeline over a streaming Dataset of documents
   *  (`idCol`, `textCol`). Runs with `Trigger.AvailableNow` — drain
   *  what the source has, then stop — matching the bounded-replay
   *  harness; a production deployment would swap the trigger, nothing
   *  else. Returns the running query; callers `awaitTermination`.
   */
  def maintain(
      docsStream: DataFrame, dedupDir: String, textDir: String,
      checkpoint: String, threshold: Double, idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery = {
    require(threshold > 0 && threshold <= 1, s"bad threshold: $threshold")
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val s = b.sparkSession
        val key = s"b$id"
        if (!b.isEmpty) {
          if (!Dedup.indexHasDelivery(s, dedupDir, key))
            Dedup.indexCheckAndIngest(
              s, dedupDir, b.select(idCol, textCol), idCol, textCol,
              threshold, deliveryKey = Some(key), persistPairs = true): Unit
          if (!TextIndex.hasDelivery(s, textDir, key)) {
            // survivors from THIS BATCH'S persisted report (committed
            // just above or by a pre-crash attempt) — identical on
            // first run and on replay, and bounded by the batch
            val dups = Dedup.indexPairsForDelivery(s, dedupDir, key)
              .select(col("b_id").as(idCol)).distinct()
            val survivors = b.select(idCol, textCol)
              .join(dups, Seq(idCol), "left_anti")
            if (!survivors.isEmpty)
              TextIndex.ingestShard(
                s, textDir, survivors, idCol, textCol, key = Some(key))
          }
        }
      }
      .start()
  }
}
