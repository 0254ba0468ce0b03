package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextIndex

/**
 * The full RAG ingest pipeline: ONE document stream maintains THREE
 * persisted indexes — each micro-batch is near-dup-gated against the
 * dedup index, and the SURVIVORS ingest into BOTH retrieval tiers:
 * the inverted text index (BM25 leg) and the IVF vector index (ANN
 * leg, via a caller-supplied `embed`). This is the production "crawl →
 * dedup → hybrid-searchable" shape, the composition the per-index
 * maintainers and [[StreamCrawlPipeline]] build toward.
 *
 * Exactly-once across THREE sinks with no cross-sink transaction:
 * each index keeps its own `#txn:b<batchId>` ledger, checked
 * independently, so a crash between ANY two commits recovers
 * correctly — the replayed batch skips whichever legs already
 * committed and performs the missing ones. What makes that sound is
 * the same invariant the crawl pipeline pins: both derived legs
 * compute survivors from THE BATCH'S OWN persisted pair report
 * ([[Dedup.indexPairsForDelivery]], published atomically with the
 * batch's dedup shard, byte-identical on first run and on replay),
 * never from an attempt-local verdict. Dedup-before-derived-legs
 * within the batch gives the report read its happens-before.
 *
 * ANN founding follows [[StreamAnnIndex]]: the first batch with a
 * non-empty embedded survivor set founds the index (its strided
 * sample freezes the centroid set); later batches append under the
 * frozen centroids. A fresh-checkpoint redelivery is a
 * version-preserving no-op on all three indexes.
 *
 * At 100 TB: per-batch cost is batch-linear (shingle+sign, tokenize,
 * embed) plus collision-proportional joins against stored dedup
 * state and a broadcast-centroid assignment — none of the three
 * corpora-at-rest are ever re-read, and the survivor anti-join is
 * batch-report-grain regardless of stream lifetime.
 */
object StreamRagPipeline {

  /** Start the pipeline over a streaming Dataset of documents
   *  (`idCol`, `textCol`). `embed` maps a batch of survivor docs to
   *  (vec_id, v) rows — dropping un-embeddable rows is its business
   *  (e.g. zero-norm vectors). Runs with `Trigger.AvailableNow`
   *  (bounded-replay harness; production swaps the trigger, nothing
   *  else). Returns the running query; callers `awaitTermination`.
   */
  def maintain(
      docsStream: DataFrame, dedupDir: String, textDir: String,
      annDir: String, checkpoint: String, threshold: Double,
      centroidStep: Long, embed: DataFrame => DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): StreamingQuery = {
    require(threshold > 0 && threshold <= 1, s"bad threshold: $threshold")
    require(centroidStep >= 1, s"bad centroidStep: $centroidStep")
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b0: DataFrame, id: Long) =>
        val s = b0.sparkSession
        val key = s"b$id"
        // ONE materializing count doubles as the emptiness probe (the
        // old standalone isEmpty launched a job whose work the legs
        // then redid) — every leg below reads the cached batch
        val b = b0.persist()
        try {
          if (b.count() > 0) {
            if (!Dedup.indexHasDelivery(s, dedupDir, key))
              Dedup.indexCheckAndIngest(
                s, dedupDir, b.select(idCol, textCol), idCol, textCol,
                threshold, deliveryKey = Some(key), persistPairs = true): Unit
            // survivors from THIS BATCH'S persisted report (committed
            // just above or by a pre-crash attempt) — replay-identical,
            // bounded by the batch; MATERIALIZED ONCE and shared by both
            // derived legs (each leg would otherwise re-read the pair
            // report and re-run the anti-join)
            val needText = !TextIndex.hasDelivery(s, textDir, key)
            // one ANN ledger snapshot answers BOTH "already delivered?"
            // and "founded yet?" — the old path resolved the log twice
            val (annVersion, annLive) = Similarity.ivfLedger(s, annDir)
            val needAnn = !annLive.contains("#txn:" + key)
            if (needText || needAnn) {
              val dups = Dedup.indexPairsForDelivery(s, dedupDir, key)
                .select(col("b_id").as(idCol)).distinct()
              val survivors = b.select(idCol, textCol)
                .join(dups, Seq(idCol), "left_anti").persist()
              try {
                // the count materializes the shared cache AND is the
                // emptiness answer — no separate isEmpty job
                val anySurvivors = survivors.count() > 0
                if (needText && anySurvivors)
                  TextIndex.ingestShard(
                    s, textDir, survivors, idCol, textCol, key = Some(key))
                if (needAnn && anySurvivors) {
                  val vecs = embed(survivors).persist()
                  try {
                    if (vecs.count() > 0) {
                      if (annVersion == 0L)
                        Similarity.ivfIndexBuild(
                          s, annDir, vecs, centroidStep, key = Some(key))
                      else
                        Similarity.ivfIndexAppend(
                          s, annDir, vecs, key = Some(key))
                    }
                  } finally vecs.unpersist(): Unit
                }
              } finally survivors.unpersist(): Unit
            }
          }
        } finally b.unpersist(): Unit
      }
      .start()
  }
}
