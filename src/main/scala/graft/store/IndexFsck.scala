package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * CROSS-INDEX CONSISTENCY CHECK — the detection half of the
 * "maintain the three serving indexes in lockstep" contract that the
 * crawl/RAG pipelines and the cross-index takedown
 * ([[graft.streaming.StreamForget.forgetWhereAll]]) all rely on.
 *
 * Those verbs are engineered so divergence cannot happen (keyed
 * tombstones re-read instead of re-derived, completion markers, leg
 * ordering); this module is what an operator runs to PROVE it hasn't:
 * a partial crash predating the keyed-tombstone discipline, a stray
 * ad-hoc write to one index, or a bug in a future verb all surface
 * here as a nonzero membership diff instead of as silently wrong
 * search results (a doc served by BM25 but invisible to the dedup
 * gate, a vector whose document was erased).
 *
 * Cost: one doc-grain readback per index + one id-keyed shuffle per
 * full-outer membership compare (8-byte keys — a full outer cannot
 * broadcast) — ∝ index membership, never corpus text. Run it the way
 * a filesystem runs fsck: after incidents, before irreversible
 * maintenance, on a schedule.
 *
 * Preconditions the caller owns (else a diff is expected, not a
 * corruption): the three indexes were fed the same doc set with
 * vec_id == doc_id, and every doc yields ≥ 1 shingle under the dedup
 * ingest's df cap (a doc whose every shingle saturated
 * [[graft.dedup.Dedup.shingleSet]]'s maxDf never enters the dedup
 * index at all).
 */
object IndexFsck {

  /** Membership diff across the text index (authoritative: the only
   *  tier with a forward store), the dedup index, and optionally the
   *  ANN index. Returns (check, violations, audited) rows —
   *  `text_vs_dedup` / `text_vs_ann` violations are SYMMETRIC
   *  difference counts (a doc live in either index but not the
   *  other); audited is the text index's live doc count.
   */
  def crossMembership(
      spark: SparkSession, textDir: String, dedupDir: String,
      annDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val text = graft.text.TextIndex.liveDocIds(spark, textDir)
      .distinct().persist()
    try {
      val audited = text.count()
      def symDiff(other: DataFrame): Long =
        text.withColumn("a", lit(1))
          .join(other.distinct().withColumn("b", lit(1)),
            Seq("doc_id"), "full_outer")
          .where(col("a").isNull || col("b").isNull)
          .count()
      val rows = Seq(
        ("text_vs_dedup",
          symDiff(graft.dedup.Dedup.indexDocIds(spark, dedupDir)),
          audited)) ++
        annDir.map(a => ("text_vs_ann",
          symDiff(graft.sim.Similarity.ivfVecIds(spark, a)
            .select(col("vec_id").as("doc_id"))),
          audited))
      rows.toDF("check", "violations", "audited")
    } finally text.unpersist(): Unit
  }

  /** REPAIR — the remediation half of [[crossMembership]]: re-converge
   *  the dedup and ANN tiers onto the TEXT index's membership (the
   *  authoritative tier — the only one holding a forward store to
   *  rebuild from). Docs live in text but missing from a tier are
   *  re-ingested from [[graft.text.TextIndex.docsFor]] (the ANN leg
   *  re-embeds through the caller's `embed`, which must be the
   *  pipeline's own embedder or the repaired vectors diverge
   *  semantically); docs live in a tier but gone from text are
   *  forgotten there. Returns one (tier, check, violations, audited)
   *  row per applied direction — `repaired_added` / `repaired_removed`
   *  with the applied count in `violations` — so the report composes
   *  with the fsck tables.
   *
   *  Replay-safe under `key`: each direction ledgers its own delivery
   *  key (`<key>.dedup.add` …) and a redelivered direction is skipped;
   *  diffs are recomputed from live state, so a post-completion
   *  redelivery computes empty diffs and applies nothing. Bounds: each
   *  direction repairs the LOWEST-ID 65536 docs per call (the takedown
   *  bound) — a wider diff is truncated DETERMINISTICALLY with a loud
   *  log line, and repeated calls converge; under `key`, use a FRESH
   *  key per wave (a redelivered key skips its direction, so the
   *  remainder would never apply under the old one).
   *
   *  Two doc classes can never converge and stay VISIBLE in the next
   *  [[crossMembership]] run instead of being silently dropped: a
   *  text doc yielding zero shingles under the dedup ingest's df cap,
   *  and a doc whose text embeds to the ZERO vector — the ANN add leg
   *  filters those out (a zero vector has no cosine direction; the
   *  RAG pipeline's own embed stage drops them on ingest for the same
   *  reason, so on pipeline-fed triples they also show as expected
   *  text_vs_ann diffs, not corruption).
   */
  def repairFromText(
      spark: SparkSession, textDir: String, dedupDir: String,
      annDir: Option[String] = None,
      embed: Option[org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column] = None,
      threshold: Double = 0.6,
      key: Option[String] = None,
      persistPairs: Boolean = false): DataFrame = {
    import spark.implicits._
    require(annDir.isEmpty || embed.nonEmpty,
      "repairing an ANN tier needs the pipeline's embedder (embed)")
    val text = graft.text.TextIndex.liveDocIds(spark, textDir)
      .distinct().persist()
    try {
      val audited = text.count()
      def diffIds(a: DataFrame, b: DataFrame, what: String): Seq[Long] = {
        // lowest-id-first: the truncation cut must be DETERMINISTIC or
        // replays and successive waves would repair different subsets
        val out = a.join(b, Seq("doc_id"), "left_anti")
          .orderBy("doc_id").limit(65537)
          .collect().map(_.getLong(0)).toSeq
        if (out.length > 65536)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"$what diff exceeds the 65536-per-call repair bound — " +
              "repairing the lowest-id 65536 this call; re-run (with a " +
              "fresh key) until the reported counts reach zero")
        out.take(65536)
      }
      def delivered(probe: String => Boolean, k: String): Boolean =
        key.exists(base => probe(s"$base.$k"))
      val dedupIds = graft.dedup.Dedup.indexDocIds(spark, dedupDir)
        .distinct()
      val addD = diffIds(text, dedupIds, "text∖dedup")
      val delD = diffIds(dedupIds, text, "dedup∖text")
      if (addD.nonEmpty && !delivered(
          graft.dedup.Dedup.indexHasDelivery(spark, dedupDir, _),
          "dedup.add"))
        // persistPairs passes through: in a persistPairs deployment a
        // repaired doc with NO pair report would let its near-dup
        // copies escape a later includeNearDups takedown
        graft.dedup.Dedup.indexCheckAndIngest(spark, dedupDir,
          graft.text.TextIndex.docsFor(spark, textDir, addD),
          "doc_id", "text", threshold,
          deliveryKey = key.map(_ + ".dedup.add"),
          persistPairs = persistPairs): Unit
      if (delD.nonEmpty && !delivered(
          graft.dedup.Dedup.indexHasDelivery(spark, dedupDir, _),
          "dedup.del"))
        graft.dedup.Dedup.indexForgetDocs(spark, dedupDir, delD,
          key = key.map(_ + ".dedup.del"))
      val annRows = annDir.toSeq.flatMap { a =>
        val vecIds = graft.sim.Similarity.ivfVecIds(spark, a)
          .select(col("vec_id").as("doc_id")).distinct()
        val addA = diffIds(text, vecIds, "text∖ann")
        val delA = diffIds(vecIds, text, "ann∖text")
        if (addA.nonEmpty && !delivered(
            graft.sim.Similarity.ivfHasDelivery(spark, a, _), "ann.add")) {
          // a zero-norm embedding has no cosine direction: appending
          // it would poison cell assignment with 0/0 — filter it out
          // (the doc stays visible as a text_vs_ann diff, the honest
          // report for content the ANN tier cannot hold)
          val add = graft.text.TextIndex.docsFor(spark, textDir, addA)
            .select(col("doc_id").as("vec_id"),
              embed.get(col("text")).as("v"))
            .where(graft.sim.Similarity.norm2(col("v")) > 0)
          if (!add.isEmpty)
            graft.sim.Similarity.ivfIndexAppend(spark, a, add,
              key = key.map(_ + ".ann.add"))
        }
        if (delA.nonEmpty && !delivered(
            graft.sim.Similarity.ivfHasDelivery(spark, a, _), "ann.del"))
          graft.sim.Similarity.ivfIndexForget(spark, a, delA,
            key = key.map(_ + ".ann.del"))
        Seq(("ann", "repaired_added", addA.length.toLong, audited),
          ("ann", "repaired_removed", delA.length.toLong, audited))
      }
      (Seq(
        ("dedup", "repaired_added", addD.length.toLong, audited),
        ("dedup", "repaired_removed", delD.length.toLong, audited)) ++
        annRows)
        .toDF("tier", "check", "violations", "audited")
    } finally text.unpersist(): Unit
  }

  /** The full fsck battery over a lockstep index triple: each index's
   *  deep per-leg check plus the cross-index membership diff, as one
   *  (tier, check, violations, audited) report — the single table an
   *  operator reads after an incident. The four sub-reports are
   *  independent read-only probes and run CONCURRENTLY.
   */
  def report(
      spark: SparkSession, textDir: String, dedupDir: String,
      annDir: Option[String] = None): DataFrame = {
    def tag(tier: String)(df: DataFrame): DataFrame =
      df.select(lit(tier).as("tier"), col("check"), col("violations"),
        col("audited"))
    val parts: Seq[() => DataFrame] = Seq(
      Some(() => tag("text")(
        graft.text.TextIndex.fsck(spark, textDir))),
      Some(() => tag("dedup")(
        graft.dedup.Dedup.indexFsck(spark, dedupDir))),
      annDir.map(a => () => tag("ann")(
        graft.sim.Similarity.ivfIndexFsck(spark, a))),
      Some(() => tag("cross")(
        crossMembership(spark, textDir, dedupDir, annDir)))).flatten
    graft.util.Par.par(parts)
      .reduce(_.unionByName(_))
  }
}
