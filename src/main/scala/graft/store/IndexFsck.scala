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
 * Cost: one doc-grain readback per index + broadcast-out full-outer
 * joins on the id — ∝ index membership, never corpus text. Run it
 * the way a filesystem runs fsck: after incidents, before
 * irreversible maintenance, on a schedule.
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

  /** The full fsck battery over a lockstep index triple: each index's
   *  deep per-leg check plus the cross-index membership diff, as one
   *  (tier, check, violations, audited) report — the single table an
   *  operator reads after an incident. The four sub-reports are
   *  independent read-only probes and run CONCURRENTLY.
   */
  def report(
      spark: SparkSession, textDir: String, dedupDir: String,
      annDir: Option[String] = None): DataFrame = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    def tag(tier: String)(df: DataFrame): DataFrame =
      df.select(lit(tier).as("tier"), col("check"), col("violations"),
        col("audited"))
    val parts: Seq[Future[DataFrame]] = Seq(
      Some(Future(tag("text")(
        graft.text.TextIndex.fsck(spark, textDir)))),
      Some(Future(tag("dedup")(
        graft.dedup.Dedup.indexFsck(spark, dedupDir)))),
      annDir.map(a => Future(tag("ann")(
        graft.sim.Similarity.ivfIndexFsck(spark, a)))),
      Some(Future(tag("cross")(
        crossMembership(spark, textDir, dedupDir, annDir))))).flatten
    Await.result(Future.sequence(parts), Duration.Inf)
      .reduce(_.unionByName(_))
  }
}
