package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.store.IndexFsck
import graft.text.TextIndex

/**
 * REPAIR UNDER CONTENTION — the deployment reality after an incident:
 * repairFromText runs WHILE a crawl-style lockstep ingest loop keeps
 * committing waves into the same triple. The pin contract deliberately
 * leaves ingest/append/forget/upsert allowed, so repair's add/del
 * halves must COEXIST with live waves and still converge.
 *
 * Why convergence holds (the leg-order argument this spec pins): the
 * pipelines commit the text leg LAST (dedup → ann → text), so a doc
 * visible in repair's authoritative text snapshot already has its
 * sibling legs committed — the ADD directions can never double-ingest
 * an in-flight wave. The DEL directions CAN transiently forget an
 * in-flight wave's dedup/ann rows (committed before its text leg);
 * the next repair wave re-adds them from the text forward store, so
 * post-quiescence the triple reaches its fixed point in ≤ 2 waves.
 * The fixed point is NOT zero: the two never-convergent classes (a
 * zero-shingle doc the dedup ingest drops, a zero-norm doc the ANN
 * add leg filters) stay VISIBLE as cross diffs by design.
 */
class RepairContentionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"
  private def embed(c: org.apache.spark.sql.Column) =
    toCol(graft.functions.CharHistogram(toExpr(c), Alphabet))

  private def textOf(id: Long): String =
    s"alpha bravo w$id charlie delta w$id echo foxtrot golf"

  test("repairFromText converges against a live lockstep ingest loop; " +
      "only the never-convergent classes stay visible") {
    val (t, dd, a) = (TestSpark.tmpDir("cont_t"),
      TestSpark.tmpDir("cont_d"), TestSpark.tmpDir("cont_a"))
    val base = (0L to 9L).map(i => (i, textOf(i)))
    val zeroShingle = (90L, "xy zz") // 2 tokens -> 0 shingles
    val zeroNorm = (91L, "0 1 2 3 4 5") // no alphabet chars -> 0 vector
    val wave0 = (base :+ zeroShingle :+ zeroNorm).toDF("doc_id", "text")
    // the INCIDENT state repair exists for: text is authoritative and
    // complete; dedup lost doc 2, ann lost doc 3 (plus ann cannot hold
    // 91, dedup cannot hold 90 — the designed visible classes)
    TextIndex.ingestShard(spark, t, wave0, "doc_id", "text",
      key = Some("w0"))
    Dedup.indexCheckAndIngest(spark, dd,
      wave0.where(col("doc_id") =!= 2L), "doc_id", "text", 0.9,
      deliveryKey = Some("w0")): Unit
    Similarity.ivfIndexBuild(spark, a,
      wave0.where(col("doc_id") =!= 3L && col("doc_id") =!= 91L)
        .select(col("doc_id").as("vec_id"), embed(col("text")).as("v")),
      3L, key = Some("w0"))
    // live ingest loop: 4 waves in the pipelines' leg order (dedup →
    // ann → text — text LAST), racing the repair loop below
    val ingest = new Thread(() => {
      for (w <- 1 to 4) {
        val docs = (0 until 5).map(j => (100L * w + j, textOf(100L * w + j)))
          .toDF("doc_id", "text")
        Dedup.indexCheckAndIngest(spark, dd, docs, "doc_id", "text", 0.9,
          deliveryKey = Some(s"w$w")): Unit
        Similarity.ivfIndexAppend(spark, a,
          docs.select(col("doc_id").as("vec_id"), embed(col("text")).as("v")),
          key = Some(s"w$w"))
        TextIndex.ingestShard(spark, t, docs, "doc_id", "text",
          key = Some(s"w$w"))
      }
    }, "contention-ingest")
    var midWaves = 0
    val repair = new Thread(() => {
      while (ingest.isAlive && midWaves < 12) {
        midWaves += 1
        IndexFsck.repairFromText(spark, t, dd, Some(a),
          embed = Some(embed(_)), threshold = 0.9,
          key = Some(s"mid$midWaves")).collect(): Unit
      }
    }, "contention-repair")
    ingest.start(); repair.start()
    ingest.join(); repair.join()
    assert(midWaves >= 1, "the repair loop never overlapped the ingest")
    // post-quiescence: the triple must reach its fixed point fast —
    // wave 1 repairs any del-race scars + the seeded holes, wave 2
    // proves stability. The fixed point is exactly the two designed
    // never-convergent docs.
    def diffs(): Map[String, Long] =
      IndexFsck.crossMembership(spark, t, dd, Some(a))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var waves = 0
    while (waves < 3 && diffs() !=
        Map("text_vs_dedup" -> 1L, "text_vs_ann" -> 1L)) {
      waves += 1
      IndexFsck.repairFromText(spark, t, dd, Some(a),
        embed = Some(embed(_)), threshold = 0.9,
        key = Some(s"post$waves")).collect(): Unit
    }
    assert(diffs() == Map("text_vs_dedup" -> 1L, "text_vs_ann" -> 1L),
      s"triple did not converge after $waves post-quiescence waves")
    assert(waves <= 2, s"convergence took $waves waves (expected <= 2)")
    // the converged triple is internally healthy on every tier — the
    // contention scars (tombstone/re-add cycles) left no torn state
    val rep = IndexFsck.report(spark, t, dd, Some(a))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val crossOnly = rep.filter { case ((tier, _), _) => tier != "cross" }
    assert(crossOnly.values.forall(_ == 0L), s"torn tier state: $rep")
    assert(rep(("cross", "text_vs_dedup")) == 1L)
    assert(rep(("cross", "text_vs_ann")) == 1L)
    // membership sanity: every ingested doc is served — 10 base + 20
    // wave docs + the two class docs in text
    assert(TextIndex.liveDocIds(spark, t).count() == 32L)
    assert(Dedup.indexDocIds(spark, dd).distinct().count() == 31L)
    assert(Similarity.ivfVecIds(spark, a).distinct().count() == 31L)
  }
}
