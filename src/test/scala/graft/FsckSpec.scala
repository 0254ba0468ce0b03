package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.store.{IndexFsck, Tables}
import graft.text.TextIndex

/**
 * fsck = the DETECTION half of the index-consistency design. The
 * clean-lifecycle test pins the healthy contract (all violations 0
 * with honest audited universes, through forget + upsert waves); the
 * injection tests prove each detector actually FIRES — a stray
 * posting row, a forged signature, a wrong-cell vector, and a
 * one-tier membership hole are each planted bypassing the commit
 * protocol (exactly what a stray writer would do) and must surface
 * as nonzero violations, not as silently wrong search results.
 */
class FsckSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "spark merge sort merge shuffle"),
    (1L, "window scan window window table"),
    (2L, "merge window table scan plan"),
    (3L, "totally unrelated words live here"),
    (4L, "scan scan scan merge table"),
    (5L, "zebra zebra merge plan plan"))
    .toDF("doc_id", "text")

  private def vecs = corpus.select(col("doc_id").as("vec_id"),
    array((0 to 3).map(i =>
      (col("doc_id") * 2 + i).cast("double") % 7.0): _*).as("v"))

  private def firstCommit(d: String): String =
    new graft.store.CommitLog(s"$d/_manifests")
      .latest(spark)._2.filter(_.startsWith("c-")).head

  private def reportOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("clean lifecycle (ingest + forget + upsert on all tiers) " +
      "fscks all-zeros with honest audited universes") {
    val (t, dd, a) = (TestSpark.tmpDir("fsck_t"),
      TestSpark.tmpDir("fsck_d"), TestSpark.tmpDir("fsck_a"))
    TextIndex.ingestShard(spark, t, corpus, "doc_id", "text",
      key = Some("w0"))
    Dedup.indexCheckAndIngest(spark, dd, corpus, "doc_id", "text",
      0.6, deliveryKey = Some("w0"), persistPairs = true): Unit
    Similarity.ivfIndexBuild(spark, a, vecs, 2L, key = Some("w0"))
    // forget doc 3 everywhere; upsert doc 5 everywhere
    TextIndex.forgetDocs(spark, t, Seq(3L), key = Some("f0"))
    Dedup.indexForgetDocs(spark, dd, Seq(3L), key = Some("f0"))
    Similarity.ivfIndexForget(spark, a, Seq(3L), key = Some("f0"))
    val up = Seq((5L, "zebra crossing merge plan update")).toDF("doc_id", "text")
    TextIndex.upsertDocs(spark, t, up, "doc_id", "text", key = Some("u0"))
    Dedup.indexUpsertDocs(spark, dd, up, "doc_id", "text", 0.6,
      key = Some("u0")): Unit
    Similarity.ivfIndexUpsert(spark, a,
      up.select(col("doc_id").as("vec_id"),
        array(lit(1.0), lit(2.0), lit(3.0), lit(4.0)).as("v")),
      key = Some("u0"))
    val rep = reportOf(IndexFsck.report(spark, t, dd, Some(a)))
    assert(rep.values.forall(_._1 == 0L), s"violations in $rep")
    // audited universes: 5 live docs everywhere
    assert(rep(("text", "docs_unique"))._2 == 5L)
    assert(rep(("dedup", "sig_unique"))._2 == 5L)
    assert(rep(("ann", "vec_unique"))._2 == 5L)
    assert(rep(("cross", "text_vs_dedup"))._2 == 5L)
    assert(rep(("cross", "text_vs_ann"))._2 == 5L)
    // the (doc, token) pair universe is at least one doc per live token
    assert(rep(("text", "pos_post_parity"))._2 >=
      rep(("text", "vocab_df"))._2)
  }

  test("text detectors fire on a stray posting row planted past the " +
      "commit protocol") {
    val t = TestSpark.tmpDir("fsck_t_bad")
    TextIndex.ingestShard(spark, t, corpus, "doc_id", "text",
      key = Some("w0"))
    val clean = reportOf(TextIndex.fsck(spark, t)
      .select(lit("text").as("tier"), col("check"), col("violations"),
        col("audited")))
    assert(clean.values.forall(_._1 == 0L))
    // a stray writer appends a forged posting: doc 999 was never
    // ingested — no vocab delta, no stats delta, no pos row, no
    // forward-store row
    Seq(("merge", 999L, 2L, 2L, 0L)).toDF("token", "doc_id", "tf", "dl", "tb")
      .write.mode("append").partitionBy("tb")
      .parquet(s"$t/data/${firstCommit(t)}/post")
    val rep = reportOf(TextIndex.fsck(spark, t)
      .select(lit("text").as("tier"), col("check"), col("violations"),
        col("audited")))
    assert(rep(("text", "vocab_df"))._1 >= 1L) // 'merge' df recount off
    assert(rep(("text", "stats_fold"))._1 == 1L) // nd/tl recount off
    assert(rep(("text", "pos_post_parity"))._1 >= 1L) // post without pos
    assert(rep(("text", "docs_coverage"))._1 == 1L) // no forward row
  }

  test("dedup detectors fire on forged signature and pair rows") {
    val dd = TestSpark.tmpDir("fsck_d_bad")
    Dedup.indexCheckAndIngest(spark, dd, corpus, "doc_id", "text",
      0.6, deliveryKey = Some("w0"), persistPairs = true): Unit
    val c = firstCommit(dd)
    val sig = spark.read.parquet(s"$dd/data/$c/sig")
    // doc 999: a signature with NO shingle postings behind it
    sig.limit(1).withColumn("doc_id", lit(999L))
      .write.mode("append").parquet(s"$dd/data/$c/sig")
    // doc 0 duplicated with a wrong stored set size
    sig.where(col("doc_id") === 0L)
      .withColumn("n", col("n") + 5L)
      .write.mode("append").parquet(s"$dd/data/$c/sig")
    // a pair report naming a doc the index never held
    Seq((998L, 0L, 0.95)).toDF("a_id", "b_id", "jaccard")
      .write.mode("append").parquet(s"$dd/data/$c/pairs")
    val rep = reportOf(Dedup.indexFsck(spark, dd)
      .select(lit("dedup").as("tier"), col("check"), col("violations"),
        col("audited")))
    assert(rep(("dedup", "sig_unique"))._1 == 1L) // doc 0 twice
    assert(rep(("dedup", "sig_sh_parity"))._1 == 1L) // doc 999 sig-only
    assert(rep(("dedup", "sig_n_recount"))._1 >= 1L) // doc 0's wrong n
    assert(rep(("dedup", "pairs_membership"))._1 == 1L) // doc 998
  }

  test("ann detectors fire on wrong-cell, duplicate, and wrong-dim " +
      "vectors") {
    val a = TestSpark.tmpDir("fsck_a_bad")
    Similarity.ivfIndexBuild(spark, a, vecs, 2L, key = Some("w0"))
    val c = firstCommit(a)
    val post = spark.read.parquet(s"$a/data/$c/post")
    // partition-dir columns read back with inferred (int) type
    val cells = post.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cells.length >= 2, "fixture needs >= 2 cells")
    // vec 100: correct vector copied into the WRONG cell
    val donor = post.where(col("cell") === cells(0)).limit(1)
    donor.withColumn("vec_id", lit(100L))
      .withColumn("cell", lit(cells(1)))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$a/data/$c/post")
    // vec 0 duplicated (its own cell, so only uniqueness fires for it)
    post.where(col("vec_id") === 0L)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$a/data/$c/post")
    // vec 101: wrong dimensionality
    donor.withColumn("vec_id", lit(101L))
      .withColumn("v", array(lit(1.0), lit(2.0)))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$a/data/$c/post")
    val rep = reportOf(Similarity.ivfIndexFsck(spark, a)
      .select(lit("ann").as("tier"), col("check"), col("violations"),
        col("audited")))
    assert(rep(("ann", "vec_unique"))._1 == 1L)
    assert(rep(("ann", "cell_assignment"))._1 >= 2L) // vec 100 + 101
    assert(rep(("ann", "dim_uniform"))._1 == 1L)
    assert(rep(("ann", "vec_unique"))._2 == 8L) // 6 + vecs 100, 101
  }

  test("repairFromText re-converges dedup and ann onto the text " +
      "membership; a redelivered repair is a no-op") {
    val (t, dd, a) = (TestSpark.tmpDir("rep_t"),
      TestSpark.tmpDir("rep_d"), TestSpark.tmpDir("rep_a"))
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => array(length(c).cast("double"), lit(1.0), lit(2.0), lit(3.0))
    TextIndex.ingestShard(spark, t, corpus, "doc_id", "text",
      key = Some("w0"))
    // dedup: missing doc 4, carrying an extra doc 9 text no longer has
    Dedup.indexCheckAndIngest(spark, dd,
      corpus.where(col("doc_id") =!= 4L).unionByName(
        Seq((9L, "stale doc the text tier already dropped"))
          .toDF("doc_id", "text")),
      "doc_id", "text", 0.6, deliveryKey = Some("w0")): Unit
    // ann: missing doc 2
    Similarity.ivfIndexBuild(spark, a,
      corpus.where(col("doc_id") =!= 2L)
        .select(col("doc_id").as("vec_id"), embed(col("text")).as("v")),
      2L, key = Some("w0"))
    val applied = IndexFsck.repairFromText(spark, t, dd, Some(a),
      embed = Some(embed), key = Some("r0"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(applied(("dedup", "repaired_added")) == ((1L, 6L))) // doc 4
    assert(applied(("dedup", "repaired_removed")) == ((1L, 6L))) // doc 9
    assert(applied(("ann", "repaired_added")) == ((1L, 6L))) // doc 2
    assert(applied(("ann", "repaired_removed")) == ((0L, 6L)))
    val rep = reportOf(IndexFsck.crossMembership(spark, t, dd, Some(a))
      .select(lit("cross").as("tier"), col("check"), col("violations"),
        col("audited")))
    assert(rep(("cross", "text_vs_dedup")) == ((0L, 6L)))
    assert(rep(("cross", "text_vs_ann")) == ((0L, 6L)))
    // redelivery: diffs recompute empty, delivery keys guard the verbs
    val again = IndexFsck.repairFromText(spark, t, dd, Some(a),
      embed = Some(embed), key = Some("r0"))
      .agg(sum("violations")).head().getLong(0)
    assert(again == 0L)
    // the repaired rows are really live (not just counted): vec 2 is
    // back in the posting readback, doc 9's signature is gone
    assert(Similarity.ivfVecIds(spark, a).where(col("vec_id") === 2L)
      .count() == 1L)
    assert(Dedup.indexDocIds(spark, dd).where(col("doc_id") === 9L)
      .count() == 0L)
  }

  test("store fsck: clean pyramid all-zeros; detectors fire on a " +
      "duplicated rollup row, an orphan fine bucket, and a misplaced " +
      "raw row") {
    val root = TestSpark.tmpDir("fsck_store")
    Tables.ingestBatch(spark, root, Seq(
      ("a", 1000000L, 1.0), ("a", 2500000L, 2.0), ("a", 12000000L, 3.0),
      ("b", 1000000L, 4.0), ("b", 99000000L, 5.0))
      .toDF("dataset_id", "ts_us", "value"))
    def rep() = Tables.fsck(spark, root, deep = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val clean = rep()
    assert(clean.values.forall(_._1 == 0L), s"violations in $clean")
    assert(clean("layout_raw")._2 == 5L)
    assert(clean("raw_1")._2 == 5L) // 5 distinct (series, 1s) buckets
    val rollup = spark.read.parquet(Tables.rollupPath(root))
    // 1) duplicate a stored d10 row byte-for-byte: passes every value
    //    compare, must fail uniqueness
    rollup.where(col("fidelity") === "d10").limit(1)
      .write.mode("append").partitionBy("fidelity", "ds_b", "part_s")
      .parquet(Tables.rollupPath(root))
    // 2) an orphan LAYOUT-VALID d1 bucket no coarser level knows:
    //    fires the 1s->10s cascade, not the layout check
    rollup.where(col("fidelity") === "d1" &&
        col("dataset_id") === "a").limit(1)
      .withColumn("bucket_s", lit(777L))
      .withColumn("part_s", lit(0L))
      .write.mode("append").partitionBy("fidelity", "ds_b", "part_s")
      .parquet(Tables.rollupPath(root))
    // 3) a raw row in the WRONG window partition — invisible to pruned
    //    range reads, and the deep recount disagrees with stored 1s
    spark.read.parquet(Tables.rawPath(root)).limit(1)
      .withColumn("ts_us", lit(86400L * 14L * 1000000L))
      .write.mode("append").partitionBy("ds_b", "win_s")
      .parquet(Tables.rawPath(root))
    val bad = rep()
    assert(bad("rollup_unique")._1 == 1L)
    assert(bad("cascade_1_10")._1 >= 1L)
    assert(bad("layout_raw")._1 == 1L)
    assert(bad("raw_1")._1 >= 1L)
    assert(bad("layout_rollup")._1 == 0L) // the orphan was layout-valid
  }

  test("store fsckRepair: derives the violated windows from red checks, " +
      "recomputes exactly those slices, and ends in a clean re-check") {
    val root = TestSpark.tmpDir("fsck_store_rep")
    Tables.ingestBatch(spark, root, Seq(
      ("a", 1000000L, 1.0), ("a", 2500000L, 2.0), ("a", 12000000L, 3.0),
      ("b", 1000000L, 4.0), ("b", 99000000L, 5.0))
      .toDF("dataset_id", "ts_us", "value"))
    val rollup = spark.read.parquet(Tables.rollupPath(root))
    // duplicate a d10 row (window 0) + a layout-valid orphan d1 bucket
    // in a far-future window raw knows nothing about (window 2e9)
    rollup.where(col("fidelity") === "d10")
      .orderBy("dataset_id", "bucket_s").limit(1)
      .write.mode("append").partitionBy("fidelity", "ds_b", "part_s")
      .parquet(Tables.rollupPath(root))
    rollup.where(col("fidelity") === "d1")
      .orderBy("dataset_id", "bucket_s").limit(1)
      .withColumn("bucket_s", lit(2000000000L))
      .withColumn("part_s", lit(2000000000L - 2000000000L %
        Tables.partitionWindowS(graft.model.Fidelity.S1)))
      .write.mode("append").partitionBy("fidelity", "ds_b", "part_s")
      .parquet(Tables.rollupPath(root))
    def viols() = Tables.fsck(spark, root, deep = true)
      .agg(sum("violations")).head().getLong(0)
    assert(viols() >= 3L) // unique + cascade + deep recount all red
    val windows = Tables.fsckRepair(spark, root, deep = true)
    assert(windows == Seq(0L, 2000000000L), s"windows: $windows")
    assert(viols() == 0L)
    // idempotent: a second repair finds nothing and touches nothing
    assert(Tables.fsckRepair(spark, root, deep = true).isEmpty)
  }

  test("cross membership fires on a one-tier hole and names its size") {
    val (t, dd) = (TestSpark.tmpDir("fsck_x_t"), TestSpark.tmpDir("fsck_x_d"))
    TextIndex.ingestShard(spark, t, corpus, "doc_id", "text",
      key = Some("w0"))
    // the dedup tier silently missed doc 5 (a partial crash predating
    // the keyed-delivery discipline, or an ad-hoc backfill)
    Dedup.indexCheckAndIngest(spark, dd,
      corpus.where(col("doc_id") =!= 5L), "doc_id", "text",
      0.6, deliveryKey = Some("w0")): Unit
    val rep = reportOf(IndexFsck.crossMembership(spark, t, dd)
      .select(lit("cross").as("tier"), col("check"), col("violations"),
        col("audited")))
    assert(rep(("cross", "text_vs_dedup")) == ((1L, 6L)))
  }

  test("incremental fsck: catches post-watermark corruption, never " +
      "re-reads pre-watermark legs, scopes audits to the fresh wave") {
    val (t, dd, a) = (TestSpark.tmpDir("fsck_i_t"),
      TestSpark.tmpDir("fsck_i_d"), TestSpark.tmpDir("fsck_i_a"))
    TextIndex.ingestShard(spark, t, corpus, "doc_id", "text",
      key = Some("w0"))
    Dedup.indexCheckAndIngest(spark, dd, corpus, "doc_id", "text",
      0.6, deliveryKey = Some("w0")): Unit
    Similarity.ivfIndexBuild(spark, a, vecs, 2L, key = Some("w0"))
    // no watermark yet → the scoped battery must fall back to the
    // full one (and, it being clean, ARM the watermark)
    val fb = reportOf(IndexFsck.incremental(spark, t, dd, Some(a)))
    assert(fb(("cross", "incremental_fallback"))._1 == 1L)
    assert(fb.filterNot(_._1 == ("cross", "incremental_fallback"))
      .values.forall(_._1 == 0L))
    val w1Commit = firstCommit(t)
    // wave 2 lands on all tiers (clean, lockstep)
    val w2 = Seq((10L, "alpha beta gamma delta alpha"),
      (11L, "beta beta epsilon zeta eta"),
      (12L, "gamma theta iota kappa kappa")).toDF("doc_id", "text")
    TextIndex.ingestShard(spark, t, w2, "doc_id", "text", key = Some("w1"))
    Dedup.indexCheckAndIngest(spark, dd, w2, "doc_id", "text",
      0.6, deliveryKey = Some("w1")): Unit
    Similarity.ivfIndexAppend(spark, a,
      w2.select(col("doc_id").as("vec_id"),
        array((0 to 3).map(i =>
          (col("doc_id") * 2 + i).cast("double") % 7.0): _*).as("v")),
      key = Some("w1"))
    // PRE-watermark leg made physically UNREADABLE: if any scoped
    // check touched wave-1's pos leg, the parquet read would throw —
    // surviving this garbage is the proof pre-watermark legs are
    // never re-read (stronger than "no violation reported")
    val posDir = java.nio.file.Paths.get(s"$t/data/$w1Commit/pos")
    java.nio.file.Files.walk(posDir).filter(p =>
        p.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.write(p,
        "not a parquet file".getBytes("UTF-8")): Unit)
    // POST-watermark corruption: a forged posting row planted into
    // the WAVE-2 commit past the commit protocol
    val w2Commit = new graft.store.CommitLog(s"$t/_manifests")
      .latest(spark)._2.filter(_.startsWith("c-"))
      .filterNot(_ == w1Commit).head
    Seq(("alpha", 999L, 2L, 2L, 0L))
      .toDF("token", "doc_id", "tf", "dl", "tb")
      .write.mode("append").partitionBy("tb")
      .parquet(s"$t/data/$w2Commit/post")
    val inc = reportOf(IndexFsck.incremental(spark, t, dd, Some(a)))
    assert(!inc.contains(("cross", "incremental_fallback")))
    // the wave-2 plant fires the commit-local detectors…
    assert(inc(("text", "vocab_df"))._1 >= 1L) // alpha df recount off
    assert(inc(("text", "stats_local"))._1 == 1L) // wave-2 nd/tl off
    assert(inc(("text", "pos_post_parity"))._1 >= 1L) // post w/o pos
    assert(inc(("text", "docs_coverage"))._1 == 1L) // no forward row
    // …and the scoped cross compare flags the forged doc as a
    // lockstep break against BOTH sibling tiers
    assert(inc(("cross", "new_membership_dedup"))._1 == 1L)
    assert(inc(("cross", "new_membership_ann"))._1 == 1L)
    // audits scoped to the fresh wave: 3 wave-2 docs + the forged one
    assert(inc(("text", "docs_unique"))._2 == 3L)
    assert(inc(("dedup", "sig_unique"))._2 == 3L)
    // a dirty scoped run must NOT advance the watermark: the next
    // scoped run re-verifies the same fresh window (audits > 0)
    val again = reportOf(IndexFsck.incremental(spark, t, dd, Some(a)))
    assert(again(("text", "docs_unique"))._2 == 3L)
  }

  test("incremental fsck: a compaction fold voids the watermark and " +
      "forces the full battery") {
    val (t, dd, a) = (TestSpark.tmpDir("fsck_f_t"),
      TestSpark.tmpDir("fsck_f_d"), TestSpark.tmpDir("fsck_f_a"))
    TextIndex.ingestShard(spark, t,
      corpus.where(col("doc_id") < 3), "doc_id", "text", key = Some("w0"))
    TextIndex.ingestShard(spark, t,
      corpus.where(col("doc_id") >= 3), "doc_id", "text", key = Some("w1"))
    Dedup.indexCheckAndIngest(spark, dd, corpus, "doc_id", "text",
      0.6, deliveryKey = Some("w0")): Unit
    Similarity.ivfIndexBuild(spark, a, vecs, 2L, key = Some("w0"))
    val armed = reportOf(IndexFsck.incremental(spark, t, dd, Some(a)))
    assert(armed(("cross", "incremental_fallback"))._1 == 1L)
    // the fold consumes both verified text commits: entries the
    // watermark certified are gone, so "check only what's new" can no
    // longer compose with the old certificate
    TextIndex.compact(spark, t)
    val rep = reportOf(IndexFsck.incremental(spark, t, dd, Some(a)))
    assert(rep(("cross", "incremental_fallback"))._1 == 1L)
    assert(rep.filterNot(_._1 == ("cross", "incremental_fallback"))
      .values.forall(_._1 == 0L)) // the fold itself was clean
  }
}
