package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/**
 * Deduplication tier for training-data pipelines: exact (hash-groupBy),
 * exact n-gram Jaccard (shingle join), MinHash+LSH banding, and SimHash
 * banding.
 *
 * Scale design: nothing here is all-pairs. Exact dedup is one groupBy.
 * Jaccard joins on the shingle key with a document-frequency cap (hot
 * shingles contribute quadratic pairs and near-zero signal). MinHash
 * candidates come from banded signature buckets (`groupBy(band,
 * bucket)`-style self-join), and verification work is proportional to
 * CANDIDATES, not n² — the LSH s-curve (b=16, r=4 ⇒ threshold ≈ 0.5)
 * makes misses of true near-dups (J ≥ 0.8) negligible.
 */
object Dedup {

  /** Scoped caching for multi-use intermediates: persist `dfs` for the
   *  duration of `body`, eagerly materialize body's (small) result via
   *  localCheckpoint while the caches are live, then release them — a
   *  long-lived engine must not accumulate multi-GB intermediate caches
   *  across queries. The by-name `body` is planned and executed inside
   *  the persist scope, so every reference to a persisted frame (or a
   *  plan containing one) reads the cache.
   */
  private[graft] def withScopedPersist(dfs: DataFrame*)(body: => DataFrame): DataFrame = {
    val cached = dfs.map(
      _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try body.localCheckpoint(true)
    finally cached.foreach(_.unpersist(false))
  }

  /** Exact duplicate groups by content hash: (h, keep_id, n_dups). */
  def exactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
      .where(col("n_docs") > 1)

  /** Distinct hashed shingle set `(doc_id, sh, h2)` with a doc-frequency
   *  cap: shingles present in more than `maxDf` docs carry no dedup
   *  signal and would blow up the join quadratically.
   *
   *  The shingle string is hashed to TWO independent 64-bit values
   *  (`sh` = identity for joins/dedup, `h2` = second minhash base)
   *  immediately after the explode and then dropped — every downstream
   *  shuffle moves 8-byte longs instead of multi-word strings, and set
   *  semantics are unchanged up to 64-bit collisions (P[any] ~ n²/2⁶⁴,
   *  negligible).
   *
   *  Dedup + df-cap happen in ONE bounded-buffer aggregation
   *  (BoundedDistinctLongsAgg): group postings by shingle, keep at most
   *  maxDf+1 DISTINCT doc ids per group, drop saturated groups. One
   *  shuffle (the earlier distinct + count-over-window formulation took
   *  two, plus a sort), and — decisively at 100 TB — map-side partial
   *  aggregation caps every partial at maxDf+1 longs, so a ubiquitous
   *  shingle ships one tiny buffer per map partition instead of
   *  funneling billions of postings into a single window task. (Round-3
   *  alternatives measured and rejected: hot-set broadcast anti-join
   *  re-ran the explode lineage twice; count-over-window single-tasks
   *  the hottest key.)
   */
  def shingleSet(
      docs: DataFrame, idCol: String, textCol: String, maxDf: Long = 200L): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    require(maxDf >= 1 && maxDf < Int.MaxValue, "maxDf must fit an int cap")
    docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(TextOps.shinglesOf(col("toks"), 3)).as("s"))
      .select(
        col("doc_id"),
        xxhash64(col("s")).as("sh"),
        xxhash64(lit("graft-mh2"), col("s")).as("h2"))
      .groupBy("sh", "h2")
      .agg(toCol(graft.functions.BoundedDistinctLongsAgg(
        toExpr(col("doc_id")), (maxDf + 1).toInt).toAggregateExpression()).as("docs"))
      // exact groups emit their full distinct set (size = true df);
      // saturated groups emit maxDf+1 ids and are dropped here
      .where(size(col("docs")) <= maxDf)
      .select(explode(col("docs")).as("doc_id"), col("sh"), col("h2"))
  }

  private def jaccardOf(pairsWithInter: DataFrame, sizes: DataFrame): DataFrame =
    pairsWithInter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), Seq("b_id"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))

  private def sizesOf(shingles: DataFrame): DataFrame =
    shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))

  /** Exact n-gram Jaccard pairs ≥ threshold via a shingle-key join —
   *  the correctness baseline for the MinHash path.
   */
  def exactJaccardPairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val a = shingles.select(col("doc_id").as("a_id"), col("sh"))
    val b = shingles.select(col("doc_id").as("b_id"), col("sh"))
    val inter = a.join(b, Seq("sh")).where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    jaccardOf(inter, sizesOf(shingles))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** k MinHash values per doc from the TWO base hashes carried on the
   *  shingle set (`sh`, `h2`), hash_i = sh XOR rotl(h2, i) — ONE typed
   *  aggregate with a long[k] buffer (MinhashSignatureAgg) emitting the
   *  signature as a single array<long> column `mh`, so every downstream
   *  shuffle moves one narrow column instead of k. The string was
   *  hashed only twice at shingle time (hashing it k times dominated
   *  the signature cost). XOR-rotate mixing is not strictly min-wise
   *  independent, but LSH only needs bucket diversity here — final
   *  answers come from the EXACT verification pass.
   */
  def minhashSignature(shingles: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    shingles.groupBy("doc_id").agg(
      toCol(graft.functions.MinhashSignatureAgg(
        toExpr(col("sh")), toExpr(col("h2")), k).toAggregateExpression()).as("mh"))
  }

  /** (doc_id, band, bucket) rows of a signature table — the banded LSH
   *  index both the self-join and the cross (incremental) join probe.
   */
  def bandBuckets(signature: DataFrame, k: Int = 64, bands: Int = 16): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("mh"), b * r + 1, r)).as("bucket"))
    }
    signature
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Banded LSH candidate pairs: docs sharing any (band, bucket). */
  def lshCandidates(signature: DataFrame, k: Int = 64, bands: Int = 16): DataFrame = {
    val buckets = bandBuckets(signature, k, bands)
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** Candidate-driven exact verification: intersection counts are
   *  computed only for candidate pairs (work ∝ candidates, not n²).
   *  (Measured note: pre-restricting the shingle set to candidate docs
   *  via a broadcast semi-join was tried and LOST at bench scale — the
   *  extra scan passes cost more than the small shuffles they avoid;
   *  at much larger corpus-to-candidate ratios it becomes the right
   *  plan and the join keys here already make Catalyst prune columns.)
   */
  def verifyJaccard(
      candidates: DataFrame, shingles: DataFrame, threshold: Double): DataFrame = {
    val inter = candidates
      .join(shingles.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
      .join(shingles.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    jaccardOf(inter, sizesOf(shingles))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Signature-estimated Jaccard prune: the fraction of equal minhash
   *  components estimates J with σ = sqrt(J(1-J)/k) ≈ 0.06 at k=64, so
   *  a cut ~5σ below the real threshold discards the (numerous)
   *  low-similarity band collisions while keeping every true pair with
   *  overwhelming probability — the exact verify still decides.
   */
  def estimatePrune(
      candidates: DataFrame, signature: DataFrame, k: Int, minEst: Double): DataFrame = {
    def sigAs(side: String) = signature.select(
      col("doc_id").as(s"${side}_id"), col("mh").as(s"${side}_mh"))
    val eq = aggregate(
      zip_with(col("a_mh"), col("b_mh"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    candidates
      .join(sigAs("a"), Seq("a_id"))
      .join(sigAs("b"), Seq("b_id"))
      .withColumn("est", eq.cast("double") / k)
      .where(col("est") >= minEst)
      .select("a_id", "b_id")
  }

  /** MinHash+LSH near-dup pipeline: shingle → sign → band → estimate →
   *  verify. The shingle set feeds the signature AND both sides of the
   *  verification join — persist it once (scoped, see
   *  withScopedPersist) instead of recomputing the explode+bounded-agg
   *  chain four times.
   */
  def minhashDedup(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 64, bands: Int = 16): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol)
    val sig = minhashSignature(sh, k)
    withScopedPersist(sh, sig) {
      verifyJaccard(
        estimatePrune(lshCandidates(sig, k, bands), sig, k, minEst = threshold / 2),
        sh, threshold)
    }
  }

  /**
   * INCREMENTAL near-dup check: decide, for each document of a NEW
   * `batch`, whether it near-duplicates the EXISTING `corpus` — the
   * production ingest shape, where the corpus's banded signature index
   * is write-once state and only batch×corpus band collisions are
   * joined; the corpus is never self-joined and never re-clustered.
   * Ids of the two sides must be disjoint.
   *
   * The shingle df-cap is computed over corpus ∪ batch (one shingle
   * pass), matching the batch-mode pipelines; candidates are the CROSS
   * band-bucket collisions only, then the usual estimate-prune and
   * exact verification. Output, one row per batch doc:
   * (doc_id, is_dup, match_id, jaccard) with the best corpus match
   * (max jaccard rounded to 6 before ranking, ties to lowest id) or
   * nulls when nothing clears `threshold`.
   */
  def incrementalDedup(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 64, bands: Int = 16): DataFrame = {
    val all = corpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    val sh = shingleSet(all, idCol, textCol)
    val sig = minhashSignature(sh, k)
    val corpusIds = corpus.select(col(idCol).as("doc_id"))
    val batchIds = batch.select(col(idCol).as("doc_id"))
    withScopedPersist(sh, sig) {
      val bb = bandBuckets(sig, k, bands)
      val cand = bb.join(corpusIds, Seq("doc_id")).as("x")
        .join(bb.join(batchIds, Seq("doc_id")).as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      val verified = verifyJaccard(
        estimatePrune(cand, sig, k, minEst = threshold / 2), sh, threshold)
      val best = verified
        .withColumn("j", round(col("jaccard"), 6))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("b_id").orderBy(col("j").desc, col("a_id"))))
        .where(col("rn") === 1)
        .select(col("b_id").as("doc_id"), col("a_id").as("match_id"),
          col("j").as("jaccard"))
      batchIds.join(best, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("match_id").isNotNull.as("is_dup"),
          col("match_id"), col("jaccard"))
    }
  }

  /**
   * PERSISTED-LSH-INDEX incremental dedup step — the posture where the
   * corpus is too big to ever re-read: the index stores, per ingested
   * doc, its MinHash signature AND its df-capped shingle postings
   * (everything candidate generation and exact verification need), so
   * checking a new shard touches corpus TEXT never and corpus state
   * only ∝ collisions. Per arriving shard: shingle + sign the SHARD
   * (df-cap within the shard — the stored index is immutable, so a
   * global df is undefinable by design), join its band buckets against
   * the stored index's (cross collisions only; the corpus is never
   * self-joined), estimate-prune on signatures, exact-verify on
   * postings, then append the shard's own signatures and postings —
   * the index maintains itself. Returns (a_id, b_id, jaccard) with
   * `a_id` from the pre-existing index and `b_id` from the shard.
   *
   * Scale shape: per-shard cost is shard-linear plus collision-
   * proportional joins on 8-byte keys; per-doc set SIZES are stored
   * beside the signatures so verification never re-aggregates the
   * index, and its postings scan prunes to candidate docs via a
   * broadcast semi-join first. Index writes publish through the SAME
   * commit protocol as the store tables (graft.store.CommitLog): both
   * index tables stage under one immutable commit dir and one
   * version-file create makes them visible together. The verdict
   * is materialized via localCheckpoint BEFORE the append so the
   * returned frame can never observe its own shard in the index.
   *
   * EXACTLY-ONCE: pass `deliveryKey` (e.g. the upstream batch id) and a
   * redelivered/retried shard FAILS LOUDLY instead of re-appending its
   * signatures and postings (which would permanently duplicate index
   * state and double-report pairs on every later shard). Keys ride the
   * commit log as `#txn:<key>` lines, mirroring the manifest store's
   * ingestBatchAtomic; the duplicate check runs both up front (cheap,
   * before any scan) and inside the commit closure (closes the race
   * with a concurrent redelivery). Shards must ingest SEQUENTIALLY:
   * two concurrent shards both read the old live set and never
   * cross-check each other — the commit protocol serializes the
   * appends but not the missed a↔b pair between them.
   */
  /** True iff a shard with this delivery key is already committed —
   *  the cheap up-front probe a consumer (the streaming maintainer)
   *  makes before paying the shingle+sign cost of
   *  [[indexCheckAndIngest]] (a redelivered shard would lose to its
   *  own `#txn:` key anyway; the in-commit check still guards the
   *  concurrent race).
   */
  def indexHasDelivery(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      key: String): Boolean =
    new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2.contains("#txn:" + key)

  /** Latest published version (0 = never written) — the cheap "did
   *  anything commit?" probe a redelivery test pins on.
   */
  def indexVersion(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Long =
    new graft.store.CommitLog(s"$indexDir/_manifests").latest(spark)._1

  /** Live tombstone commits (`t-` prefix) — each one
   *  [[indexForgetDocs]] call's gone doc-id set. */
  private def indexTombDirs(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[String] =
    new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2.filter(_.startsWith("t-"))

  /** The live tombstoned doc ids as one (doc_id) frame — None when no
   *  tombstones are live, so the no-deletions case adds zero plan
   *  nodes to the check/pair read paths. (Global union — observability
   *  only; reads scope per commit via [[readIndexLeg]].)
   */
  private def indexGone(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[DataFrame] = {
    val ts = indexTombDirs(spark, indexDir)
    Option.when(ts.nonEmpty)(
      readLeg(spark, "gone", ts.map(t => s"$indexDir/data/$t/gone"))
        .select("doc_id"))
  }

  /** Union one doc-grain index leg across live shard commits with
   *  ORDER-SCOPED tombstones applied: a tombstone covers exactly the
   *  commits that PRECEDE it in the commit log's live list, so a doc
   *  re-ingested after its takedown (a re-crawl of the same id — the
   *  StreamForget + crawl-pipeline composition) serves normally
   *  instead of being silently killed by a global gone set (the same
   *  scoping as the text index's readDocGrain). Commits group by
   *  their subsequent-tombstone set — ≤ #tombstones+1 broadcast
   *  anti-joins, zero plan nodes when none are live. `idCols` names
   *  the column(s) carrying doc ids (pair reports carry two). Returns
   *  None when no live commit holds the leg.
   */
  /** Pinned ON-DISK schema per index leg (this module writes all of
   *  them) — passed to every leg read so Spark skips the per-read
   *  footer-inference job (the TextIndex.legSchemas rationale).
   */
  private val legSchemas: Map[String, org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types._
    Map(
      "sig" -> StructType(Seq(
        StructField("doc_id", LongType),
        StructField("mh", ArrayType(LongType)),
        StructField("n", LongType))),
      "sh" -> StructType(Seq(
        StructField("doc_id", LongType), StructField("sh", LongType),
        StructField("h2", LongType))),
      "pairs" -> StructType(Seq(
        StructField("a_id", LongType), StructField("b_id", LongType),
        StructField("jaccard", DoubleType))),
      "gone" -> StructType(Seq(StructField("doc_id", LongType))))
  }

  private def readLeg(
      spark: org.apache.spark.sql.SparkSession, leg: String,
      paths: Seq[String]): DataFrame =
    spark.read.schema(legSchemas(leg)).parquet(paths: _*)

  private def readIndexLeg(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      sub: String, idCols: String*): Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val ordered = new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2
      .filter(e => e.startsWith("c-") || e.startsWith("t-"))
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).exists(hp)
    }
    val withScope = ordered.zipWithIndex
      .filter(_._1.startsWith("c-"))
      .map { case (c, i) =>
        (s"$indexDir/data/$c/$sub",
          ordered.drop(i + 1).filter(_.startsWith("t-")))
      }
      .filter(p => exists(p._1))
    if (withScope.isEmpty) None
    else Some(withScope.groupBy(_._2).map { case (tombs, roots) =>
      val base = readLeg(spark, sub, roots.map(_._1))
      if (tombs.isEmpty) base
      else {
        val gone = tombs
          .map(t => readLeg(spark, "gone", Seq(s"$indexDir/data/$t/gone")))
          .reduce(_.unionByName(_)).select("doc_id")
        idCols.foldLeft(base)((d, c) =>
          d.join(broadcast(gone.select(col("doc_id").as(c))), Seq(c),
            "left_anti"))
      }
    }.reduce(_.unionByName(_)))
  }

  /** DOCUMENT DELETION for the persisted LSH dedup index (takedown
   *  without rebuild): ONE tombstone commit `t-<uuid>` holding the
   *  gone doc ids. Signatures and shingle postings of a gone doc stop
   *  participating in candidate generation and verification
   *  IMMEDIATELY (every check anti-joins the gone set), and persisted
   *  pair reports stop serving pairs that mention a gone doc on
   *  either side. A FULL [[indexCompact]] physically drops the gone
   *  docs' rows from sig/sh/pairs and retires the tombstone;
   *  [[indexVacuum]] erases the superseded bytes — the store's
   *  forgetDataset lifecycle. A pre-delete [[indexCloneAsOf]] branch
   *  still serves the doc until vacuum.
   *
   *  Unlike the text index there are NO corpus-level aggregates to
   *  delta (the index stores only doc-grain rows), so the tombstone
   *  is a pure idempotent set: re-deleting an already-gone or
   *  never-ingested id is harmless by construction, concurrent
   *  forgets of disjoint or overlapping sets compose (gone sets
   *  union), and no stale-abort is needed. `key` rides the same
   *  `#txn:` ledger as ingest — a redelivered takedown is refused
   *  loudly, and keys survive compaction. Cost: O(ids) — never ∝
   *  the index.
   */
  def indexForgetDocs(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      ids: Seq[Long], key: Option[String] = None): Unit = {
    require(ids.nonEmpty && ids.length <= 1000000,
      s"indexForgetDocs takes 1..1000000 ids per call (got ${ids.length})")
    val clog = new graft.store.CommitLog(s"$indexDir/_manifests")
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad delivery key: $k")
      "#txn:" + k
    }
    txn.foreach { t =>
      require(!clog.latest(spark)._2.contains(t),
        s"delete with delivery key ${key.get} was already applied to " +
          s"$indexDir — redelivery rejected (deletion is exactly-once)")
    }
    import spark.implicits._
    // keyed takedowns embed the key digest in the tombstone dir name
    // (the keyed-commit discipline) so the applied gone set stays
    // addressable by key — [[indexGoneForDelivery]] is what makes a
    // multi-index takedown's replay re-read the EXACT id set the
    // first attempt applied instead of re-deriving a drifted one
    val name = key match {
      case Some(dk) =>
        s"t-k${keyDigest(dk)}-${java.util.UUID.randomUUID().toString.take(8)}"
      case None => s"t-${java.util.UUID.randomUUID().toString.take(12)}"
    }
    ids.distinct.toDF("doc_id")
      .coalesce(1).write.parquet(s"$indexDir/data/$name/gone")
    val published = clog.commit(spark) { now =>
      if (txn.exists(now.contains)) None // raced redelivery
      else Some(now :+ name :++ txn.toSeq)
    }
    if (!published) {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/data/$name")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(p, true): Unit
      require(published,
        s"delete with delivery key ${key.get} raced a concurrent " +
          s"redelivery into $indexDir — this attempt's staging was dropped")
    }
  }

  /** RAW id-membership probe for re-fetch routing: which of `ids` has
   *  a signature row in a live shard commit published BEFORE the
   *  first log entry owned by `excludeKeys` (a keyed `c-k<digest>-`
   *  commit or a `#txn:` entry of one of the keys — their `.del` /
   *  `.add` sub-keys included by passing them explicitly), IGNORING
   *  tombstones. Both carve-outs exist for REPLAY STABILITY — the
   *  streaming crawl pipeline's fresh/re-fetch split must be
   *  identical on first run, on crash-replay, AND on a full
   *  fresh-checkpoint redelivery after LATER batches mutated
   *  membership: the log-position cutoff reconstructs the exact
   *  batch-start snapshot (batches are sequential, so everything at
   *  or after the batch's first own entry — its own legs and every
   *  later batch — is post-split state), and ignoring tombstones
   *  hides what any delete leg retired since. A PRE-batch tombstone
   *  whose bytes aren't yet compacted makes a re-crawled id classify
   *  as re-fetch instead of fresh, which is correctness-neutral
   *  (upserting a never-live id ≡ ingesting it). Stability holds
   *  while the batch's keyed commits are live AND no full fold or
   *  tombstone retirement has physically dropped the tombstoned rows
   *  this probe re-reads — the same "batch-grain reads precede
   *  compaction" contract as [[indexPairsForDelivery]], ENFORCEABLE
   *  with [[indexPin]]: a live pin makes folds and retirement refuse
   *  loudly instead of trusting this paragraph. Cost: one
   *  pruned scan of the sig
   *  legs semi-joined to the broadcast probe ids — the result is
   *  probe-bounded.
   */
  def indexKnownIds(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      ids: DataFrame, idCol: String,
      excludeKeys: Seq[String] = Seq.empty): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val digests = excludeKeys.map(keyDigest)
    val txns = excludeKeys.map("#txn:" + _).toSet
    def owned(e: String): Boolean =
      txns.contains(e) || digests.exists(d => e.startsWith(s"c-k$d-"))
    val live = new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2
    val cut = live.indexWhere(owned)
    val dirs = (if (cut >= 0) live.take(cut) else live)
      .filter(_.startsWith("c-"))
      .map(c => s"$indexDir/data/$c/sig")
      .filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).exists(hp)
      }
    if (dirs.isEmpty)
      ids.select(col(idCol)).limit(0)
    else
      readLeg(spark, "sig", dirs).select(col("doc_id").as(idCol))
        .join(broadcast(ids.select(col(idCol)).distinct()),
          Seq(idCol), "left_semi")
        .distinct()
  }

  /** DOCUMENT UPSERT for the persisted LSH dedup index (the crawl
   *  re-fetch lifecycle op, mirroring
   *  [[graft.text.TextIndex.upsertDocs]]): replace up to 65536 docs'
   *  content in place — one tombstone commit retiring the old
   *  signatures/postings ([[indexForgetDocs]]; ids never ingested
   *  no-op) followed by one [[indexCheckAndIngest]] shard of the new
   *  text. Because tombstones are ORDER-SCOPED (a tombstone covers
   *  only commits preceding it), the re-ingested generation serves
   *  immediately, and because the old version is tombstoned BEFORE
   *  the check, a re-fetched doc is near-dup-gated against the REST
   *  of the index, never against its own prior version — the exact
   *  failure a re-fetch-blind pipeline hits. Post-upsert candidate
   *  generation and verification equal an index that ingested the
   *  NEW text from the start; a later full [[indexCompact]]
   *  physically erases the superseded rows.
   *
   *  Exactly-once across the two commits is the text index's paired
   *  contract: `key` fans out to `<key>.del` / `<key>.add` entries,
   *  each leg short-circuits on its own committed key — a crash
   *  between the two replays with the delete leg a no-op and the add
   *  leg completing; a full redelivery is a version-preserving no-op
   *  that returns the PERSISTED pair report of the original attempt
   *  (when `persistPairs`; the empty report otherwise). Returns the
   *  new-text shard's verdict: every >= threshold pair between the
   *  upserted docs and the surviving index. Cost: O(ids) tombstone +
   *  one ordinary shard check — never ∝ the index.
   */
  def indexUpsertDocs(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      docs: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 64, bands: Int = 16, key: Option[String] = None,
      persistPairs: Boolean = false): DataFrame = {
    // ONE materialization feeds both legs: a nondeterministic source
    // evaluated twice could tombstone ids it never re-adds
    val snap = docs.select(col(idCol).cast("long").as(idCol),
      col(textCol).cast("string").as(textCol)).persist()
    try {
      val ids = snap.select(col(idCol)).distinct()
        .limit(65537).collect().map(_.getLong(0)).toSeq
      require(ids.nonEmpty && ids.length <= 65536,
        s"indexUpsertDocs takes 1..65536 distinct ids per call " +
          s"(got ${ids.length}); batch larger re-fetch waves")
      val (delKey, addKey) = (key.map(_ + ".del"), key.map(_ + ".add"))
      // an empty index has nothing to delete — the first upsert is a
      // plain founding shard. The delete leg must ALSO skip when the
      // ADD leg already committed: a founding upsert never ledgers
      // its delete key, so a redelivery would otherwise tombstone the
      // generation the first delivery just founded (the text verb's
      // guard, mirrored)
      val hasShards = new graft.store.CommitLog(s"$indexDir/_manifests")
        .latest(spark)._2.exists(_.startsWith("c-"))
      if (hasShards &&
          !delKey.exists(indexHasDelivery(spark, indexDir, _)) &&
          !addKey.exists(indexHasDelivery(spark, indexDir, _)))
        indexForgetDocs(spark, indexDir, ids, key = delKey)
      if (!addKey.exists(indexHasDelivery(spark, indexDir, _)))
        indexCheckAndIngest(spark, indexDir, snap, idCol, textCol,
          threshold, k, bands, deliveryKey = addKey,
          persistPairs = persistPairs)
      else if (persistPairs)
        // redelivery: the original attempt's report, replay-identical
        indexPairsForDelivery(spark, indexDir, addKey.get)
      else emptyPairs(spark)
    } finally snap.unpersist(): Unit
  }

  /** ONE keyed takedown's applied gone set — the replay-stable record
   *  a multi-index takedown ([[graft.streaming.StreamForget
   *  .forgetWhereAll]]) re-reads so its later legs tombstone the EXACT
   *  ids the first attempt resolved (re-deriving them would drift:
   *  the committed tombstone itself changes what pair ledgers and
   *  forward stores still serve). Loud if the key never delivered or
   *  its tombstone was already retired/folded — the same "batch-grain
   *  reads precede compaction" contract as [[indexPairsForDelivery]].
   */
  def indexGoneForDelivery(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      key: String): DataFrame = {
    val live = new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2
    require(live.contains("#txn:" + key),
      s"no takedown with delivery key $key in $indexDir")
    val matches = live.filter(_.startsWith(s"t-k${keyDigest(key)}-"))
    require(matches.nonEmpty,
      s"the tombstone of delivery key $key in $indexDir is not " +
        "addressable by key digest — a retirement or full fold " +
        "already consumed it (key-grain gone reads must happen " +
        "before the tombstone retires), or it predates keyed " +
        "tombstone naming")
    readLeg(spark, "gone", Seq(s"$indexDir/data/${matches.head}/gone"))
      .select("doc_id")
  }

  /** Live tombstoned-doc count — compact-scheduler observability. */
  def indexTombstoneCount(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Long =
    indexGone(spark, indexDir).map(_.count()).getOrElse(0L)

  /** INDEX OBSERVABILITY: one row of folded LSH-index statistics —
   *  (n_shards, n_docs, n_postings, n_pairs) from the index's own
   *  legs, never the corpus: n_docs counts live signature rows (a doc
   *  whose every shingle saturated its shard's df cap carries no
   *  signature and is genuinely unmatchable — the honest count),
   *  n_postings the live df-capped shingle postings, n_pairs the live
   *  persisted pair-report rows (0 when no shard persisted a report).
   *  Tombstoned docs are excluded everywhere, so the report reflects
   *  exactly what the probe paths can serve — the health check a
   *  dedup deployment watches (did a merge double postings? is the
   *  pair ledger growing?), completing stats parity with
   *  [[graft.text.TextIndex.stats]] and
   *  [[graft.sim.Similarity.ivfIndexStats]]. Cost: leg-grain
   *  counts — ∝ index, never corpus text.
   */
  def indexStats(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    val live = new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2
    val shards = live.filter(_.startsWith("c-"))
    require(shards.nonEmpty, s"no live commits in dedup index $indexDir")
    val nDocs = readIndexLeg(spark, indexDir, "sig", "doc_id").get
      .agg(count(lit(1)).as("n_docs"))
    val nPost = readIndexLeg(spark, indexDir, "sh", "doc_id").get
      .agg(count(lit(1)).as("n_postings"))
    val nPairs = readIndexLeg(spark, indexDir, "pairs", "a_id", "b_id")
      .map(_.agg(count(lit(1)).as("n_pairs")))
      .getOrElse(spark.range(1).select(lit(0L).as("n_pairs")))
    spark.range(1)
      .select(lit(shards.size.toLong).as("n_shards"))
      .crossJoin(nDocs).crossJoin(nPost).crossJoin(nPairs)
  }

  /** LIVE DOC MEMBERSHIP as one (doc_id) frame — the signature leg's
   *  tombstone-scoped readback (one row per live doc). The cross-index
   *  consistency check ([[graft.store.IndexFsck]]) compares this
   *  against the text and ANN memberships.
   */
  def indexDocIds(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame =
    readIndexLeg(spark, indexDir, "sig", "doc_id")
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: no live commits in dedup index $indexDir"))
      .select("doc_id")

  /** DEEP INTEGRITY CHECK (fsck) — recompute the dedup index's
   *  derived invariants from its own tombstone-scoped readbacks and
   *  report (check, violations, audited):
   *
   *  | check           | violation = …                                 |
   *  |-----------------|-----------------------------------------------|
   *  | sig_unique      | doc with > 1 live signature rows (the upsert
   *  |                 | discipline guarantees exactly one)            |
   *  | sig_sh_parity   | doc live in sig xor in shingle postings       |
   *  | sig_n_recount   | stored set size n ≠ live shingle recount      |
   *  | pairs_membership| persisted pair naming a non-live doc on
   *  |                 | either side                                   |
   *
   *  audited = live doc count for every check (the membership
   *  universe). All-zeros is the healthy state — ingest constructs
   *  sig FROM the shingle postings, so every check holds by
   *  construction at write time; a nonzero row means a stray writer,
   *  a torn fold, or a tombstone-scoping bug — the DETECTION half of
   *  the order-scoped-tombstone design. Cost ∝ index (doc- and
   *  shingle-grain joins), never corpus text.
   */
  def indexFsck(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    import spark.implicits._
    val sig = readIndexLeg(spark, indexDir, "sig", "doc_id")
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: no live commits in dedup index $indexDir"))
      .select(col("doc_id"), col("n")).persist()
    try {
      val nDocs = sig.select("doc_id").distinct().count()
      // coalesce: sum over zero rows is null — a degenerate universe
      // must report (0, 0), not NPE
      val isViol = (c: org.apache.spark.sql.Column) =>
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
      val shCounts = readIndexLeg(spark, indexDir, "sh", "doc_id")
        .map(_.groupBy("doc_id").agg(count(lit(1)).as("n2")))
      val checks: Seq[() => Seq[(String, Long, Long)]] = Seq(
        () => {
          val r = sig.groupBy("doc_id").agg(count(lit(1)).as("m"))
            .agg(isViol(col("m") > 1).as("viol")).head()
          Seq(("sig_unique", r.getLong(0), nDocs))
        },
        () => {
          // one full-outer pass serves BOTH membership parity and the
          // stored-set-size recount (a doc live on one side only is a
          // parity violation; a doc on both with n ≠ recount, a
          // recount violation)
          val r = sig.join(shCounts.getOrElse(
              spark.emptyDataset[(Long, Long)].toDF("doc_id", "n2")),
              Seq("doc_id"), "full_outer")
            .agg(isViol(col("n").isNull || col("n2").isNull).as("parity"),
              isViol(col("n").isNotNull && col("n2").isNotNull &&
                col("n") =!= col("n2")).as("recount")).head()
          Seq(("sig_sh_parity", r.getLong(0), nDocs),
            ("sig_n_recount", r.getLong(1), nDocs))
        },
        () => {
          val viol = indexPairsIfAny(spark, indexDir) match {
            case None => 0L
            case Some(pairs) =>
              val ids = pairs.select(col("a_id").as("doc_id"))
                .unionByName(pairs.select(col("b_id").as("doc_id")))
                .distinct()
              ids.join(sig.select("doc_id"), Seq("doc_id"), "left_anti")
                .count()
          }
          Seq(("pairs_membership", viol, nDocs))
        })
      graft.util.Par.par(checks).flatten
        .toDF("check", "violations", "audited")
    } finally sig.unpersist(): Unit
  }

  /** Publish/advance the dedup index's fsck verified watermark (see
   *  [[graft.store.CommitLog.FsckPrefix]]); pair with
   *  [[indexVersion]] read BEFORE the battery.
   */
  def indexPublishFsckWatermark(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      v: Long): Unit =
    new graft.store.CommitLog(s"$indexDir/_manifests")
      .publishFsckWatermark(spark, v)

  /** INCREMENTAL fsck — commit-local halves of [[indexFsck]]'s
   *  invariants over only the entries that appeared after the
   *  verified watermark (cost ∝ fresh commits, never ∝ index):
   *  `sig_unique` / `sig_sh_parity` / `sig_n_recount` within each
   *  fresh commit, `pairs_b_membership` (a fresh commit's pair report
   *  names only its own batch's docs on the b_id side — the a_id side
   *  references earlier commits and stays the FULL battery's job),
   *  and `tomb_wellformed` (duplicate gone ids). All five rows always
   *  present ((0, 0) when absent this window). None when the
   *  incremental premise fails — run [[indexFsck]] and republish.
   */
  def indexFsckIncremental(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[graft.store.FsckScope] = {
    import spark.implicits._
    new graft.store.CommitLog(s"$indexDir/_manifests")
      .fsckFreshEntries(spark).map { case (vNow, fresh) =>
        val conf = spark.sessionState.newHadoopConf()
        def exists(p: String): Boolean = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).exists(hp)
        }
        def legUnion(es: Seq[String], sub: String): Option[DataFrame] = {
          val dfs = es.map(e => (e, s"$indexDir/data/$e/$sub"))
            .filter(p => exists(p._2))
            .map { case (e, p) =>
              readLeg(spark, sub, Seq(p)).withColumn("cmt", lit(e)) }
          Option.when(dfs.nonEmpty)(dfs.reduce(_.unionByName(_)))
        }
        val commits = fresh.filter(_.startsWith("c-"))
        val tombs = fresh.filter(_.startsWith("t-"))
        val isViol = (c: org.apache.spark.sql.Column) =>
          coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
        val sig = legUnion(commits, "sig")
          .map(_.select(col("cmt"), col("doc_id"), col("n")).persist())
        try {
          val (uniqRow, parityRow, recountRow) = sig match {
            case None => (("sig_unique", 0L, 0L), ("sig_sh_parity", 0L, 0L),
              ("sig_n_recount", 0L, 0L))
            case Some(sg) =>
              val u = sg.groupBy("cmt", "doc_id").agg(count(lit(1)).as("m"))
                .agg(isViol(col("m") > 1).as("viol"),
                  count(lit(1)).as("aud")).head()
              val shCnt = legUnion(commits, "sh").get
                .groupBy("cmt", "doc_id").agg(count(lit(1)).as("n2"))
              val r = sg.join(shCnt, Seq("cmt", "doc_id"), "full_outer")
                .agg(isViol(col("n").isNull || col("n2").isNull)
                    .as("parity"),
                  isViol(col("n").isNotNull && col("n2").isNotNull &&
                    col("n") =!= col("n2")).as("recount"),
                  count(lit(1)).as("aud")).head()
              (("sig_unique", u.getLong(0), u.getLong(1)),
                ("sig_sh_parity", r.getLong(0), r.getLong(2)),
                ("sig_n_recount", r.getLong(1), r.getLong(2)))
          }
          val pairsRow = legUnion(commits, "pairs") match {
            case None => ("pairs_b_membership", 0L, 0L)
            case Some(pr) =>
              val b = pr.select(col("cmt"), col("b_id").as("doc_id"))
              val viol = b.join(sig.get.select("cmt", "doc_id"),
                  Seq("cmt", "doc_id"), "left_anti").count()
              ("pairs_b_membership", viol, pr.count())
          }
          val goneDf = legUnion(tombs, "gone")
          val tombRow = goneDf match {
            case None => ("tomb_wellformed", 0L, 0L)
            case Some(g) =>
              val r = g.groupBy("cmt", "doc_id").agg(count(lit(1)).as("m"))
                .agg(isViol(col("m") > 1).as("viol"),
                  count(lit(1)).as("aud")).head()
              ("tomb_wellformed", r.getLong(0), r.getLong(1))
          }
          val emptyIds = spark.emptyDataset[Long].toDF("doc_id")
          graft.store.FsckScope(
            vNow,
            Seq(uniqRow, parityRow, recountRow, pairsRow, tombRow),
            sig.map(_.select("doc_id").distinct().localCheckpoint(true))
              .getOrElse(emptyIds),
            goneDf.map(_.select("doc_id").distinct().localCheckpoint(true))
              .getOrElse(emptyIds))
        } finally sig.foreach(_.unpersist(): Unit)
      }
  }

  /** Stable digest of a delivery key, embedded in a keyed shard's
   *  commit-dir name (`c-k<digest>-<rand>`) so the shard's own pair
   *  report stays ADDRESSABLE BY KEY ([[indexPairsForDelivery]]). The
   *  random suffix keeps concurrent redelivery attempts staging into
   *  distinct dirs — only the publish winner's dir goes live, so the
   *  loser's cleanup can never touch committed data.
   */
  private def keyDigest(key: String): String =
    graft.store.CommitLog.keyDigest(key)

  /** The empty (a_id, b_id, jaccard) pair report. */
  private def emptyPairs(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType))))

  /** ONE keyed shard's persisted pair report — the batch-grain read
   *  the streaming crawl pipeline needs: a batch's report contains
   *  every pair involving that batch's docs (b_id side), is published
   *  atomically WITH the shard, and is replay-identical by
   *  construction — so a consumer deriving this batch's survivors
   *  must read THIS report, not the cumulative [[indexPairs]] union,
   *  whose cost grows with every duplicate the stream ever found.
   *  Loud if the key was never delivered, or if its commit has been
   *  folded away by compaction (then only the cumulative read
   *  remains); an addressable keyed shard ingested with
   *  `persistPairs = false` reads as the empty report.
   */
  def indexPairsForDelivery(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      key: String): DataFrame = {
    val live = new graft.store.CommitLog(s"$indexDir/_manifests")
      .latest(spark)._2
    require(live.contains("#txn:" + key),
      s"no shard with delivery key $key in $indexDir")
    val matches = live.filter(_.startsWith(s"c-k${keyDigest(key)}-"))
    require(matches.nonEmpty,
      s"the commit of delivery key $key in $indexDir is not addressable " +
        "by key digest — either a compaction folded it (batch-grain " +
        "pair reads must happen before the shard is compacted), or the " +
        "key arrived via indexMergeFrom (merge commits keep the source's " +
        "unkeyed c-<uuid> names, so a merged-in shard is not key-" +
        "addressable here), or the shard was committed by a version of " +
        "this library that predates key-digest commit naming; use " +
        "indexPairs for the cumulative union, which still holds every pair")
    val conf = spark.sessionState.newHadoopConf()
    // order-scoped tombstones: only the t- entries AFTER the keyed
    // commit hide its pairs (a takedown preceding a re-ingest of the
    // same id must not hide the fresh report)
    val ordered = live.filter(e =>
      e.startsWith("c-") || e.startsWith("t-"))
    val frames = matches.flatMap { d =>
      val p = s"$indexDir/data/$d/pairs"
      val hp = new org.apache.hadoop.fs.Path(p)
      if (!hp.getFileSystem(conf).exists(hp)) None
      else {
        val after = ordered.drop(ordered.indexOf(d) + 1)
          .filter(_.startsWith("t-"))
        val base = readLeg(spark, "pairs", Seq(p))
        Some(
          if (after.isEmpty) base
          else {
            val gone = readLeg(spark, "gone",
                after.map(t => s"$indexDir/data/$t/gone"))
              .select("doc_id")
            Seq("a_id", "b_id").foldLeft(base)((df, c) =>
              df.join(broadcast(gone.select(col("doc_id").as(c))),
                Seq(c), "left_anti"))
          })
      }
    }
    if (frames.isEmpty) emptyPairs(spark)
    else frames.reduce(_.unionByName(_))
  }

  /** Union of the PERSISTED per-shard pair reports
   *  (`indexCheckAndIngest(persistPairs = true)`) across live commits
   *  — the exactly-once readback of everything the index ever
   *  reported: each report staged under its shard's commit dir, so a
   *  replayed shard can neither re-report nor lose its pairs (the
   *  report is visible iff the shard is).
   */
  def indexPairs(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame =
    indexPairsIfAny(spark, indexDir).getOrElse(throw
      new IllegalArgumentException(
        s"requirement failed: no persisted pair reports under " +
          s"$indexDir — ingest with persistPairs = true"))

  /** The pair readback when any report was persisted, None otherwise —
   *  ONE metadata pass (log read + per-commit existence probe).
   *  Composite verbs branch on this EXPLICITLY instead of swallowing
   *  [[indexPairs]]' failure: a blanket catch would also swallow
   *  transient I/O errors, and a takedown's near-dup expansion that
   *  silently came up empty would let the copies escape erasure
   *  permanently (round-13 ADVICE).
   */
  def indexPairsIfAny(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[DataFrame] =
    readIndexLeg(spark, indexDir, "pairs", "a_id", "b_id")

  /** True iff any live commit persisted a pair report. */
  def indexHasPairReports(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Boolean =
    indexPairsIfAny(spark, indexDir).isDefined

  def indexCheckAndIngest(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      shard: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 64, bands: Int = 16,
      deliveryKey: Option[String] = None,
      persistPairs: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    // the index is MANIFEST-GOVERNED (graft.store.CommitLog — the same
    // protocol as the manifest store): each shard stages its signature
    // and postings tables under ONE immutable commit dir and publishes
    // them with one version-file create, so a crash mid-append leaves
    // an orphan dir, never a torn index (signatures without postings
    // would silently produce candidates that can't verify)
    val clog = new graft.store.CommitLog(s"$indexDir/_manifests")
    val txn = deliveryKey.map { key =>
      require(!key.contains('\n') && key.nonEmpty, s"bad delivery key: $key")
      "#txn:" + key
    }
    txn.foreach { t =>
      require(!clog.latest(spark)._2.contains(t),
        s"shard with delivery key ${deliveryKey.get} was already ingested " +
          s"into $indexDir — redelivery rejected (the index is exactly-once)")
    }
    val sh = shingleSet(shard, idCol, textCol)
    // signature AND set size in ONE pass over the shingle set: the
    // stored row is (doc_id, mh, n) — everything banding, estimation,
    // and the Jaccard denominator need
    val sig = sh.groupBy("doc_id").agg(
      toCol(graft.functions.MinhashSignatureAgg(
        toExpr(col("sh")), toExpr(col("h2")), k).toAggregateExpression()).as("mh"),
      count(lit(1)).as("n"))
    withScopedPersist(sh, sig) {
      val verdict =
        // tombstoned docs (order-scoped: commits before their
        // tombstone) neither generate candidates nor verify — a
        // deleted doc can't gate or pair; a RE-INGESTED one can
        readIndexLeg(spark, indexDir, "sig", "doc_id") match {
          case None => emptyPairs(spark)
          case Some(isig) =>
          val cand = bandBuckets(isig, k, bands).as("x")
            .join(bandBuckets(sig, k, bands).as("y"),
              col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
            .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
            .distinct()
          // est feeds BOTH the postings prune and the intersection
          // join — persist it or the band/estimate chain runs twice
          val est = estimatePrune(cand, isig.unionByName(sig), k,
            minEst = threshold / 2).persist()
          try {
            // candidate-driven exact verify against STORED state: index
            // postings semi-join down to candidate a_ids before the
            // intersection join, and set sizes come from the stored
            // sizes table — the index is never re-aggregated per shard
            val aPost = readIndexLeg(spark, indexDir, "sh", "doc_id").get
              .join(broadcast(est.select(col("a_id").as("doc_id")).distinct()),
                Seq("doc_id"), "left_semi")
              .select(col("doc_id").as("a_id"), col("sh"))
            val inter = est
              .join(aPost, Seq("a_id"))
              .join(sh.select(col("doc_id").as("b_id"), col("sh")),
                Seq("b_id", "sh"))
              .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
            jaccardOf(inter,
              isig.unionByName(sig).select("doc_id", "n"))
              .where(col("jaccard") >= threshold)
              .select(col("a_id"), col("b_id"), col("jaccard"))
              .localCheckpoint(true)
          } finally est.unpersist(): Unit
        }
      // verdict is already eagerly checkpointed (or an empty literal
      // frame) before the shard publishes itself. Both tables stage
      // under ONE immutable commit dir; the version-file create is the
      // only visibility point — no torn index on any crash. Keyed
      // shards embed the key digest in the dir name so their pair
      // report stays addressable by key (indexPairsForDelivery)
      val name = deliveryKey match {
        case Some(dk) =>
          s"c-k${keyDigest(dk)}-${java.util.UUID.randomUUID().toString.take(8)}"
        case None => s"c-${java.util.UUID.randomUUID().toString.take(12)}"
      }
      sig.write.parquet(s"$indexDir/data/$name/sig")
      sh.write.parquet(s"$indexDir/data/$name/sh")
      if (persistPairs)
        // the pair REPORT rides the shard's own commit: visible iff the
        // shard is, so a replayed shard can neither re-report nor lose
        // it (repartition(1): the empty first-shard verdict is a
        // 0-partition literal frame, which would write no readable file)
        verdict.repartition(1)
          .write.parquet(s"$indexDir/data/$name/pairs")
      val published = clog.commit(spark) { now =>
        if (txn.exists(now.contains)) None // raced redelivery — abort
        else Some(now :+ name :++ txn.toSeq)
      }
      if (!published) {
        val p = new org.apache.hadoop.fs.Path(s"$indexDir/data/$name")
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(p, true): Unit
        require(published,
          s"shard with delivery key ${deliveryKey.get} raced a concurrent " +
            s"redelivery into $indexDir — this attempt's staging was dropped")
      }
      verdict
    }
  }

  /** SIZE-TIERED shard compaction for the persisted LSH index — the
   *  same LSM policy as the text index and the rollup store: without
   *  it every ingested shard adds a commit dir forever and every
   *  check's sig/sh union grows linearly in shard count (query-
   *  PLANNING cost ∝ history). All three legs fold by pure
   *  concatenation — signatures and postings are doc-grain rows from
   *  disjoint doc spaces, pair reports are append-only facts — so the
   *  fold is one read+write of the `fanIn` smallest commits, no
   *  aggregation at all. `#txn:` delivery keys pass through UNTOUCHED
   *  (exactly-once survives any number of folds) and a concurrent
   *  writer moving any input aborts the publish (never double-fold).
   */
  /** REPLAY PIN (mid-replay lease) on the dedup index — the
   *  mechanism behind the crawl/RAG pipelines' contract: while any
   *  pin is live, folds and tombstone retirement REFUSE loudly, so
   *  [[indexKnownIds]]'s log-position membership cut and
   *  [[indexPairsForDelivery]]'s readback stay replay-stable. Ingest,
   *  forget, upsert, and reads stay allowed. Ledger entry — survives
   *  restart; idempotent both ways.
   */
  def indexPin(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      name: String): Unit =
    new graft.store.CommitLog(s"$indexDir/_manifests").pin(spark, name)
  def indexUnpin(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      name: String): Unit =
    new graft.store.CommitLog(s"$indexDir/_manifests").unpin(spark, name)
  def indexPins(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[String] =
    new graft.store.CommitLog(s"$indexDir/_manifests").pins(spark)

  private def requireUnpinned(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      what: String): Unit =
    new graft.store.CommitLog(s"$indexDir/_manifests")
      .requireUnpinned(spark, s"$what on $indexDir")

  def indexCompactTiered(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      fanIn: Int = 8): Unit = {
    requireUnpinned(spark, indexDir, "indexCompactTiered")
    val clog = new graft.store.CommitLog(s"$indexDir/_manifests")
    val (_, live) = clog.latest(spark)
    val all = live.filter(_.startsWith("c-"))
    val tombs = live.filter(_.startsWith("t-"))
    // tombstones fold away ONLY in a full fold, where each commit
    // drops exactly ITS OWN subsequent tombstones' docs (order-scoped
    // — a doc re-ingested after its takedown survives the fold);
    // partial folds concatenate pure WITHIN one run of consecutive
    // shard commits and splice their output at the run's position so
    // coverage is preserved exactly (the text index's discipline)
    val full = fanIn >= all.size
    val applyTombs = full && tombs.nonEmpty
    if (all.isEmpty || (all.size <= 1 && !applyTombs)) return
    val conf = spark.sessionState.newHadoopConf()
    val ordered = live.filter(e =>
      e.startsWith("c-") || e.startsWith("t-"))
    val name = s"c-${java.util.UUID.randomUUID().toString.take(12)}"
    // shuffle-free coalesce back to one shard's worth of files — a fold
    // that carries the SUM of its inputs' file counts forward would
    // defeat the small-files half of compaction's purpose
    val nsp = spark.sessionState.conf.numShufflePartitions
    val (dirs, scopeOf) =
      if (full) {
        val scopes = ordered.zipWithIndex
          .filter(_._1.startsWith("c-"))
          .map { case (c, i) =>
            (c, ordered.drop(i + 1).filter(_.startsWith("t-")))
          }.toMap
        (all, scopes)
      } else {
        // runs of consecutive shard commits between tombstone
        // boundaries; fold the fanIn smallest within the largest run
        val runs = ordered.foldLeft(Seq(Seq.empty[String])) { (acc, e) =>
          if (e.startsWith("t-")) acc :+ Seq.empty
          else acc.init :+ (acc.last :+ e)
        }
        val run = runs.maxBy(_.size)
        if (run.size <= 1) return
        val picked = run.map { d =>
          val p = new org.apache.hadoop.fs.Path(s"$indexDir/data/$d")
          val fs = p.getFileSystem(conf)
          (d, if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L)
        }.sortBy(_._2).take(math.max(2, fanIn)).map(_._1)
        (picked, picked.map(_ -> Seq.empty[String]).toMap)
      }
    if (dirs.size <= 1 && !applyTombs) return
    def fold(sub: String, coalesceTo: Int, idCols: String*): Boolean = {
      val srcs = dirs.map(d => (d, s"$indexDir/data/$d/$sub")).filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p._2)
        hp.getFileSystem(conf).exists(hp)
      }
      if (srcs.isEmpty) false
      else {
        srcs.map { case (d, p) =>
          val base = readLeg(spark, sub, Seq(p))
          val ts = scopeOf.getOrElse(d, Seq.empty)
          if (ts.isEmpty) base
          else {
            val gone = readLeg(spark, "gone",
                ts.map(t => s"$indexDir/data/$t/gone"))
              .select("doc_id")
            idCols.foldLeft(base)((df, c) =>
              df.join(broadcast(gone.select(col("doc_id").as(c))),
                Seq(c), "left_anti"))
          }
        }.reduce(_.unionByName(_))
          .coalesce(coalesceTo)
          .write.parquet(s"$indexDir/data/$name/$sub")
        true
      }
    }
    fold("sig", nsp, "doc_id"): Unit
    fold("sh", nsp, "doc_id"): Unit
    fold("pairs", 1, "a_id", "b_id"): Unit // pair reports optional per shard
    val replaced = dirs ++ (if (applyTombs) tombs else Seq.empty)
    // CommitLog.spliceReplace IN BOTH BRANCHES — a tombstone published
    // concurrently during a full fold sits after the inputs in log
    // order; appending the folded output after it would empty its
    // order-scoped coverage and silently resurrect the takedown (the
    // text index's discipline). None when an input moved under us —
    // abort, never double-fold.
    val published = clog.commit(spark) { now =>
      graft.store.CommitLog.unlessPinned(now)(
        graft.store.CommitLog.spliceReplace(now, replaced, name))
    }
    if (!published) {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/data/$name")
      p.getFileSystem(conf).delete(p, true): Unit
    }
  }

  /** Full fold: every live shard commit into one (see
   *  [[indexCompactTiered]] for the steady-state tiered policy).
   */
  def indexCompact(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Unit =
    indexCompactTiered(spark, indexDir, fanIn = Int.MaxValue)

  /** TOMBSTONE-SCOPED RETIREMENT (the text index's
   *  [[graft.text.TextIndex.retireOldestTombstone]] discipline on the
   *  LSH index): retire the OLDEST live tombstone by rewriting IN
   *  PLACE only the covered commits that actually mention its docs —
   *  sig/sh rows of the gone ids drop, pair-report rows naming a gone
   *  id on EITHER side drop (a pair can name a doc stored in another
   *  commit, so the containment probe checks all three legs). Each
   *  rewritten commit keeps its log position (and a keyed commit its
   *  key-digest prefix, so batch-grain pair addressing survives), so
   *  every other tombstone's coverage is untouched; commits whose
   *  rows are all gone drop from the live list. Cost ∝ the commits
   *  the docs live in — never the post-tombstone ingest stream, never
   *  a whole-index rewrite. One atomic commit publishes rewrites +
   *  retirement; concurrent c-/t- movement aborts loudly.
   */
  def indexRetireOldestTombstone(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Boolean = {
    requireUnpinned(spark, indexDir, "indexRetireOldestTombstone")
    val cl = new graft.store.CommitLog(s"$indexDir/_manifests")
    val (_, live) = cl.latest(spark)
    val snap = live.filter(e => e.startsWith("c-") || e.startsWith("t-"))
    val tIdx = snap.indexWhere(_.startsWith("t-"))
    if (tIdx < 0) return false
    val t = snap(tIdx)
    val covered = snap.take(tIdx).filter(_.startsWith("c-"))
    val conf = spark.sessionState.newHadoopConf()
    val gone = broadcast(
      readLeg(spark, "gone", Seq(s"$indexDir/data/$t/gone")).select("doc_id"))
    def sub(c: String, s0: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/data/$c/$s0")
      Option.when(p.getFileSystem(conf).exists(p))(
        readLeg(spark, s0, Seq(p.toString)))
    }
    // containment probe — ONE job over every covered commit's three
    // legs (pairs can name a doc stored in another commit, so both
    // pair sides probe too); a per-commit loop would pay one job's
    // fixed overhead per commit
    val touched: Set[String] = {
      val probes = covered.flatMap { c =>
        Seq(sub(c, "sig").map(_.select(col("doc_id"))),
          sub(c, "sh").map(_.select(col("doc_id"))),
          sub(c, "pairs").map(_.select(col("a_id").as("doc_id"))),
          sub(c, "pairs").map(_.select(col("b_id").as("doc_id"))))
          .flatten.map(_.withColumn("cmt", lit(c)))
      }
      if (probes.isEmpty) Set.empty
      else probes.reduce(_.unionByName(_))
        .join(gone, Seq("doc_id"), "left_semi")
        .select("cmt").distinct()
        .collect().map(_.getString(0)).toSet
    }
    val rewrites = covered.flatMap { c =>
      if (!touched.contains(c)) None
      else {
        val sig = sub(c, "sig")
        val sh = sub(c, "sh")
        val pairs = sub(c, "pairs")
        val name = (if (c.matches("c-k[0-9a-f]{16}-.*"))
          c.substring(0, 19) else "c") +
          s"-${java.util.UUID.randomUUID().toString.take(12)}"
        val dst = s"$indexDir/data/$name"
        val nsp = spark.sessionState.conf.numShufflePartitions
        var any = false
        for (df <- sig) {
          val live2 = df.join(gone, Seq("doc_id"), "left_anti").persist()
          if (!live2.isEmpty) {
            live2.coalesce(nsp).write.parquet(s"$dst/sig"); any = true
          }
          live2.unpersist(): Unit
        }
        for (df <- sh) {
          val live2 = df.join(gone, Seq("doc_id"), "left_anti").persist()
          if (!live2.isEmpty) {
            live2.coalesce(nsp).write.parquet(s"$dst/sh"); any = true
          }
          live2.unpersist(): Unit
        }
        for (df <- pairs) {
          // written even when EMPTY (repartition(1) forces a readable
          // file — the fold discipline): a commit's pair report leg
          // must survive retirement so cumulative pair readback keeps
          // at least one leg to read
          df.join(broadcast(gone.select(col("doc_id").as("a_id"))),
              Seq("a_id"), "left_anti")
            .join(broadcast(gone.select(col("doc_id").as("b_id"))),
              Seq("b_id"), "left_anti")
            .select(df.columns.map(col): _*)
            .repartition(1).write.parquet(s"$dst/pairs")
          any = true
        }
        Some(c -> (if (any) name else ""))
      }
    }.toMap
    val published = cl.commit(spark) { now =>
      if (now.filter(e => e.startsWith("c-") || e.startsWith("t-"))
          != snap) None
      else graft.store.CommitLog.unlessPinned(now)(Some(now.flatMap { e =>
        if (e == t) Seq.empty
        else rewrites.get(e) match {
          case Some("") => Seq.empty // fully-taken-down commit dropped
          case Some(n) => Seq(n)
          case None => Seq(e)
        }
      }))
    }
    if (!published) {
      for (n <- rewrites.values if n.nonEmpty) {
        val p = new org.apache.hadoop.fs.Path(s"$indexDir/data/$n")
        p.getFileSystem(conf).delete(p, true): Unit
      }
      throw new IllegalStateException(
        s"indexRetireOldestTombstone raced a concurrent writer at " +
          s"$indexDir — staging dropped; re-run against the new live set")
    }
    true
  }

  /** Retire up to `upTo` tombstones, oldest first. Returns the number
   *  retired.
   */
  def indexRetireTombstones(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      upTo: Int = Int.MaxValue): Int = {
    var n = 0
    while (n < upTo && indexRetireOldestTombstone(spark, indexDir)) n += 1
    n
  }

  /** ZERO-COPY BRANCH of the LSH index as of a published version —
   *  the shared CommitLog.cloneAsOf shallow clone: data hard-links,
   *  the as-of live set (delivery keys included) becomes the branch's
   *  first version, and the two indexes diverge independently (e.g.
   *  re-run a dedup campaign at a different threshold against a
   *  branch of corpus-scale stored state without copying a byte).
   */
  def indexCloneAsOf(
      spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, version: Long): Unit =
    new graft.store.CommitLog(s"$srcDir/_manifests").cloneAsOf(
      spark, s"$srcDir/data", s"$dstDir/data",
      new graft.store.CommitLog(s"$dstDir/_manifests"), version)

  /** Reclaim data dirs no longer referenced by the LATEST version
   *  (superseded by compaction) — run once in-flight readers drain.
   *  `keepVersions` additionally bounds the MANIFEST history
   *  (CommitLog.vacuumVersions — see its retention-floor contract).
   */
  /** Bound the MANIFEST history alone (CommitLog.vacuumVersions) —
   *  version files only, safe continuously; see TextIndex.vacuumManifest.
   */
  def indexVacuumManifest(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      keep: Int): Unit =
    new graft.store.CommitLog(s"$indexDir/_manifests")
      .vacuumVersions(spark, keep)

  def indexVacuum(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      keepVersions: Int = Int.MaxValue): Unit = {
    val clog = new graft.store.CommitLog(s"$indexDir/_manifests")
    val live = clog.latest(spark)._2.toSet
    val dd = new org.apache.hadoop.fs.Path(s"$indexDir/data")
    val fs = dd.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dd)) return
    fs.listStatus(dd)
      .filter(st => !live.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true): Unit)
    if (keepVersions != Int.MaxValue) clog.vacuumVersions(spark, keepVersions)
  }

  /**
   * FEDERATED MERGE of two persisted LSH dedup indexes: fold the
   * SOURCE index's stored signatures and postings into the destination
   * as ONE commit, and — the part a plain file move could never give
   * you — report every near-dup pair that SPANS the two corpora,
   * discovered entirely from STORED state: destination band buckets
   * cross-join source band buckets (collisions only, neither corpus is
   * self-joined), signature estimate prunes, exact verification runs
   * on both sides' stored df-capped postings semi-joined down to the
   * candidates. Corpus TEXT is never touched on either side — at
   * 100 TB merging two regional dedup indexes costs ∝ collision volume
   * plus the source-index rewrite, not a re-shingle of anything.
   *
   * Returns (a_id, b_id, jaccard) with `a_id` from the destination and
   * `b_id` from the source — the same orientation as
   * [[indexCheckAndIngest]] (the destination is "the index", the
   * source arrives). `persistPairs` stages the report under the merge
   * commit itself, so [[indexPairs]] readback stays exactly-once: the
   * cross-corpus pairs are visible iff the merge is.
   *
   * Contract: disjoint doc_id spaces (the shard contract), and merges
   * serialize with other writers like shards do — two concurrent
   * merges never cross-check each other. Exactly-once composes: the
   * source's `#txn:` keys ride into the destination's log (a shard
   * redelivered to the MERGED index is still rejected), a source
   * sharing any key with the destination is REFUSED (its docs are
   * already folded here), and the merge may carry its own
   * `deliveryKey`. The source is read-only; on failure the staging
   * drops and both indexes stand.
   */
  def indexMergeFrom(
      spark: org.apache.spark.sql.SparkSession, dstDir: String,
      srcDir: String, threshold: Double, k: Int = 64, bands: Int = 16,
      deliveryKey: Option[String] = None,
      persistPairs: Boolean = false): DataFrame = {
    val dlog = new graft.store.CommitLog(s"$dstDir/_manifests")
    val (srcV, srcLive) = new graft.store.CommitLog(s"$srcDir/_manifests")
      .latest(spark)
    val srcShards = srcLive.filter(_.startsWith("c-"))
    require(!srcLive.exists(_.startsWith("t-")),
      s"source index $srcDir has live tombstones — fully compact it " +
        "first (a merge folds doc-grain legs by concatenation and " +
        "cannot carry another index's pending deletions)")
    // + the snapshot-identity marker: keyless sources re-merged twice
    // must refuse too (graft.store.CommitLog.sourceIdentity)
    val srcTxn = srcLive.filter(_.startsWith("#txn:")) :+
      graft.store.CommitLog.sourceIdentity(srcV, srcLive)
    require(srcShards.nonEmpty, s"nothing to merge: $srcDir has no live shards")
    val txn = deliveryKey.map { key =>
      require(!key.contains('\n') && key.nonEmpty, s"bad delivery key: $key")
      "#txn:" + key
    }
    val dstNow = dlog.latest(spark)._2
    (srcTxn ++ txn).foreach { t =>
      require(!dstNow.contains(t),
        s"merge of $srcDir into $dstDir rejected: delivery key " +
          s"${t.stripPrefix("#txn:")} already lives in the destination — " +
          "its docs are already folded here (merging again would " +
          "duplicate signatures and postings)")
    }
    val conf = spark.sessionState.newHadoopConf()
    srcShards.foreach { d =>
      val hp = new org.apache.hadoop.fs.Path(s"$srcDir/data/$d")
      require(hp.getFileSystem(conf).exists(hp),
        s"source commit $d vanished mid-merge (concurrent vacuum?) — " +
          "re-read the source and retry")
    }
    def live(root: String, entries: Seq[String], sub: String): Seq[String] =
      entries.filter(_.startsWith("c-")).map(d => s"$root/data/$d/$sub")
    val dstSigDirs = live(dstDir, dstNow, "sig")
    val dstShDirs = live(dstDir, dstNow, "sh")
    val srcSig = readLeg(spark, "sig", live(srcDir, srcLive, "sig"))
    val srcSh = readLeg(spark, "sh", live(srcDir, srcLive, "sh"))
    val verdict =
      if (dstSigDirs.isEmpty)
        emptyPairs(spark)
      else {
        // dst tombstones apply (order-scoped): a deleted destination
        // doc must not pair with (or gate) the incoming corpus
        val dstSig = readIndexLeg(spark, dstDir, "sig", "doc_id").get
        val cand = bandBuckets(dstSig, k, bands).as("x")
          .join(bandBuckets(srcSig, k, bands).as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .distinct()
        val est = estimatePrune(cand, dstSig.unionByName(srcSig), k,
          minEst = threshold / 2).persist()
        try {
          // both posting scans semi-join down to candidate docs before
          // the intersection join — index-merge cost is collision-
          // proportional, never corpus-proportional
          val aPost = readIndexLeg(spark, dstDir, "sh", "doc_id").get
            .join(broadcast(est.select(col("a_id").as("doc_id")).distinct()),
              Seq("doc_id"), "left_semi")
            .select(col("doc_id").as("a_id"), col("sh"))
          val bPost = srcSh
            .join(broadcast(est.select(col("b_id").as("doc_id")).distinct()),
              Seq("doc_id"), "left_semi")
            .select(col("doc_id").as("b_id"), col("sh"))
          val inter = est
            .join(aPost, Seq("a_id"))
            .join(bPost, Seq("b_id", "sh"))
            .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
          jaccardOf(inter,
            dstSig.unionByName(srcSig).select("doc_id", "n"))
            .where(col("jaccard") >= threshold)
            .select(col("a_id"), col("b_id"), col("jaccard"))
            .localCheckpoint(true)
        } finally est.unpersist(): Unit
      }
    // stage the source's state (normalized to one commit dir) plus the
    // pairs leg; ONE version-file create publishes them together. The
    // pairs leg = the SOURCE'S OWN pair history (append-only facts —
    // they must ride the merge or indexPairs(dst) silently loses the
    // source's intra-corpus findings, the same rule indexCompactTiered
    // applies when folding) ∪ the cross-corpus report when requested
    val name = s"c-${java.util.UUID.randomUUID().toString.take(12)}"
    srcSig.write.parquet(s"$dstDir/data/$name/sig")
    srcSh.write.parquet(s"$dstDir/data/$name/sh")
    val srcPairDirs = srcShards.map(d => s"$srcDir/data/$d/pairs")
      .filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).exists(hp)
      }
    val stagedPairs =
      (srcPairDirs.map(d => readLeg(spark, "pairs", Seq(d))) ++
        (if (persistPairs) Seq(verdict) else Nil))
        .reduceOption(_.unionByName(_))
    stagedPairs.foreach(_.repartition(1)
      .write.parquet(s"$dstDir/data/$name/pairs"))
    val published = dlog.commit(spark) { now =>
      if ((srcTxn ++ txn).exists(now.contains)) None // raced duplicate
      else Some(now :+ name :++ srcTxn :++ txn.toSeq)
    }
    if (!published) {
      val p = new org.apache.hadoop.fs.Path(s"$dstDir/data/$name")
      p.getFileSystem(conf).delete(p, true): Unit
      require(published,
        s"merge of $srcDir into $dstDir raced a concurrent writer that " +
          "committed one of its delivery keys — this attempt's staging " +
          "was dropped")
    }
    verdict
  }

  /**
   * Connected components over an undirected near-dup pair list —
   * cluster resolution, the step that turns pairwise dedup output into
   * "keep one representative per group": every node gets
   * `comp = min(doc_id reachable from it)`.
   *
   * Min-label propagation WITH pointer jumping: each iteration every
   * node takes the min of its own label and its neighbors' labels
   * (join + union + groupBy — all hash-partitioned by node id, no
   * global structure), then shortcuts `comp ← comp(comp)` with one
   * self-join on the label table. A label is always the id of a
   * reachable node, and that node's label is a min over a further
   * reachable set, so the shortcut stays within the component while
   * doubling how far a round reaches: convergence is O(log diameter)
   * rounds, not O(diameter). Near-dup clusters are quasi-cliques
   * (diameter ≲ 3) where this costs one extra small join, but chained
   * corpora (versioned documents A~B~C~…) produce long paths at 100 TB
   * and the log bound is what keeps the driver-checked fixpoint loop
   * bounded there — `maxIter = 50` now guards chains of length ~2⁵⁰,
   * i.e. it cannot trip on any physical corpus. Each iteration is
   * localCheckpoint-ed: the lineage would otherwise double per round
   * and plan times would dominate.
   *
   * Input: (a_id, b_id) pairs. Output: (doc_id, comp) for every node
   * that appears in some pair.
   */
  def connectedComponents(
      pairs: DataFrame, maxIter: Int = 50,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    val edges = pairs
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // Adaptive execution: verified near-dup pairs are RARE relative to
    // the corpus (that's what dedup verification is for), so the edge
    // list is usually orders of magnitude smaller than the input — and
    // an iterative Spark loop over a tiny graph is pure fixed job
    // overhead (2 joins + checkpoint + agg per round). Below the bound
    // (~16 MB of longs at the default), union-find on the driver
    // answers in milliseconds with ZERO jobs and bit-identical output
    // (same min-reachable-id semantics); above it, the distributed
    // O(log diameter) loop below is the scale path. The count is free:
    // edges is already checkpoint-materialized.
    if (edges.count() <= driverEdgeLimit) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // cast to long BEFORE collect: int-typed ids coerce fine in the
      // distributed loop via Spark, but row.getLong on an IntegerType
      // row throws ClassCastException
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        // union by MIN id: the root is always the smallest id seen, so
        // the final find() IS the min reachable id — no second pass
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        parent.getOrElseUpdate(a min b, a min b)
      }
      val out: java.util.List[Row] = new java.util.ArrayList[Row]()
      parent.keys.toArray.sorted.foreach(id => out.add(Row(id, find(id))))
      // List-based createDataFrame → LocalRelation: carries EXACT size
      // statistics, so downstream joins against corpus-wide frames plan
      // as broadcasts (an RDD-backed frame defaults to "huge" stats and
      // forces a sort-merge shuffle of the big side)
      return edges.sparkSession.createDataFrame(
        out,
        StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("comp", LongType, nullable = false))))
    }
    // Fixpoint detection by label sum: a label only ever DECREASES
    // (propagation takes a min that includes the old label; the jump
    // rewrites to comp(comp) ≤ comp), so the exact sum of labels is
    // strictly decreasing until the fixpoint — "sum unchanged" ⟺
    // converged. That makes the per-round convergence test one
    // column-pruned aggregate over the just-checkpointed labels
    // instead of a next⨝prev join. decimal(38,0): a long sum overflows
    // at ~10⁹ nodes with 10¹²-range ids, exactly the 100 TB regime.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
        .unionByName(labels)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jumping: comp ← comp(comp). Every label is a node id
      // present in `prop` (labels start as self-ids and only ever move
      // to a reachable node's min), so the lookup hits; the left join +
      // coalesce is belt-and-braces for labels already at their root.
      val next = prop
        .join(
          prop.select(col("id").as("comp"), col("comp").as("cc")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("cc"), col("comp")).as("comp"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      // superseded label generations are checkpoint RDD blocks, not
      // CacheManager entries — ContextCleaner reclaims them once the
      // frames are unreferenced (Dataset.unpersist would be a no-op)
      labels = next
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("id").as("doc_id"), col("comp"))
  }

  /** Canonical-survivor selection — the step AFTER cluster resolution:
   *  per duplicate cluster keep the highest-quality member, ties to the
   *  smallest doc_id. One aggregation; the two-criteria argmax rides a
   *  single struct-max (lexicographic on (qppm, -doc_id)), so no
   *  members⨝winners re-join. `quality` must carry an exact integer
   *  `qppm` — a float quality here would let an ulp flip the survivor
   *  (see the ppm discipline in PipelineQueries).
   *
   *  Input: comps (doc_id, comp), quality (doc_id, qppm).
   *  Output: (comp, keep_id, n_members, best_q).
   */
  def canonicalPerCluster(comps: DataFrame, quality: DataFrame): DataFrame =
    comps.join(quality, Seq("doc_id"))
      .groupBy("comp")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("qppm").as("q"), (-col("doc_id")).as("nid"))).as("m"))
      .select(
        col("comp"),
        (-col("m.nid")).as("keep_id"),
        col("n_members"),
        (col("m.q").cast("double") / 1e6).as("best_q"))

  val SimhashBits = 60

  /**
   * 60-bit SimHash: per token-bit weighted vote (weight = token
   * multiplicity), bit set iff the vote is positive. The token hash is
   * the first 15 hex chars of md5 — an engine-portable 60-bit value, so
   * the whole pipeline is SQL-expressible and oracle-checkable.
   */
  def simhashSignature(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    val tok = docs.select(
      col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).cast("long").as("w"))
      .withColumn("h", conv(substring(md5(col("tk")), 1, 15), 16, 10).cast("long"))
    // one typed aggregate (long[bits] vote buffer) instead of 60
    // conditional-sum aggregate columns — same integer vote arithmetic
    tok.groupBy("doc_id").agg(
      toCol(graft.functions.SimhashSignatureAgg(
        toExpr(col("h")), toExpr(col("w")), SimhashBits).toAggregateExpression()).as("sig"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Exactly
   *  maxDist+1 bands: by pigeonhole a pair within distance maxDist
   *  cannot touch every band, so at least one band matches exactly and
   *  detection is DETERMINISTIC — the banded join is equivalent to the
   *  all-pairs filter without the n² work. Using the MINIMUM band count
   *  makes each band as wide as the bits allow (60/(maxDist+1), the
   *  first `60 mod (maxDist+1)` bands one bit wider): wider bands ⇒
   *  exponentially more buckets ⇒ fewer spurious collisions reaching
   *  the Hamming cut, and a smaller candidate explode factor. At the
   *  default maxDist=8 that is 9 bands (6×7 bits + 3×6 bits) vs the
   *  former fixed 10×6 — measured ~40% fewer band collisions on the
   *  near-dup corpus with bit-identical output.
   */
  def simhashPairs(signature: DataFrame, maxDist: Int = 8): DataFrame = {
    val nBands = maxDist + 1
    require(nBands >= 1 && nBands <= SimhashBits, "maxDist out of band range")
    val base = SimhashBits / nBands
    val wide = SimhashBits % nBands
    val widths = Seq.tabulate(nBands)(b => if (b < wide) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)).as("bucket"))
    }
    val buckets = signature
      .select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      // filter BEFORE distinct: the Hamming cut is a cheap codegen'd
      // bit_count on each candidate occurrence, while distinct is a
      // shuffle — dedup only the surviving pairs, not every band
      // collision (6-bit bands collide often on a big corpus)
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /**
   * Exact substring duplication spans: for every document, how many of
   * its length-`k` character windows also appear verbatim in at least
   * one OTHER document. This is the exact-match complement to
   * `TextOps.winnow`-style fingerprinting — the measurement behind
   * "deduplicate training data at the substring level": a doc with a
   * high `dup_ppm` is mostly boilerplate or a partial copy even when no
   * whole-doc or shingle-set method fires.
   *
   * Scale shape: windows are generated per-doc by a codegen'd
   * `transform(sequence(...))` (no UDF, no shuffle), then ONE distinct
   * and ONE window-frequency aggregation — both hash-partitioned by the
   * window string. `maxDf` drops ubiquitous windows (site chrome,
   * license headers) before the postings join, the same
   * quadratic-blowup guard as the shingle df-cap; at 100 TB the
   * stride-1 window set is ~chars-sized, so the production path is
   * stride > 1 or winnow-selected positions — stride stays a parameter
   * here and the sf corpora run stride 1 for an exact oracle.
   *
   * Output: (doc_id, n_windows, dup_windows, dup_ppm) for docs with at
   * least one shared window.
   */
  /**
   * Winnowed substring duplication — the CONTENT-DEFINED selection that
   * replaces [[substringDupSpans]]'s stride knob at scale. Every k-char
   * window is hashed, but only LOCAL MINIMA survive: position i is
   * selected iff md5(win_i) is the minimum over the trailing `w`
   * windows (the winnowing fingerprint, same discipline as
   * TextOps.winnow and the doc_winnow oracle). The standard guarantee
   * holds: any run of ≥ k + w - 1 shared characters shares at least one
   * SELECTED window, so cross-doc duplication is still detected — while
   * the df exchange sees only ~2/(w+1) of the positions, on 8-byte
   * xxhash64 keys. Selection runs INSIDE the scan via the native
   * WinnowSelect expression (one pass, O(w) digest ring, zero
   * selection shuffle) — the per-doc window-function formulation moved
   * every position through a doc-keyed exchange carrying 32-char
   * digests and measured 1.6× SLOWER than stride-1 at the 10× scale.
   *
   * Output per doc: (doc_id, n_fp, dup_fp, dup_ppm) over the selected
   * fingerprints — the winnowed analogue of substringDupSpans' counts.
   */
  def substringDupWinnow(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 50, w: Int = 8, maxDf: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    val t = col(textCol)
    val sel = docs.where(length(t) >= k)
      .select(col(idCol).as("doc_id"),
        explode(toCol(graft.functions.WinnowSelect(toExpr(t), k, w))).as("win"))
      .distinct()
    val byWin = org.apache.spark.sql.expressions.Window.partitionBy("win")
    sel
      .withColumn("df", count(lit(1)).over(byWin))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_fp"),
        count(when(col("df").between(2, maxDf), 1)).as("dup_fp"))
      .where(col("dup_fp") > 0)
      .select(
        col("doc_id"), col("n_fp"), col("dup_fp"),
        round(col("dup_fp").cast("double") / col("n_fp") * 1e6)
          .cast("long").as("dup_ppm"))
  }

  /**
   * Duplicated-SPAN extraction — the "which characters to cut" step of
   * exact substring dedup: every k-char window shared with another doc
   * (df ∈ [2, maxDf]) marks its character interval [pos, pos+k-1], and
   * overlapping/contiguous intervals merge into maximal spans. Output
   * one row per merged span: (doc_id, span_start, span_end, span_len,
   * n_windows), 1-based inclusive char positions, ordered by position.
   *
   * Plan shape: window hashing is the same narrow 8-byte-key explode as
   * [[substringDupSpans]]; the hot-set membership is one win-keyed
   * join; interval merging is a running max + segment sum over ONLY the
   * duplicated positions of each doc — partitioned by doc, so it scales
   * with docs, never the corpus.
   */
  /** Per-position k-char window hashes: (doc_id, pos 1-based, win). */
  private def windowHashes(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val t = col(textCol)
    docs
      .where(length(t) >= k)
      .select(
        col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(1), length(t) - (k - 1)),
          i => xxhash64(t.substr(i, lit(k))))).as(Seq("p0", "win")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("win"))
  }

  /** Merge the k-wide intervals of marked positions into maximal spans:
   *  (doc_id, pos) → (doc_id, span_start, span_end, n_windows), via a
   *  running max + segment sum partitioned BY DOC — scales with docs.
   */
  private def mergeWindowSpans(dupPos: DataFrame, k: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    dupPos
      .withColumn("prev_end",
        max(col("pos") + (k - 1)).over(
          byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("new_seg",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("seg", sum("new_seg").over(byDoc))
      .groupBy("doc_id", "seg")
      .agg(
        min("pos").cast("long").as("span_start"),
        (max("pos") + (k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
  }

  def substringDupExtract(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 50, maxDf: Long = 100000L): DataFrame = {
    val wins = windowHashes(docs, idCol, textCol, k)
    val hot = wins.select("doc_id", "win").distinct()
      .groupBy("win").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, maxDf))
      .select("win")
    mergeWindowSpans(wins.join(hot, Seq("win")).select("doc_id", "pos"), k)
      .select(
        col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"),
        col("n_windows"))
  }

  /**
   * APPLY the removal — keep-first exact substring dedup: a duplicated
   * window is cut from every doc EXCEPT the lowest-doc_id holder (the
   * "first occurrence" keeper, the Lee-et-al-style policy made
   * deterministic). Cut positions merge into maximal spans
   * ([[mergeWindowSpans]]), and each doc's cleaned text is stitched
   * from the kept complement segments in ONE array fold per doc — no
   * per-character explode, no string surgery in a shuffle.
   *
   * Output per doc: (doc_id, n_before, n_after, clean_fp = md5 of the
   * cleaned text) — the fingerprint proves the stitched text itself
   * matches the oracle, not just its length.
   */
  def substringDupPrune(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 50, maxDf: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val wins = windowHashes(docs, idCol, textCol, k)
    val keepers = wins.select("doc_id", "win").distinct()
      .groupBy("win").agg(
        count(lit(1)).as("df"), min("doc_id").as("keeper"))
      .where(col("df").between(2, maxDf))
      .select("win", "keeper")
    val cutPos = wins.join(keepers, Seq("win"))
      .where(col("doc_id") =!= col("keeper"))
      .select("doc_id", "pos")
    val spanArr = mergeWindowSpans(cutPos, k)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
        struct(col("span_start").cast("int").as("s"),
          col("span_end").cast("int").as("e")))).as("spans"))
    // stitch: fold the sorted disjoint cut spans, appending the kept
    // gap before each span, then the tail after the last (bound to the
    // joined "text" column, not the caller's column name)
    val tj = col("text")
    val stitched = aggregate(
      col("spans"),
      struct(lit(1).as("p"), lit("").as("acc")),
      (acc, sp) => struct(
        (sp.getField("e") + 1).as("p"),
        concat(acc.getField("acc"),
          tj.substr(acc.getField("p"), sp.getField("s") - acc.getField("p")))
          .as("acc")),
      acc => concat(acc.getField("acc"),
        tj.substr(acc.getField("p"),
          greatest(length(tj) - acc.getField("p") + 1, lit(0)))))
    docs.select(col(idCol).as("doc_id"), t.as("text"))
      .join(spanArr, Seq("doc_id"), "left")
      .withColumn("clean", when(col("spans").isNull, col("text")).otherwise(stitched))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_before"),
        length(col("clean")).cast("long").as("n_after"),
        md5(col("clean")).as("clean_fp"))
  }

  def substringDupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 50, stride: Int = 1, maxDf: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val starts = sequence(lit(1), length(t) - (k - 1), lit(stride))
    // Hash each k-char window to xxhash64 BEFORE the distinct/exchange:
    // the shuffle keys are 8-byte longs instead of k-char strings (~6×
    // less shuffle volume at k=50). Window equality becomes hash
    // equality — deterministic, so both posting sides agree; collisions
    // at 64 bits are negligible at any df-capped corpus size (same
    // contract as the Bloom decontamination path).
    val wins = docs
      .where(length(t) >= k)
      .select(
        col(idCol).as("doc_id"),
        explode(transform(starts, i => xxhash64(t.substr(i, lit(k))))).as("win"))
      .distinct()
    // df rides a window over the postings instead of a df-table join:
    // ONE exchange on win (skew-bounded — a window's postings cap at
    // its df, and over-maxDf boilerplate is only COUNTED, never
    // joined), then one doc-grain aggregation decides both counters.
    // Same plan family as shingleSet's df-cap; two exchanges + a join
    // cheaper than the materialize-hot-set formulation (measured).
    val byWin = org.apache.spark.sql.expressions.Window.partitionBy("win")
    wins
      .withColumn("df", count(lit(1)).over(byWin))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_windows"),
        count(when(col("df").between(2, maxDf), 1)).as("dup_windows"))
      .where(col("dup_windows") > 0)
      .select(
        col("doc_id"), col("n_windows"), col("dup_windows"),
        // int÷int double division + one round: bit-identical per engine
        round(col("dup_windows").cast("double") / col("n_windows") * 1e6)
          .cast("long").as("dup_ppm"))
  }

  /** Sorted-neighborhood near-dup detection (Hernández & Stolfo,
   *  SIGMOD'95): sort the corpus by a cheap content key (text prefix),
   *  compare each doc only to its `w - 1` successors in sort order, and
   *  keep pairs whose 3-token-shingle Jaccard clears `thresholdPpm`.
   *  The complement to hash blocking (minhashBands): candidate volume
   *  is EXACTLY `(w-1)·n` — no degenerate key can go quadratic, the
   *  property blocking lacks on skewed corpora.
   *
   *  Scale shape: the global order comes from [[graft.ops.Ranks
   *  .withGlobalRank]] (range exchange + per-partition offsets), never
   *  a single-partition window; the neighbor pairing is an equi-join on
   *  rank. The shuffle payload is each doc's distinct shingle-string
   *  array ×(w-1) — at 100 TB hash shingles to 8-byte ints first
   *  (intersection sizes are preserved; strings are kept here so an
   *  independent SQL engine can replicate the result exactly).
   *
   *  @return (a_id, b_id, jaccard_ppm) with a_id < b_id, threshold met
   */
  def sortedNeighborhoodPairs(
      docs: DataFrame,
      sortKeyLen: Int = 40,
      w: Int = 4,
      thresholdPpm: Long = 500000L): DataFrame = {
    val ranked = graft.ops.Ranks.withGlobalRank(
      docs.select(col("doc_id"), col("text"),
        substring(col("text"), 1, sortKeyLen).as("sk")),
      "rnk", Seq(col("sk"), col("doc_id")))
    val t = ranked
      .select(col("rnk"), col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("rnk"), col("doc_id"),
        array_distinct(TextOps.shinglesOf(col("toks"), 3)).as("sh"))
      .where(size(col("sh")) > 0)
    // t feeds BOTH join sides, and its lineage includes the ranking
    // RDD hop — without a scoped persist the range exchange, sort,
    // zipWithIndex and shingling all run twice (measured ~2×)
    withScopedPersist(t) {
      val right = t
        .withColumn("dd", explode(sequence(lit(1L), lit((w - 1).toLong))))
        .select((col("rnk") - col("dd")).as("lrnk"),
          col("doc_id").as("r_id"), col("sh").as("rsh"))
      t.select(col("rnk").as("lrnk"), col("doc_id").as("l_id"),
          col("sh").as("lsh"))
        .join(right, "lrnk")
        .select(
          least(col("l_id"), col("r_id")).as("a_id"),
          greatest(col("l_id"), col("r_id")).as("b_id"),
          size(array_intersect(col("lsh"), col("rsh"))).cast("long").as("i"),
          (size(col("lsh")) + size(col("rsh"))).cast("long").as("ab"))
        .select(col("a_id"), col("b_id"),
          expr("(1000000 * i) div (ab - i)").as("jaccard_ppm"))
        .where(col("jaccard_ppm") >= thresholdPpm)
    }
  }
}
