package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * PERSISTED INVERTED TEXT INDEX — the full-text-search sibling of the
 * persisted dedup and IVF indexes: a corpus too big to re-scan per
 * query is ingested shard by shard into commit-log-governed postings,
 * and BM25 queries touch only the query terms' token buckets, never
 * corpus text. (The reference's search surface is catalog-substring
 * only, src/dataset.py:21-36; this is the document-search posture a
 * training-data pipeline needs on top.)
 *
 * Layout per shard commit `c-<uuid>` (one CommitLog version-file
 * create makes all three visible together — a crash mid-ingest leaves
 * an invisible orphan, never a torn index):
 *   - `post/tb=<b>/`: (token, doc_id, tf, dl) — postings partitioned
 *     by a 16-way token-hash bucket so a query's parquet scan prunes
 *     to the buckets its terms hash into. `dl` is DENORMALIZED into
 *     the posting row (classic search-engine layout): scoring needs
 *     per-doc length, and carrying it here removes the query-time join
 *     against a doc-lengths table — at 100 TB that join would shuffle
 *     corpus-grain rows to serve a 3-term query.
 *   - `vocab/`: (token, df) — the shard's document frequencies. Shards
 *     partition docs, so corpus df = Σ shard df (a plain sum fold, the
 *     same merge-on-read monoid discipline as the rollup store).
 *   - `stats/`: 1 row (nd, tl) — shard doc count and total length;
 *     corpus stats fold by sum.
 *   - `pos/tb=<b>/`: (token, doc_id, positions) — the positional leg;
 *     makes stop-word-grade phrase queries a distributed aggregation
 *     ([[searchPhrasePositional]]) instead of a capped candidate list.
 *   - `del/db=<b>/`: (variant, token) — the vocabulary's deletion-
 *     neighborhood keys (depth 2), bucketed on the variant; makes
 *     fuzzy suggest a key probe instead of a full-vocab Levenshtein
 *     scan ([[suggestFuzzy]]).
 *   - `docs/fb=<b>/`: (doc_id, text) — the forward store, bucketed on
 *     doc id; phrase verify, RM3 feedback, and snippets answer from
 *     the index itself by point lookup ([[docsFor]]) instead of
 *     taking the corpus as a parameter.
 *
 * Query cost shape: |terms| vocab lookups (token-pruned scans), one
 * posting scan pruned to ≤|terms| of 16 buckets AND pushed-down token
 * equality, a doc-grain partial-aggregated sum, and a top-k window.
 * Nothing is ∝ corpus except the pruned posting scan itself, which is
 * ∝ the query terms' posting lists — the inverted-index contract.
 *
 * Exactly-once: `key` mirrors the dedup index's `#txn:` discipline —
 * a redelivered shard fails loudly instead of double-counting df and
 * doubling posting lists.
 */
object TextIndex {

  private val TokenBuckets = 16

  /** Deletion-neighborhood depth persisted in the `del` leg: every
   *  vocab token's variants with up to this many character deletions
   *  (SymSpell invariant: lev(q, t) <= d implies deletes<=d(q) and
   *  deletes<=d(t) intersect — candidates can overgenerate, never
   *  undergenerate; the final Levenshtein verifies). Fixed at ingest;
   *  [[suggestFuzzy]] takes the pruned path only for maxDist <= this.
   */
  private val DelMaxDist = 2

  /** Which OPTIONAL legs an ingest writes. [[LegProfile.Serving]]
   *  (the default) writes all three — a user-facing search index
   *  wants positional phrases, key-probe fuzzy suggest, and
   *  self-contained forward reads. [[LegProfile.Minimal]] writes
   *  none — right for indexes that only ever answer posting-level
   *  probes (the decontamination SHINGLE index is the canonical case:
   *  nobody fuzzy-suggests over 3-gram tokens, and its
   *  corpus-grain shingle vocabulary would pay ~|token|² deletion
   *  variants per distinct shingle for nothing). Commits in one index
   *  must use ONE profile: compaction/merge refuse mixed-generation
   *  folds loudly.
   */
  final case class LegProfile(pos: Boolean, del: Boolean, docs: Boolean)
  object LegProfile {
    val Serving = LegProfile(pos = true, del = true, docs = true)
    val Minimal = LegProfile(pos = false, del = false, docs = false)
  }

  private def clog(dir: String) =
    new graft.store.CommitLog(s"$dir/_manifests")

  /** Pinned ON-DISK schema per index leg — this module writes every
   *  leg, so the shape is static truth. Passed to every leg read via
   *  [[readLeg]] so Spark skips the per-read footer-inference job
   *  (measured ~40-100 ms each; a probe battery pays it dozens of
   *  times). Bucket columns (tb/db/fb) are LONG (pmod(xxhash64)), and
   *  the schema resolves them whether they sit in partition dirs
   *  (bucketed layout) or as data columns (the compact-to-plain empty
   *  edge case) — Spark matches user-schema fields by name on both
   *  sides.
   */
  private val legSchemas: Map[String, org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types._
    Map(
      "post" -> StructType(Seq(
        StructField("token", StringType), StructField("doc_id", LongType),
        StructField("tf", LongType), StructField("dl", LongType),
        StructField("tb", LongType))),
      "pos" -> StructType(Seq(
        StructField("token", StringType), StructField("doc_id", LongType),
        StructField("positions", ArrayType(IntegerType)),
        StructField("tb", LongType))),
      "vocab" -> StructType(Seq(
        StructField("token", StringType), StructField("df", LongType))),
      "stats" -> StructType(Seq(
        StructField("nd", LongType), StructField("tl", LongType))),
      "docs" -> StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("fb", LongType))),
      "del" -> StructType(Seq(
        StructField("variant", StringType), StructField("token", StringType),
        StructField("db", LongType))),
      "gone" -> StructType(Seq(StructField("doc_id", LongType))),
      "dvocab" -> StructType(Seq(
        StructField("token", StringType), StructField("df", LongType))),
      "dstats" -> StructType(Seq(
        StructField("nd", LongType), StructField("tl", LongType))))
  }

  /** Leg read with the pinned schema (leg name = last path segment).
   *  PER-ROOT reads unioned by name, never one multi-root read: legs
   *  are hive-partitioned (tb/db/fb) except the empty-compaction
   *  plain rewrite, and Spark's partition-structure inference across
   *  roots with mixed layouts throws CONFLICTING_DIRECTORY_STRUCTURES
   *  before the pinned schema is even consulted. A per-root read
   *  keeps the footer-inference skip AND scopes directory discovery
   *  to one commit's uniform layout.
   */
  private def readLeg(
      spark: SparkSession, leg: String, paths: Seq[String]): DataFrame = {
    val s = legSchemas(leg)
    paths.map(p => spark.read.schema(s).parquet(p)).reduce(_.unionByName(_))
  }

  /** Empty result frame with the given (name, type) columns — the
   *  shared zero-rows constructor behind every probe whose candidate
   *  stage can legitimately come up empty (fuzzy suggest with an empty
   *  edit ball, explain of a zero-hit search): same schema as the
   *  populated path so downstream unions/writes never fork on shape.
   */
  private def emptyResult(
      spark: SparkSession,
      cols: (String, org.apache.spark.sql.types.DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t)
      }))

  private def liveSub(
      spark: SparkSession, dir: String, sub: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    clog(dir).latest(spark)._2.filter(_.startsWith("c-"))
      .map(d => s"$dir/data/$d/$sub")
      .filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).exists(hp)
      }
  }

  /** Live TOMBSTONE commits (`t-` prefix): each is one [[forgetDocs]]
   *  call's (gone doc ids, exact negative vocab/stats deltas). They
   *  ride the same commit log as shard commits — one version-file
   *  create makes a deletion visible atomically across every leg —
   *  and a FULL compaction folds them away (physical erasure follows
   *  at vacuum, exactly the store's forget discipline).
   */
  private def tombDirs(spark: SparkSession, dir: String): Seq[String] =
    clog(dir).latest(spark)._2.filter(_.startsWith("t-"))

  /** The live tombstoned doc ids as one (doc_id) frame — None when no
   *  tombstones are live, so the common no-deletions case adds ZERO
   *  plan nodes to every read path.
   */
  private def goneDocs(
      spark: SparkSession, dir: String): Option[DataFrame] = {
    val ts = tombDirs(spark, dir)
    Option.when(ts.nonEmpty)(
      readLeg(spark, "gone", ts.map(t => s"$dir/data/$t/gone"))
        .select("doc_id"))
  }

  /** Union a DOC-GRAIN leg (post/pos/docs) across live shard commits
   *  with tombstoned docs dropped — a broadcast anti-join against the
   *  gone set (bounded: tombstones accumulate only between
   *  compactions; a full fold retires them, so the broadcast never
   *  grows with delete history). Every query path reads postings
   *  through here, so a deleted doc can never resurrect in search,
   *  phrase, proximity, containment, or forward-store results.
   *
   *  A tombstone is ORDER-SCOPED: it covers exactly the shard commits
   *  that PRECEDE it in the commit log's (insertion-ordered) live
   *  list. A doc re-ingested AFTER its takedown (the [[upsertDocs]]
   *  add leg, or any later re-crawl of the same id) lands in a commit
   *  after the tombstone and is served normally — a global gone set
   *  would silently kill the fresh rows too (re-ingest "succeeds" but
   *  never answers), the silent-loss trap this scoping exists to
   *  close. Commits are read in groups sharing the same
   *  subsequent-tombstone set — at most (#live tombstones + 1) groups,
   *  each paying one broadcast anti-join; zero extra plan nodes when
   *  no tombstones are live.
   */
  private def readDocGrain(
      spark: SparkSession, dir: String, sub: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val ordered = clog(dir).latest(spark)._2
      .filter(e => e.startsWith("c-") || e.startsWith("t-"))
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).exists(hp)
    }
    // each commit's applicable tombstones = the t- entries AFTER it
    val withScope: Seq[(String, Seq[String])] = ordered.zipWithIndex
      .filter(_._1.startsWith("c-"))
      .map { case (c, i) =>
        (s"$dir/data/$c/$sub",
          ordered.drop(i + 1).filter(_.startsWith("t-")))
      }
      .filter(p => exists(p._1))
    withScope.groupBy(_._2).map { case (tombs, roots) =>
      val base = readLeg(spark, sub, roots.map(_._1))
      if (tombs.isEmpty) base
      else {
        val gone = readLeg(spark, "gone", tombs.map(t => s"$dir/data/$t/gone"))
          .select("doc_id")
        base.join(broadcast(gone), Seq("doc_id"), "left_anti")
      }
    }.reduce(_.unionByName(_))
  }

  /** Vocab rows ACROSS live commits INCLUDING tombstone delta rows
   *  (negative df) — callers fold `sum(df)` exactly as before and the
   *  deltas make the fold equal the never-ingested-those-docs df; a
   *  token whose folded df reaches 0 must be dropped by the caller
   *  (`where df > 0`) so fully-deleted tokens stop suggesting.
   */
  private def vocabRows(spark: SparkSession, dir: String): DataFrame = {
    val base = readLeg(spark, "vocab", liveSub(spark, dir, "vocab"))
    val ts = tombDirs(spark, dir)
    if (ts.isEmpty) base
    else base.unionByName(
      readLeg(spark, "dvocab", ts.map(t => s"$dir/data/$t/dvocab")))
  }

  /** Stats rows including tombstone deltas (negative nd/tl) — callers
   *  `agg(sum)` exactly as before; post-delete (nd, tl) equal the
   *  never-ingested values, so BM25 idf/avgdl are EXACT after a
   *  delete, not stale-until-compaction.
   */
  private def statsRows(spark: SparkSession, dir: String): DataFrame = {
    val base = readLeg(spark, "stats", liveSub(spark, dir, "stats"))
    val ts = tombDirs(spark, dir)
    if (ts.isEmpty) base
    else base.unionByName(
      readLeg(spark, "dstats", ts.map(t => s"$dir/data/$t/dstats")))
  }

  /** True iff EVERY live shard commit carries the optional leg `sub` —
   *  the uniformity probe behind the pruned/positional/forward paths
   *  (a partial leg would silently answer from part of the corpus;
   *  all-or-nothing keeps wrong answers impossible). Driver-side
   *  metadata: one log read + one existence probe per live commit.
   */
  private def legOnAllCommits(
      spark: SparkSession, dir: String, sub: String): Boolean = {
    val commits = clog(dir).latest(spark)._2.filter(_.startsWith("c-"))
    commits.nonEmpty && liveSub(spark, dir, sub).size == commits.size
  }

  /** Leg-presence probes callers route on: a pre-leg index answers
   *  phrase/fuzzy/forward reads by the corpus-parameter paths instead.
   */
  def hasPositionalLeg(spark: SparkSession, dir: String): Boolean =
    legOnAllCommits(spark, dir, "pos")
  def hasDocsLeg(spark: SparkSession, dir: String): Boolean =
    legOnAllCommits(spark, dir, "docs")

  /** FORWARD-STORE POINT LOOKUP: (doc_id, text) for a bounded id set,
   *  from the index's own `docs` legs — fb partition-directory pruning
   *  plus pushed doc_id equality, the same two-level prune as the
   *  posting scan. This is what makes phrase verify, RM3 feedback, and
   *  snippets self-contained: the corpus never has to be passed back
   *  in (and at 100 TB "the corpus DataFrame" may not even exist as
   *  one readable table on the serving side).
   */
  def docsFor(
      spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame = {
    require(hasDocsLeg(spark, dir),
      s"index $dir has no forward docs leg on every live commit — it " +
        "predates forward-store ingest; pass the corpus explicitly")
    require(ids.nonEmpty && ids.length <= 65536,
      s"docsFor is a point lookup for 1..65536 ids (got ${ids.length})")
    import spark.implicits._
    val buckets = ids.toDF("i")
      .select(hashBucket(col("i"))).distinct()
      .collect().map(_.getLong(0)).toSeq
    readDocGrain(spark, dir, "docs")
      .where(col("fb").isin(buckets: _*) && col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("text"))
  }

  private def tokenBucket(token: Column): Column =
    pmod(xxhash64(token), lit(TokenBuckets.toLong))

  /** The 16-way hash bucket every non-token leg keys on — `del` on the
   *  deletion variant, `docs` on the doc id — so point probes prune
   *  partition DIRECTORIES exactly like the posting scan's tb.
   */
  private def hashBucket(c: Column): Column =
    pmod(xxhash64(c), lit(TokenBuckets.toLong))

  /** All single-character deletions of a non-empty string column,
   *  1-based substr arithmetic (prefix before i ++ suffix after i) —
   *  the engine-side mirror of [[delNeighborhood]]'s take/drop.
   */
  private def delete1(t: Column): Column =
    transform(sequence(lit(1), length(t)),
      i => concat(t.substr(lit(1), i - lit(1)), t.substr(i + lit(1), length(t))))

  /** token ∪ deletes≤2(token) as one distinct array — the `del` leg's
   *  key set per vocab token. A depth-2 variant of a length-1 token
   *  degenerates to [""] (deleting from the empty string keeps it) —
   *  harmless overgeneration, the Levenshtein verify owns exactness.
   */
  private def delVariants(t: Column): Column =
    array_distinct(concat(
      array(t),
      delete1(t),
      flatten(transform(delete1(t),
        v => when(length(v) >= 1, delete1(v)).otherwise(array(v))))))

  /** Driver-side deletion neighborhood of the query term (the term
   *  itself included), depth `d` — must generate exactly the strings
   *  [[delVariants]] generates for the same input.
   */
  private def delNeighborhood(term: String, d: Int): Seq[String] = {
    var cur = Set(term)
    var all = Set(term)
    for (_ <- 1 to d) {
      cur = cur.flatMap(s =>
        if (s.isEmpty) Set(s)
        else s.indices.map(i => s.take(i) + s.drop(i + 1)).toSet)
      all ++= cur
    }
    all.toSeq.sorted
  }

  /** True iff a shard with this delivery key is already committed —
   *  the cheap up-front probe a CONSUMER makes before paying the
   *  tokenize+stage cost of [[ingestShard]] (a redelivered shard would
   *  lose to its own `#txn:` key anyway; the in-commit check still
   *  guards the concurrent race). The streaming maintainer's replay
   *  path depends on this: a crash-recovered micro-batch re-arrives
   *  with the SAME batch id, and this probe turns the replay into a
   *  no-op instead of an exception.
   */
  def hasDelivery(spark: SparkSession, dir: String, key: String): Boolean =
    clog(dir).latest(spark)._2.contains("#txn:" + key)

  /** REPLAY PIN (mid-replay lease): while any pin is live, compaction
   *  folds, tombstone retirement, and the direct rebuild REFUSE loudly
   *  — they consume or reposition the commits whose layout a
   *  mid-replay pipeline's membership cut depends on. Ingest, forget,
   *  upsert, and every read path stay allowed. The pin is a ledger
   *  entry (`#pin:<name>`), so it survives restart and folds; release
   *  with [[unpin]]. Idempotent both ways.
   */
  def pin(spark: SparkSession, dir: String, name: String): Unit =
    clog(dir).pin(spark, name)
  def unpin(spark: SparkSession, dir: String, name: String): Unit =
    clog(dir).unpin(spark, name)
  def pins(spark: SparkSession, dir: String): Seq[String] =
    clog(dir).pins(spark)

  /** The loud half of the pin contract — throws IllegalStateException
   *  (the "re-run later" class: StreamForget's opportunistic
   *  retirement defers and counts it, a takedown stream never fails)
   *  when a lease is live.
   */
  private def requireUnpinned(
      spark: SparkSession, dir: String, what: String): Unit =
    clog(dir).requireUnpinned(spark, s"$what on $dir")

  /** Ledger a delivery key with NO data commit — the empty-hit
   *  discipline [[forgetDocs]] applies when nothing live matches,
   *  exposed for COMPOSITE verbs (the cross-index takedown's
   *  empty-resolution path) that must mark completion WITHOUT
   *  re-evaluating their predicate: a store that moved since the
   *  verb's one resolution would resolve differently, and acting on
   *  the re-resolution in only one leg leaves a permanent cross-index
   *  divergence. Idempotent — an already-ledgered key is a no-op.
   */
  def ledgerDelivery(spark: SparkSession, dir: String, key: String): Unit = {
    require(key.nonEmpty && !key.contains('\n'), s"bad delivery key: $key")
    val t = "#txn:" + key
    clog(dir).commit(spark)(now =>
      if (now.contains(t)) None else Some(now :+ t)): Unit
  }

  /** Number of live shard commits (compaction-trigger input: the read
   *  path unions one parquet root per live commit, so this is also the
   *  query-planning fan-in). Driver-side metadata only.
   */
  def liveShardCount(spark: SparkSession, dir: String): Int =
    clog(dir).latest(spark)._2.count(_.startsWith("c-"))

  /** Latest published version (0 = never written) — the cheap
   *  "did anything commit?" probe a redelivery test pins on.
   */
  def version(spark: SparkSession, dir: String): Long =
    clog(dir).latest(spark)._1

  /** Ingest one document shard: stage postings (dl denormalized),
   *  positional postings, shard vocabulary, the vocabulary's
   *  deletion-neighborhood keys, shard stats, AND the forward doc
   *  store under ONE commit dir; publish with one version-file create.
   *  Shard-local cost only — the stored index is never re-read or
   *  rewritten. The three non-core legs:
   *   - `pos/tb=<b>/`: (token, doc_id, positions) — 1-based positions
   *     in the raw token array, sorted — serves [[searchPhrasePositional]]
   *     so stop-word-grade phrases stop being refused;
   *   - `del/db=<b>/`: (variant, token) deletion-neighborhood keys
   *     (depth [[DelMaxDist]]) — serves [[suggestFuzzy]]'s pruned path;
   *   - `docs/fb=<b>/`: (doc_id, text) forward store — serves phrase
   *     verify, RM3 feedback, and snippets WITHOUT the caller passing
   *     the corpus back in (a serving index must be self-contained; at
   *     100 TB this doubles index bytes, the standard forward+inverted
   *     trade — see SCALE.md).
   *  `legs` picks the profile: [[LegProfile.Serving]] (default) writes
   *  all three optional legs; [[LegProfile.Minimal]] skips them for
   *  posting-probe-only indexes (the decontamination shingle index is
   *  the canonical case).
   */
  def ingestShard(
      spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, key: Option[String] = None,
      legs: LegProfile = LegProfile.Serving): Unit = {
    val cl = clog(dir)
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad delivery key: $k")
      "#txn:" + k
    }
    txn.foreach { t =>
      require(!cl.latest(spark)._2.contains(t),
        s"shard with delivery key ${key.get} was already ingested into " +
          s"$dir — redelivery rejected (the index is exactly-once)")
    }
    // forward-store snapshot: when the docs leg is requested the input
    // is materialized ONCE up front and every leg (tp included)
    // derives from that snapshot — a nondeterministic source (sampled/
    // limited/rand-derived) would otherwise publish a forward store
    // whose rows disagree with the postings built from a second
    // evaluation of the same plan. The id is normalized to long here
    // (loud for non-integral ids) so the fb bucket written at ingest
    // equals the bucket docsFor recomputes from its Seq[Long] literals
    // — xxhash64 hashes IntegerType and LongType differently, so a raw
    // int id would silently fail the fb directory prune at lookup.
    val snap: Option[DataFrame] = Option.when(legs.docs) {
      val idType = docs.schema(idCol).dataType.typeName
      require(Seq("byte", "short", "integer", "long").contains(idType),
        s"forward docs leg needs an integral id column (docsFor probes " +
          s"by Seq[Long]); got $idCol: $idType — use LegProfile.Minimal " +
          "or map ids to long first")
      val s = docs.select(col(idCol).cast("long").as(idCol),
        col(textCol).cast("string").as(textCol)).persist()
      s.count(): Unit
      s
    }
    val src = snap.getOrElse(docs)
    // ONE tokenize pass feeds every leg: (doc, token)-grain rows with
    // tf AND the sorted 1-based raw-array positions (1-based so the
    // positional probe and a 1-based SQL formulation agree exactly)
    val tp = src
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p0", "token")))
      .where(length(col("token")) > 0)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p0") + 1)).as("positions"))
      .persist()
    try {
      // materialize the cache BEFORE the concurrent leg writes fan out:
      // parallel jobs on a cold persist all race to compute the same
      // tokenize+group (the cache only dedups work once populated), so
      // one count here makes the six writes read, not recompute
      tp.count(): Unit
      val dl = tp.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val name = s"c-${java.util.UUID.randomUUID().toString.take(12)}"
      // the legs all derive from the persisted tp and land under
      // ONE not-yet-visible commit dir — write them concurrently (the
      // ManifestStore.ingestBatchAtomic discipline): atomicity comes
      // from the version-file create, not from write order
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val writes: Seq[() => Unit] = Seq(
        Some(() =>
          tp.join(dl, "doc_id")
            .select(col("token"), col("doc_id"), col("tf"), col("dl"),
              tokenBucket(col("token")).as("tb"))
            // bucket-grain tasks before the partitioned write: one file
            // per bucket per shard instead of tasks×buckets — the read
            // path's file count stays ∝ shards×TokenBuckets, and a shard
            // is a bounded ingest batch so bucket-grain tasks stay small
            .repartition(TokenBuckets, col("tb"))
            .write.partitionBy("tb").parquet(s"$dir/data/$name/post")),
        Option.when(legs.pos)(() =>
          tp.select(col("token"), col("doc_id"), col("positions"),
              tokenBucket(col("token")).as("tb"))
            .repartition(TokenBuckets, col("tb"))
            .write.partitionBy("tb").parquet(s"$dir/data/$name/pos")),
        Some(() =>
          tp.groupBy("token").agg(count(lit(1)).as("df"))
            // vocab is token-grain (small per shard); 4 files beats one
            // tiny file per shuffle task on the per-query vocab lookup
            .coalesce(4)
            .write.parquet(s"$dir/data/$name/vocab")),
        Option.when(legs.del)(() =>
          // vocabulary-grain × ~|token|² variant rows — tiny next to
          // postings; bucketed on the VARIANT so a suggest query prunes
          // to its own variants' buckets
          tp.select(col("token")).distinct()
            .select(explode(delVariants(col("token"))).as("variant"),
              col("token"))
            .select(col("variant"), col("token"),
              hashBucket(col("variant")).as("db"))
            .repartition(TokenBuckets, col("db"))
            .write.partitionBy("db").parquet(s"$dir/data/$name/del")),
        Some(() =>
          dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tl"))
            .coalesce(1).write.parquet(s"$dir/data/$name/stats")),
        Option.when(legs.docs)(() =>
          // reads the SNAPSHOT (id already long) — never re-evaluates
          // the caller's frame, so forward text always agrees with the
          // postings built from the same rows
          src.select(col(idCol).as("doc_id"), col(textCol).as("text"),
              hashBucket(col(idCol)).as("fb"))
            .repartition(TokenBuckets, col("fb"))
            .write.partitionBy("fb").parquet(s"$dir/data/$name/docs"))
      ).flatten
      Await.result(
        Future.sequence(writes.map(w => Future(w()))), Duration.Inf): Unit
      val published = cl.commit(spark) { now =>
        if (txn.exists(now.contains)) None // raced redelivery — abort
        else Some(now :+ name :++ txn.toSeq)
      }
      if (!published) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/data/$name")
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(p, true): Unit
        require(published,
          s"shard with delivery key ${key.get} raced a concurrent " +
            s"redelivery into $dir — this attempt's staging was dropped")
      }
    } finally {
      tp.unpersist(): Unit
      snap.foreach(_.unpersist(): Unit)
    }
  }

  /** DOCUMENT DELETION (right-to-be-forgotten for the index): remove
   *  up to 65536 docs from every leg's ANSWERS immediately, under ONE
   *  commit, WITHOUT rewriting the index — the takedown operator a
   *  100 TB serving index needs (a full rebuild per takedown is
   *  corpus-grain; this is ∝ the deleted docs' own postings).
   *
   *  Mechanism — a TOMBSTONE commit `t-<uuid>` holding three tiny legs:
   *   - `gone/`: the deleted doc ids. Every doc-grain read path
   *     (postings, positions, forward store) anti-joins this set, so
   *     search/phrase/NEAR/containment/snippets can never resurrect a
   *     deleted doc;
   *   - `dvocab/`: EXACT negative df deltas (token, −n), recomputed by
   *     re-tokenizing the docs' text from the forward `docs` leg (the
   *     tokenizer is deterministic, so the deltas equal the df the
   *     docs contributed at ingest);
   *   - `dstats/`: one (−nd, −tl) row.
   *  Because the deltas are exact, post-delete BM25 idf/avgdl/df are
   *  IDENTICAL to an index that never ingested those docs — scores are
   *  right immediately, not stale-until-compaction. A token whose
   *  folded df reaches 0 drops from suggest/containment liveness at
   *  the `df > 0` fold filter.
   *
   *  Lifecycle mirrors the store's forgetDataset: the tombstone is
   *  LOGICAL deletion (immediate, atomic — one version-file create);
   *  a FULL [[compact]] physically drops the docs' rows from every
   *  leg, folds the deltas into vocab/stats, and retires the
   *  tombstone; [[vacuum]] then erases the superseded bytes — the
   *  compliance clock is the caller's compact+vacuum schedule, and a
   *  pre-delete [[cloneAsOf]] branch still sees the doc until vacuum.
   *
   *  Exactly-once: `key` rides the same `#txn:` ledger as ingest — a
   *  redelivered delete is refused loudly (and keys survive
   *  compaction). Ids already deleted (or never ingested) contribute
   *  nothing — the forward-store lookup is gone-filtered, so a
   *  re-delete of the same id cannot double-subtract. CONCURRENT
   *  forgets race safely: the publish aborts if the live tombstone
   *  set moved between this call's snapshot and its commit (the
   *  rewriteLive stale-abort discipline) — retry recomputes against
   *  the new live set and overlapping ids drop out.
   *
   *  Requires the forward `docs` leg (the deltas come from the index
   *  itself — at scale "the corpus DataFrame" is not available on the
   *  serving side). A [[LegProfile.Minimal]] index deletes via
   *  [[forgetDocsRebuild]] — a direct in-place commit rewrite that
   *  needs no forward store and no corpus.
   */
  def forgetDocs(
      spark: SparkSession, dir: String, ids: Seq[Long],
      key: Option[String] = None): Unit = {
    require(ids.nonEmpty && ids.length <= 65536,
      s"forgetDocs takes 1..65536 ids per call (got ${ids.length}); " +
        "batch larger takedowns")
    val cl = clog(dir)
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad delivery key: $k")
      "#txn:" + k
    }
    txn.foreach { t =>
      require(!cl.latest(spark)._2.contains(t),
        s"delete with delivery key ${key.get} was already applied to " +
          s"$dir — redelivery rejected (deletion is exactly-once)")
    }
    require(hasDocsLeg(spark, dir),
      s"index $dir has no forward docs leg on every live commit — " +
        "forgetDocs computes its exact df/stats deltas from the " +
        "index's own forward store; a Minimal-profile index deletes " +
        "via forgetDocsRebuild (direct in-place commit rewrite, no " +
        "corpus needed)")
    // stale-abort snapshot — BOTH prefixes: the publish refuses if the
    // live tombstone set moved (a concurrent forget landed, or a full
    // compaction retired tombstones — deltas computed against one
    // snapshot must not publish against another) AND if the live
    // shard-commit set moved. The c- half closes the silent-loss /
    // over-count trap: a shard commit that re-ingests one of these
    // very ids between the delta computation and this publish would
    // land BEFORE the tombstone in log order, so the tombstone's
    // order-scoped coverage would hide the fresh rows while the
    // deltas never subtracted that commit's vocab/stats contribution
    // (permanent df/nd/tl over-count after the next full fold)
    val liveSnap = cl.latest(spark)._2
      .filter(e => e.startsWith("c-") || e.startsWith("t-"))
    // gone-filtered point lookup: ids already tombstoned (or never
    // ingested) vanish here, so the deltas below never double-subtract
    val hit = docsFor(spark, dir, ids.distinct).persist()
    try {
      if (hit.isEmpty) {
        // nothing live to delete — still ledger the delivery key so a
        // redelivered (already-applied) takedown probes as done
        key.foreach(ledgerDelivery(spark, dir, _))
        return
      }
      val tp = hit
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .where(length(col("token")) > 0)
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val name = s"t-${java.util.UUID.randomUUID().toString.take(12)}"
      hit.select(col("doc_id"))
        .coalesce(1).write.parquet(s"$dir/data/$name/gone")
      tp.groupBy("token").agg((-count(lit(1))).as("df"))
        .coalesce(1).write.parquet(s"$dir/data/$name/dvocab")
      tp.groupBy("doc_id").agg(sum("tf").as("dl"))
        .agg((-count(lit(1))).as("nd"), (-sum(col("dl"))).as("tl"))
        .coalesce(1).write.parquet(s"$dir/data/$name/dstats")
      publishTombstone(spark, dir, name, txn, liveSnap)
    } finally hit.unpersist(): Unit
  }

  /** FORWARD-STORE PREDICATE SCAN: the live (doc_id, text) rows
   *  matching `predicate` — gone-filtered (tombstoned docs don't
   *  match) and order-scoped like every doc-grain read. This is the
   *  resolution primitive behind [[forgetWhere]] and the cross-index
   *  takedown ([[graft.streaming.StreamForget.forgetWhereAll]]); it
   *  is also the general "find documents by content predicate"
   *  escape hatch when a query can't be phrased as a token search.
   *  Cost: one scan of the docs legs with the predicate pushed to
   *  the parquet readers where possible — ∝ the forward store.
   */
  def docsWhere(
      spark: SparkSession, dir: String, predicate: Column): DataFrame = {
    require(hasDocsLeg(spark, dir),
      s"index $dir has no forward docs leg on every live commit — " +
        "a content-predicate scan needs the index's own forward store")
    readDocGrain(spark, dir, "docs")
      .where(predicate)
      .select(col("doc_id"), col("text"))
  }

  /** PREDICATE-RESOLVED TAKEDOWN — the GDPR-shaped request ("erase
   *  everything matching P") as ONE ledgered verb: resolve the doc ids
   *  from the index's OWN live forward store (`docs` leg — columns
   *  `doc_id`, `text`; the read is gone-filtered, so already-deleted
   *  docs don't re-resolve) and tombstone them via [[forgetDocs]]
   *  under the SAME `key` — resolution and tombstone are one
   *  exactly-once unit instead of caller-side id resolution plus a
   *  separate un-ledgered delete. A predicate matching NOTHING still
   *  ledgers the key (replays probe as done). Returns the number of
   *  docs deleted. Bounded: a takedown resolving > 65536 ids refuses
   *  loudly (narrow the predicate or batch by id range) — a tombstone
   *  is a bounded driver-side set by design.
   */
  def forgetWhere(
      spark: SparkSession, dir: String, predicate: Column,
      key: Option[String] = None): Long = {
    val cl = clog(dir)
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad delivery key: $k")
      "#txn:" + k
    }
    txn.foreach { t =>
      require(!cl.latest(spark)._2.contains(t),
        s"delete with delivery key ${key.get} was already applied to " +
          s"$dir — redelivery rejected (deletion is exactly-once)")
    }
    require(hasDocsLeg(spark, dir),
      s"index $dir has no forward docs leg on every live commit — " +
        "forgetWhere resolves its ids from the index's own forward " +
        "store; resolve ids externally and use forgetDocsRebuild")
    val ids = docsWhere(spark, dir, predicate)
      .select(col("doc_id")).distinct().limit(65537)
      .collect().map(_.getLong(0)).toSeq
    require(ids.length <= 65536,
      s"forgetWhere resolved > 65536 ids in $dir — narrow the " +
        "predicate or batch the takedown (a tombstone is a bounded " +
        "driver-side set)")
    if (ids.isEmpty) {
      // nothing matched — still ledger the key so a redelivered
      // takedown probes as done (forgetDocs' empty-hit discipline)
      txn.foreach { t =>
        cl.commit(spark)(now =>
          if (now.contains(t)) None else Some(now :+ t)): Unit
      }
      0L
    } else {
      forgetDocs(spark, dir, ids, key)
      ids.length.toLong
    }
  }

  /** DOCUMENT UPSERT (the crawl re-fetch lifecycle op): replace up to
   *  65536 docs' content in place — one tombstone commit deleting the
   *  old postings ([[forgetDocs]]; ids never ingested no-op) followed
   *  by one shard commit ingesting the new text ([[ingestShard]]).
   *  Because the tombstone's df/nd/tl deltas are exact and the new
   *  shard folds by the ordinary monoids, post-upsert BM25 equals an
   *  index that ingested the NEW text from the start; a later full
   *  compaction physically erases the superseded postings.
   *
   *  Exactly-once across the two commits is the maintainer contract:
   *  `key` fans out to `<key>.del` / `<key>.add` ledger entries and
   *  each leg short-circuits on its own committed key — a crash
   *  between the two commits replays with the delete leg a no-op and
   *  the add leg completing, and a full redelivery is a
   *  version-preserving no-op (NOT an error — upsert is the
   *  replay-friendly verb; the primitive ingest/forget stay loud).
   *  Visibility is eventual across the pair: a reader between the two
   *  commits sees the doc deleted-not-yet-replaced (each commit is
   *  individually atomic; a single-commit upsert would need every
   *  read path to resolve gone-sets inside data commits — the
   *  documented trade). Requires the forward docs leg (the delete
   *  leg's deltas come from it).
   */
  def upsertDocs(
      spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, key: Option[String] = None,
      legs: LegProfile = LegProfile.Serving): Unit = {
    require(legs.docs,
      "upsertDocs needs the forward docs leg in its ingest profile — " +
        "the next upsert's delete leg re-derives deltas from it")
    // ONE materialization of the caller's frame feeds BOTH legs: the
    // delete-leg id list and the ingested shard must come from the
    // same evaluation — a nondeterministic source (sampled/limited/
    // rand-derived) evaluated twice could delete ids it never
    // re-adds, or leave stale postings live
    val idType = docs.schema(idCol).dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(idType),
      s"upsertDocs needs an integral id column; got $idCol: $idType")
    val snap = docs.select(col(idCol).cast("long").as(idCol),
      col(textCol).cast("string").as(textCol)).persist()
    try {
      val ids = snap.select(col(idCol)).distinct()
        .limit(65537).collect().map(_.getLong(0)).toSeq
      require(ids.nonEmpty && ids.length <= 65536,
        s"upsertDocs takes 1..65536 distinct ids per call (got ${ids.length})")
      val (delKey, addKey) = (key.map(_ + ".del"), key.map(_ + ".add"))
      // an empty index has nothing to delete — the first upsert is a
      // plain founding ingest (forgetDocs would refuse the missing
      // docs leg of a commit-less index). The delete leg must ALSO
      // skip when the ADD leg already committed: a FOUNDING upsert
      // never ledgers its delete key, so a redelivery (or a replay
      // after the add committed) would otherwise see a now-non-empty
      // index, tombstone the generation the first delivery just
      // founded, and skip the re-ingest — silently deleting the
      // upserted content
      if (liveShardCount(spark, dir) > 0 &&
          !delKey.exists(hasDelivery(spark, dir, _)) &&
          !addKey.exists(hasDelivery(spark, dir, _)))
        forgetDocs(spark, dir, ids, key = delKey)
      if (!addKey.exists(hasDelivery(spark, dir, _)))
        ingestShard(spark, dir, snap, idCol, textCol, key = addKey,
          legs = legs)
    } finally snap.unpersist(): Unit
  }

  /** The tombstone PUBLISH step, separated so the stale-abort path is
   *  deterministically testable: refuses (and drops the staged `t-`
   *  dir) when the delivery key raced in, or when the live c-/t-
   *  entry set no longer equals the snapshot the deltas were computed
   *  against — a concurrent forget landed, a compaction folded an
   *  input, OR a shard commit raced in (which this tombstone's
   *  order-scoped coverage would wrongly hide while its deltas never
   *  subtracted that commit's contribution). The rewriteLive "live
   *  set moved under us" discipline; the caller reruns against the
   *  new live set.
   */
  private[graft] def publishTombstone(
      spark: SparkSession, dir: String, name: String,
      txn: Option[String], liveSnap: Seq[String]): Unit = {
    val snapSet = liveSnap.toSet
    val published = clog(dir).commit(spark) { now =>
      if (txn.exists(now.contains)) None // raced redelivery
      else if (now.filter(e =>
          e.startsWith("c-") || e.startsWith("t-")).toSet != snapSet)
        None // live c-/t- set moved — deltas or coverage may be stale
      else Some(now :+ name :++ txn.toSeq)
    }
    if (!published) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/data/$name")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(p, true): Unit
      throw new IllegalStateException(
        s"forgetDocs raced a concurrent forget/ingest/compaction at $dir — " +
          "this attempt's staging was dropped; rerun against the " +
          "new live set")
    }
  }

  /** Live tombstoned-doc count — observability for the compact
   *  scheduler (tombstones accumulate between full folds; each adds a
   *  broadcast anti-join input to every read).
   */
  def tombstoneCount(spark: SparkSession, dir: String): Long =
    goneDocs(spark, dir).map(_.count()).getOrElse(0L)

  /** BM25 top-k over the stored index for a bag of query terms.
   *  Corpus stats and per-term df fold across shards by sum (driver-
   *  side: |terms|+1 scalars, never a key list); idf is rounded ONCE
   *  per term to ppm and joined back as a broadcast literal frame, so
   *  scores hash-match an engine that computes the same operation
   *  order. Ties rank by doc_id.
   *
   *  `maxDf` caps QUERY terms by folded document frequency: a
   *  stop-word-grade term's posting list is corpus-grain, so without
   *  the cap one "the" in the query turns the pruned posting scan into
   *  a full-corpus scan feeding a corpus-grain groupBy — for a term
   *  whose idf (≈ log(1 + (nd−df+.5)/(df+.5))) carries almost no
   *  ranking signal anyway. Capped terms are skipped entirely (no
   *  posting scan, no idf row, no n_terms credit) — the same maxDf
   *  discipline the declarative inverted-index query applies. The df
   *  fold the cap reads is the SAME |terms|-scalar driver-side fold
   *  the idf needs — the cap costs nothing extra.
   */
  def searchBm25(
      spark: SparkSession, dir: String, terms: Seq[String], k: Int,
      maxDf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "searchBm25 with no terms")
    // weight 1e6 multiplies every per-term factor by the double 1.0 —
    // bit-identical to unweighted scoring (spec-pinned), so the
    // unweighted search is a pure delegation and there is ONE scoring
    // implementation to maintain
    searchBm25Weighted(spark, dir, terms.distinct.map((_, 1000000L)),
      k, maxDf)
  }

  /** The shared driver-side prelude of every BM25 probe: the (nd, tl)
   *  stats fold OVERLAPPED with the terms' df fold (independent jobs),
   *  the `maxDf` stop-word cut, per-term ppm idf, and the
   *  token-bucket-pruned posting scan. Per-commit roots each carry
   *  their own tb=N partition tree — read per commit and union (the
   *  same multi-root discipline as the IVF postings); the tb filter
   *  prunes partition DIRECTORIES, the token equality pushes into row
   *  groups within the surviving buckets. Returns (avgdl, kept terms
   *  sorted, (token, idf_ppm) pairs, pruned postings).
   */
  private def bm25Prelude(
      spark: SparkSession, dir: String, terms: Seq[String],
      maxDf: Option[Long]): (Double, Seq[String], Seq[(String, Long)], DataFrame) = {
    import spark.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val statsF = Future {
      statsRows(spark, dir).agg(sum("nd"), sum("tl")).head()
    }
    val dfF = Future {
      vocabRows(spark, dir)
        .where(col("token").isin(terms: _*))
        .groupBy("token").agg(sum("df").as("df"))
        .where(col("df") > 0) // fully-deleted tokens are not indexed
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val stats = Await.result(statsF, Duration.Inf)
    val (nd, tl) = (stats.getLong(0), stats.getLong(1))
    val avgdl = tl.toDouble / nd
    val dfByTerm = Await.result(dfF, Duration.Inf)
    // survivors: indexed (df exists) and under the stop-word cap —
    // only these reach the posting scan and the bucket list
    val kept = terms.distinct.sorted.filter(t =>
      dfByTerm.get(t).exists(df => maxDf.forall(df <= _)))
    val idf = kept.map { t =>
      val df = dfByTerm(t)
      (t, math.round(
        math.log((nd - df + 0.5) / (df + 0.5) + 1.0) * 1e6))
    }
    val termBuckets =
      if (kept.isEmpty) Seq.empty[Long]
      else kept.toDF("t")
        .select(tokenBucket(col("t"))).distinct()
        .collect().map(_.getLong(0)).toSeq
    val posts = readDocGrain(spark, dir, "post")
      .where(col("tb").isin(termBuckets: _*) &&
        col("token").isin(kept: _*))
    (avgdl, kept, idf, posts)
  }

  /** WEIGHTED BM25 over the stored index: each query term carries an
   *  exact ppm weight and contributes `(w_ppm/1e6) × bm25_term` to the
   *  doc score — the scoring primitive query expansion needs (RM3-style
   *  pseudo-relevance feedback interpolates original terms at full
   *  weight with expansion terms at a discount; see `bm25_rm3`). Scan
   *  shape is IDENTICAL to [[searchBm25]] — token-bucket directory
   *  pruning + pushed token equality, driver-side |terms|+1 scalar
   *  folds, broadcast idf/weight literals — so an expanded query costs
   *  one pruned posting probe, never a corpus pass. Per-term float
   *  factors are written in one fixed operation order (weight × idf
   *  first), and a weight of exactly 1e6 multiplies by the double 1.0,
   *  so an all-1e6 call is bit-identical to [[searchBm25]]
   *  (spec-pinned). Duplicate terms keep the LAST weight given.
   */
  def searchBm25Weighted(
      spark: SparkSession, dir: String, terms: Seq[(String, Long)], k: Int,
      maxDf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "searchBm25Weighted with no terms")
    import spark.implicits._
    val wByTerm = terms.toMap // last weight wins for duplicate terms
    val (avgdl, _, idfPairs, posts) =
      bm25Prelude(spark, dir, wByTerm.keys.toSeq, maxDf)
    val idf = idfPairs.map { case (t, i) => (t, i, wByTerm(t)) }
      .toDF("token", "idf_ppm", "w_ppm")
    posts
      .join(broadcast(idf), "token")
      .withColumn("score_ppm",
        round((col("w_ppm") / lit(1000000.0)) *
          col("idf_ppm").cast("double") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
          .cast("long"))
      .groupBy("doc_id")
      .agg(sum("score_ppm").as("score_ppm"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_ppm").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("score_ppm"), col("n_terms"))
  }

  /** INDEX OBSERVABILITY: one row of folded index statistics —
   *  (n_shards, nd, tl, vocab_size, n_postings) — from the index's own
   *  legs, never the corpus: stats fold by sum (shard-count scalars),
   *  vocab_size is the across-shard DISTINCT token count (shards can
   *  share tokens), n_postings counts posting rows. This is the
   *  health-check a production index needs (is df drifting? did a
   *  merge double postings?) and its corpus-derived ground truth is
   *  exactly recomputable, so the oracle proves the whole ingest fold.
   */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val shards = liveSub(spark, dir, "stats")
    require(shards.nonEmpty, s"no live shards in text index $dir")
    val st = statsRows(spark, dir)
      .agg(lit(shards.size.toLong).as("n_shards"),
        sum("nd").as("nd"), sum("tl").as("tl"))
    val vocab = vocabRows(spark, dir)
      .groupBy("token").agg(sum("df").as("df"))
      .where(col("df") > 0)
      .agg(count(lit(1)).as("vocab_size"))
    val posts = readDocGrain(spark, dir, "post")
      .agg(count(lit(1)).as("n_postings"))
    st.crossJoin(vocab).crossJoin(posts)
  }

  /** LIVE DOC MEMBERSHIP as one (doc_id) frame — the forward docs leg
   *  when every commit carries it (the only leg that includes
   *  zero-token docs), else the distinct posted ids. Tombstone-scoped
   *  like every read. The cross-index consistency check
   *  ([[graft.store.IndexFsck]]) compares this against the dedup and
   *  ANN memberships — pipelines that maintain the three in lockstep
   *  get drift DETECTION, not just drift avoidance.
   */
  def liveDocIds(spark: SparkSession, dir: String): DataFrame =
    if (hasDocsLeg(spark, dir))
      readDocGrain(spark, dir, "docs").select("doc_id")
    else readDocGrain(spark, dir, "post").select("doc_id").distinct()

  /** DEEP INTEGRITY CHECK (fsck) — recompute every derived leg from
   *  the doc-grain source of truth (the tombstone-scoped posting
   *  readback) and compare against what the index actually serves:
   *
   *  | check            | violation = …                                |
   *  |------------------|----------------------------------------------|
   *  | vocab_df         | token whose FOLDED df (vocab + dvocab deltas)
   *  |                  | ≠ live posting recount (or live on one side) |
   *  | stats_fold       | folded (nd, tl) ≠ recount from postings      |
   *  | pos_post_parity  | (token, doc) in pos xor post, or
   *  |                  | size(positions) ≠ tf                         |
   *  | docs_coverage    | posted doc without a forward-store row       |
   *  | docs_unique      | forward-store doc with > 1 live rows         |
   *
   *  Returns (check, violations, audited) — audited is the check's
   *  universe size (live tokens / docs / postings), so a healthy
   *  index reads as all-zeros with honest denominators. This is what
   *  turns the mutation tier's invariants (order-scoped tombstones,
   *  delta-exact folds, retirement rewrites) from design prose into a
   *  RUNNABLE audit: any divergence a bug or a stray writer introduces
   *  surfaces as a nonzero row, at cost ∝ index (one pass per leg +
   *  token/doc-grain joins), never ∝ corpus text. Checks whose leg is
   *  absent (a Minimal-profile index) are omitted from the report.
   */
  def fsck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    require(liveSub(spark, dir, "post").nonEmpty,
      s"no live shards in text index $dir")
    val post = readDocGrain(spark, dir, "post")
      .select(col("token"), col("doc_id"), col("tf")).persist()
    try {
      post.count(): Unit // populate before the concurrent check jobs
      // coalesce: sum over ZERO rows is null, and a degenerate-but-
      // legal universe (all docs tombstoned) must report (0, 0), not
      // NPE — fsck exists precisely for post-incident states
      val isViol = (c: Column) =>
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
      val checks: Seq[() => (String, Long, Long)] = Seq(
        Some(() => {
          val folded = vocabRows(spark, dir).groupBy("token")
            .agg(sum("df").as("df")).where(col("df") > 0)
          val recount = post.groupBy("token")
            .agg(count(lit(1)).as("df2"))
          val r = folded.join(recount, Seq("token"), "full_outer")
            .agg(isViol(coalesce(col("df"), lit(0L)) =!=
                coalesce(col("df2"), lit(0L))).as("viol"),
              count(lit(1)).as("aud")).head()
          ("vocab_df", r.getLong(0), r.getLong(1))
        }),
        Some(() => {
          val e = post.groupBy("doc_id").agg(sum("tf").as("dl"))
            .agg(count(lit(1)).as("nd"),
              coalesce(sum("dl"), lit(0L)).as("tl")).head()
          val g = statsRows(spark, dir)
            .agg(coalesce(sum("nd"), lit(0L)).as("nd"),
              coalesce(sum("tl"), lit(0L)).as("tl")).head()
          ("stats_fold",
            if (e.getLong(0) == g.getLong(0) && e.getLong(1) == g.getLong(1))
              0L else 1L,
            e.getLong(0))
        }),
        Option.when(hasPositionalLeg(spark, dir))(() => {
          val pos = readDocGrain(spark, dir, "pos")
            .select(col("token"), col("doc_id"),
              size(col("positions")).cast("long").as("np"))
          val r = post.join(pos, Seq("token", "doc_id"), "full_outer")
            .agg(isViol(col("tf").isNull || col("np").isNull ||
                col("tf") =!= col("np")).as("viol"),
              count(lit(1)).as("aud")).head()
          ("pos_post_parity", r.getLong(0), r.getLong(1))
        }),
        Option.when(hasDocsLeg(spark, dir))(() => {
          val fwd = readDocGrain(spark, dir, "docs")
            .select("doc_id").distinct()
          val r = post.select("doc_id").distinct()
            .join(fwd.withColumn("has", lit(1)), Seq("doc_id"), "left_outer")
            .agg(isViol(col("has").isNull).as("viol"),
              count(lit(1)).as("aud")).head()
          ("docs_coverage", r.getLong(0), r.getLong(1))
        }),
        Option.when(hasDocsLeg(spark, dir))(() => {
          val r = readDocGrain(spark, dir, "docs")
            .groupBy("doc_id").agg(count(lit(1)).as("m"))
            .agg(isViol(col("m") > 1).as("viol"),
              count(lit(1)).as("aud")).head()
          ("docs_unique", r.getLong(0), r.getLong(1))
        })).flatten
      graft.util.Par.par(checks)
        .toDF("check", "violations", "audited")
    } finally post.unpersist(): Unit
  }

  /** Manifest version the index's log currently reads at — read this
   *  BEFORE a full battery so the published watermark never covers
   *  entries the battery didn't see (racing commits stay unverified,
   *  the safe direction).
   */
  def logVersion(spark: SparkSession, dir: String): Long =
    clog(dir).latest(spark)._1

  /** Publish/advance the index's fsck verified watermark. */
  def publishFsckWatermark(spark: SparkSession, dir: String, v: Long): Unit =
    clog(dir).publishFsckWatermark(spark, v)

  /** INCREMENTAL fsck — the scheduled posture: verify only the
   *  entries that appeared AFTER the last verified watermark
   *  (`#fsck:<version>`), at cost ∝ fresh commits, never ∝ index.
   *  The checks are the COMMIT-LOCAL halves of [[fsck]]'s invariants
   *  (each holds over one commit's own immutable files at write
   *  time, so pre-watermark legs are never re-read):
   *
   *  | check           | violation = … (scoped to fresh entries)      |
   *  |-----------------|----------------------------------------------|
   *  | vocab_df        | per-commit vocab df ≠ that commit's posting
   *  |                 | recount                                      |
   *  | stats_local     | per-commit (nd, tl) ≠ recount from its posts |
   *  | pos_post_parity | (token, doc) in pos xor post within a commit,
   *  |                 | or size(positions) ≠ tf                      |
   *  | docs_coverage   | posted doc without a forward row (per commit)|
   *  | docs_unique     | forward doc with > 1 rows within a commit    |
   *  | tomb_wellformed | duplicate gone id, positive dvocab df or
   *  |                 | dstats delta, or |nd delta| > gone count     |
   *
   *  CROSS-commit drift (a stray writer rewriting an old file, a
   *  tombstone-scoping bug) is the FULL battery's job — incremental
   *  fsck certifies that nothing that LANDED since the watermark is
   *  internally torn, which is the affordable invariant a scheduled
   *  check can hold at 100 TB. All six rows are always present
   *  ((0, 0) when a leg/kind is absent this window) so reports have
   *  one stable shape. None when no watermark is live, its version
   *  was vacuumed, or a fold/retire consumed a verified entry — run
   *  [[fsck]] and republish instead.
   */
  def fsckIncremental(
      spark: SparkSession, dir: String): Option[graft.store.FsckScope] = {
    import spark.implicits._
    clog(dir).fsckFreshEntries(spark).map { case (vNow, fresh) =>
      val conf = spark.sessionState.newHadoopConf()
      def exists(p: String): Boolean = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).exists(hp)
      }
      def legUnion(es: Seq[String], sub: String): Option[DataFrame] = {
        val dfs = es.map(e => (e, s"$dir/data/$e/$sub"))
          .filter(p => exists(p._2))
          .map { case (e, p) =>
            readLeg(spark, sub, Seq(p)).withColumn("cmt", lit(e)) }
        Option.when(dfs.nonEmpty)(dfs.reduce(_.unionByName(_)))
      }
      val commits = fresh.filter(_.startsWith("c-"))
      val tombs = fresh.filter(_.startsWith("t-"))
      val isViol = (c: Column) =>
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
      val post = legUnion(commits, "post")
        .map(_.select(col("cmt"), col("token"), col("doc_id"), col("tf"))
          .persist())
      try {
        val vocabRow = post match {
          case None => ("vocab_df", 0L, 0L)
          case Some(p) =>
            val folded = legUnion(commits, "vocab").get
              .groupBy("cmt", "token").agg(sum("df").as("df"))
            val recount = p.groupBy("cmt", "token")
              .agg(count(lit(1)).as("df2"))
            val r = folded.join(recount, Seq("cmt", "token"), "full_outer")
              .agg(isViol(coalesce(col("df"), lit(0L)) =!=
                  coalesce(col("df2"), lit(0L))).as("viol"),
                count(lit(1)).as("aud")).head()
            ("vocab_df", r.getLong(0), r.getLong(1))
        }
        val statsRow = post match {
          case None => ("stats_local", 0L, 0L)
          case Some(p) =>
            val e = p.groupBy("cmt", "doc_id").agg(sum("tf").as("dl"))
              .groupBy("cmt").agg(count(lit(1)).as("nd2"),
                sum("dl").as("tl2"))
            val g = legUnion(commits, "stats").get
              .groupBy("cmt").agg(coalesce(sum("nd"), lit(0L)).as("nd"),
                coalesce(sum("tl"), lit(0L)).as("tl"))
            val r = e.join(g, Seq("cmt"), "full_outer")
              .agg(isViol(col("nd").isNull || col("nd2").isNull ||
                  col("nd") =!= col("nd2") ||
                  col("tl") =!= col("tl2")).as("viol"),
                coalesce(sum("nd2"), lit(0L)).as("aud")).head()
            ("stats_local", r.getLong(0), r.getLong(1))
        }
        val posCs = commits.filter(c => exists(s"$dir/data/$c/pos"))
        val posRow =
          if (posCs.isEmpty || post.isEmpty) ("pos_post_parity", 0L, 0L)
          else {
            val pp = post.get.where(col("cmt").isin(posCs: _*))
            val pos = legUnion(posCs, "pos").get
              .select(col("cmt"), col("token"), col("doc_id"),
                size(col("positions")).cast("long").as("np"))
            val r = pp.join(pos, Seq("cmt", "token", "doc_id"), "full_outer")
              .agg(isViol(col("tf").isNull || col("np").isNull ||
                  col("tf") =!= col("np")).as("viol"),
                count(lit(1)).as("aud")).head()
            ("pos_post_parity", r.getLong(0), r.getLong(1))
          }
        val docCs = commits.filter(c => exists(s"$dir/data/$c/docs"))
        val (covRow, uniqRow) =
          if (docCs.isEmpty || post.isEmpty)
            (("docs_coverage", 0L, 0L), ("docs_unique", 0L, 0L))
          else {
            val fwd = legUnion(docCs, "docs").get
              .select("cmt", "doc_id")
            val cov = post.get.where(col("cmt").isin(docCs: _*))
              .select("cmt", "doc_id").distinct()
              .join(fwd.distinct().withColumn("has", lit(1)),
                Seq("cmt", "doc_id"), "left_outer")
              .agg(isViol(col("has").isNull).as("viol"),
                count(lit(1)).as("aud")).head()
            val u = fwd.groupBy("cmt", "doc_id")
              .agg(count(lit(1)).as("m"))
              .agg(isViol(col("m") > 1).as("viol"),
                count(lit(1)).as("aud")).head()
            (("docs_coverage", cov.getLong(0), cov.getLong(1)),
              ("docs_unique", u.getLong(0), u.getLong(1)))
          }
        val goneDf = legUnion(tombs, "gone")
        val tombRow = goneDf match {
          case None => ("tomb_wellformed", 0L, 0L)
          case Some(g) =>
            val dup = g.groupBy("cmt", "doc_id").agg(count(lit(1)).as("m"))
              .agg(isViol(col("m") > 1).as("viol"),
                count(lit(1)).as("aud")).head()
            val dvViol = legUnion(tombs, "dvocab")
              .map(_.agg(isViol(col("df") > 0)).head().getLong(0))
              .getOrElse(0L)
            val gcnt = g.groupBy("cmt").agg(count(lit(1)).as("gn"))
            val dsViol = legUnion(tombs, "dstats")
              .map(_.groupBy("cmt")
                .agg(coalesce(sum("nd"), lit(0L)).as("nd"),
                  coalesce(sum("tl"), lit(0L)).as("tl"))
                .join(gcnt, Seq("cmt"), "left_outer")
                .agg(isViol(col("nd") > 0 || col("tl") > 0 ||
                  -col("nd") > coalesce(col("gn"), lit(0L)))).head()
                .getLong(0))
              .getOrElse(0L)
            ("tomb_wellformed", dup.getLong(0) + dvViol + dsViol,
              dup.getLong(1))
        }
        val emptyIds = spark.emptyDataset[Long].toDF("doc_id")
        graft.store.FsckScope(
          vNow,
          Seq(vocabRow, statsRow, posRow, covRow, uniqRow, tombRow),
          post.map(_.select("doc_id").distinct().localCheckpoint(true))
            .getOrElse(emptyIds),
          goneDf.map(_.select("doc_id").distinct().localCheckpoint(true))
            .getOrElse(emptyIds))
      } finally post.foreach(_.unpersist(): Unit)
    }
  }

  /** PREFIX SUGGESTION (autocomplete): top-`k` indexed tokens starting
   *  with `prefix`, ranked by folded document frequency (ties by
   *  token) — the query-suggestion surface a search box needs, served
   *  from the index's VOCAB legs alone. The vocab is
   *  vocabulary-grain (≪ corpus); the prefix cannot bucket-prune
   *  (buckets hash whole tokens) but pushes to the vocab scan as a
   *  StringStartsWith row-group filter, and the ranking is a
   *  TakeOrdered over the prefix matches followed by a window over
   *  the ≤ k survivors — no global single-partition window over the
   *  full match set. Returns (rank, token, df).
   */
  def suggestPrefix(
      spark: SparkSession, dir: String, prefix: String, k: Int): DataFrame = {
    require(prefix.nonEmpty && k > 0, s"bad prefix/k: '$prefix'/$k")
    val top = vocabRows(spark, dir)
      .where(col("token").startsWith(prefix))
      .groupBy("token").agg(sum("df").as("df"))
      .where(col("df") > 0) // fully-deleted tokens must stop suggesting
      .orderBy(col("df").desc, col("token"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("df").desc, col("token"))).cast("long"))
      .select(col("rank"), col("token"), col("df"))
  }

  /** SCORE EXPLANATION: the per-term BM25 breakdown for the top-`k`
   *  docs of a query — (rank, doc_id, token, tf, dl, idf_ppm,
   *  contrib_ppm), one row per matched (doc, term) — the relevance-
   *  debugging surface behind every "why did this doc rank here".
   *  Costs one extra pruned posting probe beyond the search itself
   *  (same bucket pruning; the doc filter is a broadcast k-id
   *  literal), and each row's contrib_ppm sums to the search's
   *  score_ppm by construction (identical arithmetic).
   */
  def explainSearch(
      spark: SparkSession, dir: String, terms: Seq[String], k: Int,
      maxDf: Option[Long] = None): DataFrame = {
    val top = searchBm25(spark, dir, terms, k, maxDf)
      .select("rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // zero hits (terms absent from the index, or all over maxDf) is an
    // ordinary input: the explanation of an empty ranking is the empty
    // breakdown, not explainTop's bounded-top-k contract violation
    if (top.isEmpty) {
      import org.apache.spark.sql.types.{LongType, StringType}
      emptyResult(spark, "rank" -> LongType, "doc_id" -> LongType,
        "token" -> StringType, "tf" -> LongType, "dl" -> LongType,
        "idf_ppm" -> LongType, "contrib_ppm" -> LongType)
    } else explainTop(spark, dir, terms, top.toSeq, maxDf)
  }

  /** [[explainSearch]] for a caller that ALREADY ran the search —
   *  pass the (rank, doc_id) top-k and pay only the one extra pruned
   *  breakdown probe, not a recomputed first-stage search.
   */
  def explainTop(
      spark: SparkSession, dir: String, terms: Seq[String],
      top: Seq[(Long, Long)], maxDf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    require(top.nonEmpty && top.length <= 65536,
      s"explainTop takes a bounded ranked top-k (got ${top.length})")
    val ranks = broadcast(top.toDF("rank", "doc_id"))
    val (avgdl, _, idfPairs, posts) = bm25Prelude(spark, dir, terms, maxDf)
    val idf = idfPairs.toDF("token", "idf_ppm")
    posts
      .where(col("doc_id").isin(top.map(_._2).toSeq: _*))
      .join(broadcast(idf), "token")
      .join(ranks, "doc_id")
      .withColumn("contrib_ppm",
        round(col("idf_ppm").cast("double") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
          .cast("long"))
      .select(col("rank"), col("doc_id"), col("token"), col("tf"),
        col("dl"), col("idf_ppm"), col("contrib_ppm"))
  }

  /** FUZZY TERM SUGGESTION ("did you mean"): indexed tokens within
   *  Levenshtein distance `maxDist` of a (possibly misspelled) query
   *  term, ranked by (distance, folded df DESC, token) — the
   *  spell-correction surface in front of search. The exact term
   *  itself is excluded. Returns (rank, token, dist, df).
   *
   *  When every live commit carries the `del` leg and maxDist <=
   *  [[DelMaxDist]], candidates come from a DELETION-NEIGHBORHOOD KEY
   *  PROBE, never a vocabulary scan: the query term's deletes≤d
   *  variants (driver literals, ≤ |q|²) prune the del leg to their
   *  hash buckets with pushed variant equality; the surviving
   *  candidate tokens (the vocab inside the term's edit ball —
   *  bounded, collected loudly) are Levenshtein-verified and become a
   *  literal filter on the vocab probe for df. Exactness is the
   *  SymSpell invariant: lev(q,t) <= d implies the two deletion
   *  neighborhoods intersect, so the key probe can overgenerate but
   *  never miss. Cost ∝ the variants' key-bucket postings — at a
   *  web-scale vocabulary (10⁸–10⁹ tokens) this is the difference
   *  between a point probe and a full distributed scan per interactive
   *  suggest. Pre-leg indexes (or maxDist > ingest depth) fall back to
   *  the full-vocab Levenshtein scan with identical output.
   */
  def suggestFuzzy(
      spark: SparkSession, dir: String, term: String,
      maxDist: Int, k: Int): DataFrame = {
    require(term.nonEmpty && maxDist >= 1 && k > 0,
      s"bad term/maxDist/k: '$term'/$maxDist/$k")
    val pruned = maxDist <= DelMaxDist && legOnAllCommits(spark, dir, "del")
    val scored =
      if (!pruned)
        vocabRows(spark, dir)
          .groupBy("token").agg(sum("df").as("df"))
          .where(col("df") > 0)
          .withColumn("dist",
            levenshtein(col("token"), lit(term)).cast("long"))
          .where(col("dist") <= maxDist && col("token") =!= term)
      else {
        val variants = delNeighborhood(term, maxDist)
        import spark.implicits._
        val vBuckets = variants.toDF("v")
          .select(hashBucket(col("v"))).distinct()
          .collect().map(_.getLong(0)).toSeq
        // candidate tokens = the vocab inside the term's edit ball —
        // verified by the same Levenshtein before touching vocab df,
        // so the df probe's literal filter is survivor-small
        val cands = readLeg(spark, "del", liveSub(spark, dir, "del"))
          .where(col("db").isin(vBuckets: _*) &&
            col("variant").isin(variants: _*))
          .select("token").distinct()
          .withColumn("dist",
            levenshtein(col("token"), lit(term)).cast("long"))
          .where(col("dist") <= maxDist && col("token") =!= term)
          .limit(65537).collect()
        require(cands.length <= 65536,
          s"fuzzy suggest for '$term' has > 65536 candidate tokens " +
            "inside its edit ball — raise the ranking cut upstream")
        if (cands.isEmpty) {
          import org.apache.spark.sql.types.{LongType, StringType}
          return emptyResult(spark, "rank" -> LongType,
            "token" -> StringType, "dist" -> LongType, "df" -> LongType)
        }
        val byTok = cands.map(r => r.getString(0) -> r.getLong(1)).toMap
        val distDf = broadcast(byTok.toSeq.toDF("token", "dist"))
        vocabRows(spark, dir)
          .where(col("token").isin(byTok.keys.toSeq: _*))
          .groupBy("token").agg(sum("df").as("df"))
          // a candidate whose folded df reached 0 was fully deleted —
          // the del leg may still carry its keys until compaction, but
          // the df fold is what decides liveness
          .where(col("df") > 0)
          .join(distDf, "token")
      }
    val top = scored
      .orderBy(col("dist").asc, col("df").desc, col("token"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("dist").asc, col("df").desc, col("token")))
        .cast("long"))
      .select(col("rank"), col("token"), col("dist"), col("df"))
  }

  /** POSITIONAL PHRASE SEARCH — the operator that lifts
   *  [[searchPhrase]]'s 65536-conjunctive-candidate refusal: phrase
   *  occurrences are counted INDEX-SIDE from the `pos` leg, so a
   *  stop-word-grade phrase ("to be or not to be") is a distributed
   *  aggregation, not a driver-collected candidate list. One posting
   *  scan pruned to the phrase tokens' tb buckets with pushed token
   *  equality; positions explode, each (token @ p, phrase-offset j)
   *  pair proposes start = p − j via a broadcast (token, off) literal
   *  join, and a (doc, start) distinct-offset count equal to the
   *  phrase length is exactly one occurrence — adjacent repeats and
   *  overlapping self-similar phrases count correctly because starts,
   *  not substring arithmetic, are what's counted (the same semantics
   *  as [[searchPhrase]]'s sliding verify, so the two paths agree
   *  wherever both can answer). Nothing collects to the driver and
   *  nothing is ∝ corpus except the pruned positional scan itself.
   *  Returns (rank, doc_id, n_occurrences).
   */
  def searchPhrasePositional(
      spark: SparkSession, dir: String, phrase: String, k: Int): DataFrame = {
    import spark.implicits._
    val toks = phrase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(toks.nonEmpty && k > 0, s"bad phrase/k: '$phrase'/$k")
    require(hasPositionalLeg(spark, dir),
      s"index $dir has no positional leg on every live commit — it " +
        "predates positional ingest; use searchPhrase (candidate-then-" +
        "verify, capped) with the corpus")
    val terms = toks.distinct
    val termBuckets = terms.toDF("t")
      .select(tokenBucket(col("t"))).distinct()
      .collect().map(_.getLong(0)).toSeq
    val offsets = broadcast(
      toks.zipWithIndex.map { case (t, j) => (t, j.toLong) }
        .toDF("token", "off"))
    val n = toks.size
    readDocGrain(spark, dir, "pos")
      .where(col("tb").isin(termBuckets: _*) &&
        col("token").isin(terms: _*))
      .select(col("token"), col("doc_id"),
        explode(col("positions")).as("p"))
      .join(offsets, "token")
      .select(col("doc_id"), (col("p") - col("off")).as("start"), col("off"))
      .groupBy("doc_id", "start")
      .agg(count_distinct(col("off")).as("nmatch"))
      .where(col("nmatch") === n)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("n_occurrences"))
  }

  /** PHRASE SEARCH as candidate-then-verify — the scalable phrase
   *  shape on a POSITIONLESS inverted index: (1) candidates are the
   *  docs containing ALL phrase tokens, from the pruned posting scan
   *  alone (conjunctive containment: per-doc matched-term count must
   *  equal the phrase's distinct-term count); (2) candidates' text is
   *  fetched from `corpus` by point lookup and verified POSITIONALLY:
   *  the occurrence count is the number of start positions `i` with
   *  `tokens[i..i+n-1] == phrase` (a sliding token scan — exact for
   *  adjacent repeats and overlapping self-similar phrases alike,
   *  where substring-replace arithmetic undercounts), ties to
   *  smallest doc_id. Candidates are capped LOUDLY at 65536 — a
   *  phrase of stop-word-grade tokens has corpus-grain conjunctive
   *  candidates and must be handled by a positional index instead.
   *  Returns (rank, doc_id, n_occurrences).
   */
  def searchPhrase(
      spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, textCol: String, phrase: String, k: Int): DataFrame =
    searchPhraseWith(spark, dir, phrase, k, ids =>
      corpus.where(col(idCol).isin(ids: _*))
        .select(col(idCol).as("doc_id"), col(textCol).as("text")))

  /** [[searchPhrase]] answering the verify stage from the index's OWN
   *  forward `docs` leg — no corpus parameter: candidate text comes
   *  back by fb-pruned point lookup ([[docsFor]]), so the index serves
   *  phrases self-contained. Requires the docs leg on every live
   *  commit.
   */
  def searchPhrase(
      spark: SparkSession, dir: String, phrase: String, k: Int): DataFrame =
    searchPhraseWith(spark, dir, phrase, k, ids => docsFor(spark, dir, ids))

  private def searchPhraseWith(
      spark: SparkSession, dir: String, phrase: String, k: Int,
      fetch: Seq[Long] => DataFrame): DataFrame = {
    import spark.implicits._
    val toks = phrase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(toks.nonEmpty && k > 0, s"bad phrase/k: '$phrase'/$k")
    val terms = toks.distinct
    val termBuckets = terms.toDF("t")
      .select(tokenBucket(col("t"))).distinct()
      .collect().map(_.getLong(0)).toSeq
    val candIds = readDocGrain(spark, dir, "post")
      .where(col("tb").isin(termBuckets: _*) &&
        col("token").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count_distinct(col("token")).as("nt"))
      .where(col("nt") === terms.size)
      .select("doc_id")
      .limit(65537).collect().map(_.getLong(0))
    require(candIds.length <= 65536,
      s"phrase '$phrase' has > 65536 conjunctive candidates — " +
        "stop-word-grade tokens need the positional probe " +
        "(searchPhrasePositional), not candidate-then-verify")
    if (candIds.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("rank"), lit(0L).as("doc_id"),
          lit(0L).as("n_occurrences")).limit(0)
    val n = toks.size
    fetch(candIds.toSeq)
      .select(col("doc_id"),
        graft.text.TextOps.tokens(col("text")).as("tokens"))
      .withColumn("n_occurrences",
        when(size(col("tokens")) >= n,
          size(filter(sequence(lit(1), size(col("tokens")) - n + 1),
            i => toks.zipWithIndex.map { case (tk, j) =>
              element_at(col("tokens"), i + j) === tk
            }.reduce(_ && _))))
          .otherwise(lit(0)).cast("long"))
      .where(col("n_occurrences") > 0)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("n_occurrences"))
  }

  /** INDEX-SIDE PROXIMITY SEARCH (NEAR/w): docs where ALL query terms
   *  co-occur within a window of at most `w` tokens, ranked by the
   *  minimal such window (ties by doc_id) — answered ENTIRELY from
   *  the `pos` leg. The pruned positional rows (tb directory pruning
   *  + pushed token equality) explode and run the classic last-seen
   *  min-window sweep per doc ([[TextOps.lastSeenSweep]] — a
   *  partitioned window over the TERMS' positions only, never the
   *  doc's full token stream, never corpus text). This is the
   *  proximity operator candidate-then-verify cannot offer at scale:
   *  stop-word-grade terms stay a distributed aggregation with no
   *  candidate cap and nothing driver-collected ([[searchPhrase]]'s
   *  sibling trade, same as the positional phrase probe). Returns
   *  (rank, doc_id, min_window), min_window <= w.
   */
  def searchNear(
      spark: SparkSession, dir: String, terms0: Seq[String],
      w: Int, k: Int): DataFrame = {
    import spark.implicits._
    val terms = terms0.distinct.sorted
    require(terms.nonEmpty && k > 0 && w >= terms.size,
      s"bad terms/w/k: $terms0/$w/$k (a window below the distinct term " +
        "count can never contain them all)")
    require(hasPositionalLeg(spark, dir),
      s"index $dir has no positional leg on every live commit — NEAR " +
        "needs positional ingest")
    val termBuckets = terms.toDF("t")
      .select(tokenBucket(col("t"))).distinct()
      .collect().map(_.getLong(0)).toSeq
    val pos = readDocGrain(spark, dir, "pos")
      .where(col("tb").isin(termBuckets: _*) &&
        col("token").isin(terms: _*))
      .select(col("doc_id"), explode(col("positions")).as("pos"),
        col("token"))
    TextOps.lastSeenSweep(pos, terms)
      .where(col("nn") === terms.size)
      .select(col("doc_id"),
        (col("pos") - col("lmin") + 1).cast("long").as("wl"))
      .groupBy("doc_id").agg(min(col("wl")).as("min_window"))
      .where(col("min_window") <= w)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("min_window").asc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("min_window"))
  }

  /** ORDERED SLOPPY-PHRASE SEARCH (phrase within a window): docs where
   *  the query terms occur IN PHRASE ORDER within a window of at most
   *  `w` tokens (w = phrase length degenerates to the exact adjacent
   *  phrase; [[searchNear]] is the unordered sibling). Answered
   *  entirely from the `pos` leg by the classic latest-start
   *  minimal-window-subsequence DP: one pass per term layers a
   *  running-max window over the doc-ordered positions — at any
   *  position, s_j = the LATEST start of a chain matching the first j
   *  terms strictly before it (a later start always dominates: the
   *  window is shorter and any continuation prefers it) — so the last
   *  term's rows read their best window directly. All n window passes
   *  share ONE (doc_id, pos) sort: no extra shuffle per term, nothing
   *  driver-collected, cost ∝ the terms' positional postings. Returns
   *  (rank, doc_id, min_window), min_window <= w, ranked (window ASC,
   *  doc_id).
   */
  def searchPhraseSloppy(
      spark: SparkSession, dir: String, phrase: String,
      w: Int, k: Int): DataFrame = {
    import spark.implicits._
    val toks = phrase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(toks.nonEmpty && k > 0 && w >= toks.size,
      s"bad phrase/w/k: '$phrase'/$w/$k (a window below the phrase " +
        "length can never contain it in order)")
    require(hasPositionalLeg(spark, dir),
      s"index $dir has no positional leg on every live commit — sloppy " +
        "phrases need positional ingest")
    val terms = toks.distinct
    val termBuckets = terms.toDF("t")
      .select(tokenBucket(col("t"))).distinct()
      .collect().map(_.getLong(0)).toSeq
    val pos = readDocGrain(spark, dir, "pos")
      .where(col("tb").isin(termBuckets: _*) &&
        col("token").isin(terms: _*))
      .select(col("doc_id"), explode(col("positions")).as("pos"),
        col("token"))
    // strictly-preceding rows only: a duplicated phrase token must not
    // chain through its own occurrence
    val prev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val layered = toks.zipWithIndex.drop(1).foldLeft(
      pos.withColumn("s0",
        when(col("token") === toks.head, col("pos")))) {
      case (df, (_, j)) =>
        df.withColumn(s"s$j",
          max(when(col("token") === toks(j - 1), col(s"s${j - 1}")))
            .over(prev))
    }
    val last = s"s${toks.size - 1}"
    val n = toks.size
    val end =
      if (n == 1) layered.withColumn("chain_start", col("s0"))
      else layered.withColumn("chain_start",
        when(col("token") === toks.last, col(last)))
    end
      .where(col("chain_start").isNotNull &&
        col("token") === toks.last)
      .select(col("doc_id"),
        (col("pos") - col("chain_start") + 1).cast("long").as("wl"))
      .groupBy("doc_id").agg(min(col("wl")).as("min_window"))
      .where(col("min_window") <= w)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("min_window").asc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("min_window"))
  }

  /** RM3 PSEUDO-RELEVANCE-FEEDBACK search: BM25 top-`fbK` feedback
   *  docs from one pruned probe; RM1 expansion-term weights as exact
   *  integer sums (feedback score_ppm × round(1e6·tf/dl) — both
   *  factors integers, so the fold is order-independent and
   *  engine-exact); the top-`expK` expansion terms (ties by token)
   *  join the original terms — full weight — at `expWeightPpm`; one
   *  weighted re-probe ([[searchBm25Weighted]]) answers. The feedback
   *  docs' text comes from `corpus` by an `fbK`-id point lookup (the
   *  forward-index shape — at scale the predicate pushes to row-group
   *  point reads), NEVER a corpus scan: the whole expansion costs two
   *  pruned posting probes plus an `fbK`-doc tokenize.
   */
  def searchBm25Rm3(
      spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, textCol: String, terms: Seq[String], k: Int,
      fbK: Int = 10, expK: Int = 5, expWeightPpm: Long = 500000L,
      maxDf: Option[Long] = None): DataFrame =
    searchBm25Rm3With(spark, dir, terms, k, fbK, expK, expWeightPpm,
      maxDf, ids =>
        corpus.where(col(idCol).isin(ids: _*))
          .select(col(idCol).as("doc_id"), col(textCol).as("text")))

  /** [[searchBm25Rm3]] reading the feedback docs' text from the
   *  index's OWN forward `docs` leg by fb-pruned point lookup — no
   *  corpus parameter; requires the docs leg on every live commit.
   */
  def searchBm25Rm3(
      spark: SparkSession, dir: String, terms: Seq[String], k: Int,
      fbK: Int, expK: Int, expWeightPpm: Long,
      maxDf: Option[Long]): DataFrame =
    searchBm25Rm3With(spark, dir, terms, k, fbK, expK, expWeightPpm,
      maxDf, ids => docsFor(spark, dir, ids))

  private def searchBm25Rm3With(
      spark: SparkSession, dir: String, terms: Seq[String], k: Int,
      fbK: Int, expK: Int, expWeightPpm: Long, maxDf: Option[Long],
      fetch: Seq[Long] => DataFrame): DataFrame = {
    require(terms.nonEmpty && k > 0 && fbK > 0 && expK >= 0 &&
      expWeightPpm > 0, s"bad rm3 parameters: k=$k fbK=$fbK expK=$expK")
    import spark.implicits._
    // feedback is a first-stage top-k: bounded by contract
    val fb = searchBm25(spark, dir, terms, fbK, maxDf)
      .select("doc_id", "score_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expTerms: Seq[String] =
      if (fb.isEmpty) Seq.empty
      else {
        val fbScores = broadcast(fb.toSeq.toDF("doc_id", "fb_score"))
        val tf = fetch(fb.map(_._1).toSeq)
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("token"))
          .where(length(col("token")) > 0)
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        tf.join(dl, "doc_id").join(fbScores, "doc_id")
          .where(!col("token").isin(terms: _*))
          .withColumn("contrib_ppm",
            round(lit(1000000.0) * col("tf") / col("dl")).cast("long"))
          .groupBy("token")
          .agg(sum(col("fb_score") * col("contrib_ppm")).as("w"))
          .orderBy(col("w").desc, col("token"))
          .limit(expK).select("token").collect().map(_.getString(0)).toSeq
      }
    searchBm25Weighted(spark, dir,
      terms.map((_, 1000000L)) ++ expTerms.map((_, expWeightPpm)), k, maxDf)
  }

  /** BATCHED multi-query BM25: score a TABLE of queries —
   *  (query_id, token) rows — in ONE pruned posting scan. This is the
   *  production batch-retrieval shape (an eval suite, a distillation
   *  query log, RAG over a request batch): [[searchBm25]] is
   *  single-query with driver-side scalar folds, so N queries cost N
   *  stats folds + N vocab probes + N posting scans; here the UNION of
   *  the batch's terms prunes one scan exactly the way a single
   *  query's terms would (token-bucket directory pruning + pushed
   *  token equality), the query table broadcasts onto the postings,
   *  and the top-k ranks per query under a rank-limited window
   *  (partitionBy query_id — WindowGroupLimit keeps per-task state at
   *  k, no global sort). Per-term scoring is IDENTICAL to
   *  [[searchBm25]] (same driver-computed idf arithmetic), so a batch
   *  of one query returns exactly that query's search results.
   *
   *  The batch's distinct (query_id, token) PAIRS collect to the
   *  driver — bounded (≤ 262144 pairs AND ≤ 65536 distinct terms,
   *  loud past either cap; split larger batches) — so the pruning
   *  literals and the posting-join side derive from ONE evaluation
   *  of a possibly-nondeterministic `queries` frame, the same
   *  capped-small contract as [[containmentProbe]]; duplicate terms
   *  within a query count once, as in searchBm25.
   *
   *  Returns (query_id, rank, doc_id, score_ppm, n_terms), rank ≤ k
   *  per query.
   */
  def searchBm25Batch(
      spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      maxDf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    // the pruning-term literals and the posting-join side must see the
    // SAME rows even if `queries` is nondeterministic — so the pairs
    // collect ONCE to the driver (bounded: the batch is capped-small
    // by contract, loud past the cap) and both derive from that one
    // collected set, rebuilt as a literal broadcast frame
    val qtRows = queries.select(col("query_id"), col("token")).distinct()
    val pairs = qtRows.limit(262145).collect()
    require(pairs.length <= 262144,
      s"searchBm25Batch query batch has >= ${pairs.length} (query, term) " +
        "pairs — the batch probe is for capped-small query sets (split it)")
    val qt = spark.createDataFrame(
      java.util.Arrays.asList(pairs: _*), qtRows.schema)
    val terms = pairs.map(_.getString(1)).distinct
    require(terms.nonEmpty, "searchBm25Batch with no terms")
    require(terms.length <= 65536,
      s"searchBm25Batch query batch has ${terms.length} distinct terms — " +
        "the batch probe is for capped-small query sets (split it)")
    val (avgdl, _, idfPairs, posts) =
      bm25Prelude(spark, dir, terms.toSeq, maxDf)
    val idf = idfPairs.toDF("token", "idf_ppm")
    posts
      .join(broadcast(idf), "token")
      .join(broadcast(qt), "token") // fan out to the queries naming the term
      .withColumn("score_ppm",
        round(col("idf_ppm").cast("double") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
          .cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum("score_ppm").as("score_ppm"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_ppm").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_ppm"), col("n_terms"))
  }

  /** INDEX-ACCELERATED DECONTAMINATION: find corpus documents whose
   *  token overlap with a (capped-small) benchmark table is high,
   *  touching ONLY the benchmark's terms' posting lists — the
   *  decontamination posture when the corpus can no longer be scanned
   *  per benchmark: probe cost is ∝ the benchmark's tokens' postings
   *  (token-bucket directory pruning + pushed-down token equality,
   *  the same scan shape as [[searchBm25]]), never ∝ the corpus.
   *
   *  A benchmark token is KEPT iff it is indexed and its folded df ≤
   *  `maxDf` — a ubiquitous token carries no contamination signal and
   *  its posting list is corpus-grain (the stop-word cap, same
   *  discipline as search). Containment is |posting overlap| / |kept
   *  benchmark tokens| in exact integer ppm, so any engine computing
   *  the same definition hash-matches. Returns (bench_id, doc_id,
   *  n_kept, overlap, containment_ppm) for pairs ≥ `minPpm`.
   *
   *  The benchmark's distinct tokens collect to the driver (bounded —
   *  a benchmark is small by contract; loud failure past the cap) to
   *  become LITERAL token/bucket filters, exactly like search terms.
   */
  def containmentProbe(
      spark: SparkSession, dir: String, bench: DataFrame,
      idCol: String, textCol: String, maxDf: Long, minPpm: Long): DataFrame = {
    // an index with no live shard commits probes to the empty result
    // (nothing can be contained in nothing) — without this guard the
    // per-commit union below is an empty .reduce and throws a bare
    // UnsupportedOperationException instead of answering
    if (liveSub(spark, dir, "post").isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          Seq("bench_id", "doc_id", "n_kept", "overlap", "containment_ppm")
            .map(org.apache.spark.sql.types.StructField(_,
              org.apache.spark.sql.types.LongType))))
    val bt = bench
      .select(col(idCol).as("bench_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .distinct()
      .persist()
    try {
      val terms = bt.select("token").distinct().collect().map(_.getString(0))
      require(terms.length <= 65536,
        s"containmentProbe benchmark has ${terms.length} distinct tokens — " +
          "the probe is for capped-small benchmarks (split it, or scan)")
      val dfByTerm = vocabRows(spark, dir)
        .where(col("token").isin(terms.toSeq: _*))
        .groupBy("token").agg(sum("df").as("df"))
        .where(col("df") > 0)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = terms.filter(t => dfByTerm.get(t).exists(_ <= maxDf)).toSeq
      val keptBt = bt.where(col("token").isin(kept: _*))
      val nKept = keptBt.groupBy("bench_id").agg(count(lit(1)).as("n_kept"))
      val termBuckets =
        if (kept.isEmpty) Seq.empty[Long]
        else {
          import spark.implicits._
          kept.toDF("t").select(tokenBucket(col("t"))).distinct()
            .collect().map(_.getLong(0)).toSeq
        }
      // postings are unique per (token, doc): shards partition docs and
      // compaction concatenates, so count(*) IS the distinct-token overlap
      val posts = readDocGrain(spark, dir, "post")
        .where(col("tb").isin(termBuckets: _*) &&
          col("token").isin(kept: _*))
      posts.select("token", "doc_id")
        .join(broadcast(keptBt), Seq("token"))
        .groupBy("bench_id", "doc_id")
        .agg(count(lit(1)).as("overlap"))
        .join(broadcast(nKept), Seq("bench_id"))
        .withColumn("containment_ppm",
          expr("1000000 * overlap div n_kept"))
        .where(col("containment_ppm") >= minPpm)
        .select(col("bench_id"), col("doc_id"), col("n_kept"),
          col("overlap"), col("containment_ppm"))
    } finally bt.unpersist(): Unit
  }

  /** INDEXED PHRASE PERCOLATION (reverse phrase search at rule
   *  scale): match a batch of documents against phrase rules STORED
   *  AS A TEXT INDEX — each rule ingested as a one-phrase document
   *  (rule id = doc_id, phrase = text, [[LegProfile]] with `pos`) —
   *  lifting [[TextOps.percolatePhrases]]' 4096-literal-rule cap to
   *  an unbounded persisted rule set (the alerting registry shape: a
   *  million standing "page me when ..." phrases, maintained by the
   *  same ingest/compact/forget lifecycle as any index).
   *
   *  Matching is a WINDOW-EQUIJOIN, not a token join: (1) candidate
   *  rules RECONSTRUCT their phrase string from the positional
   *  postings — pruned to the batch's own token buckets with pushed
   *  token equality, so this is ∝ rules sharing vocabulary with the
   *  batch, never the registry, and a rule with ANY token absent
   *  from the batch reconstructs incomplete and is dropped by the
   *  offsets-count = stored-dl completeness check (it cannot match
   *  anyway); (2) the batch computes every doc's sliding token
   *  window of each DISTINCT rule length (≤ 64 lengths, loud —
   *  token-linear per length), and the window STRING equijoins the
   *  phrase string — space-joined tokens are injective under a
   *  space tokenizer, so the join is EXACT, its output is the true
   *  match set, and its cost is hash-join linear. A per-token join
   *  would instead pay Σ_t freq_doc(t)·freq_rules(t) — quadratic in
   *  common-token frequency and ruinous on small vocabularies (the
   *  31-word synthetic corpus measured 114M pairs for a 43k-rule ×
   *  500-doc batch). Adjacent repeats and overlapping self-similar
   *  phrases count exactly (each start is its own window row). The
   *  batch's distinct tokens are the only driver-collected set
   *  (≤ 65536, loud: percolation batches are micro-batch-grain by
   *  contract; split larger ones). Rules are NEVER broadcast as
   *  literals.
   *
   *  Output (query_id, doc_id, n_occurrences), matches only —
   *  identical to percolatePhrases over the same rules.
   */
  def percolateIndexed(
      spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    require(hasPositionalLeg(spark, dir),
      s"rule index $dir has no positional leg on every live commit — " +
        "ingest rules with a pos-bearing LegProfile")
    import spark.implicits._
    import org.apache.spark.sql.types.LongType
    val dtk = docs
      .select(col(idCol).as("doc_id"),
        filter(TextOps.tokens(col(textCol)),
          t => length(t) > 0).as("tk"))
      .persist()
    try {
      val dtok = dtk
        .select(explode(col("tk")).as("token")).distinct()
        .limit(65537).collect().map(_.getString(0)).toSeq
      require(dtok.length <= 65536,
        "percolateIndexed batch has > 65536 distinct tokens — split " +
          "the batch (the token set prunes the rule-index scan and " +
          "must stay driver-bounded)")
      if (dtok.isEmpty)
        return emptyResult(spark, "query_id" -> LongType,
          "doc_id" -> LongType, "n_occurrences" -> LongType)
      val buckets = dtok.toDF("t")
        .select(tokenBucket(col("t"))).distinct()
        .collect().map(_.getLong(0)).toSeq
      // candidate rules' phrase lengths: dl rides every posting row
      // (dl = the rule-document's token count), pruned by the batch's
      // tokens — rule-grain rows, only for rules sharing vocabulary
      val rlen = readDocGrain(spark, dir, "post")
        .where(col("tb").isin(buckets: _*) &&
          col("token").isin(dtok: _*))
        .select(col("doc_id").as("query_id"), col("dl").as("n"))
        .distinct()
      // reconstruct each candidate rule's phrase from its pruned
      // positional rows; rules missing any token (absent from the
      // batch) reconstruct short and fail the completeness check
      val rphrase = readDocGrain(spark, dir, "pos")
        .where(col("tb").isin(buckets: _*) &&
          col("token").isin(dtok: _*))
        .select(col("doc_id").as("query_id"), col("token"),
          explode(col("positions")).as("off"))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_off"),
          concat_ws(" ", transform(
            sort_array(collect_list(struct(col("off"), col("token")))),
            s => s.getField("token"))).as("phrase"))
        .join(rlen, "query_id")
        .where(col("n_off") === col("n"))
        .select(col("query_id"), col("n"), col("phrase"))
        .persist()
      // distinct candidate rule lengths drive the doc-side windowing —
      // a rule REGISTRY has few distinct phrase lengths by nature
      val lengths = rphrase.select(col("n")).distinct()
        .limit(65).collect().map(_.getLong(0)).toSeq
      try {
        if (lengths.isEmpty)
          return emptyResult(spark, "query_id" -> LongType,
            "doc_id" -> LongType, "n_occurrences" -> LongType)
        require(lengths.length <= 64,
          "percolateIndexed rule registry has > 64 distinct phrase " +
            "lengths sharing vocabulary with this batch — split the " +
            "registry by length band")
        val windows = dtk
          .select(col("doc_id"), col("tk"),
            explode(array(lengths.map(lit): _*)).as("n"))
          .where(size(col("tk")) >= col("n"))
          .select(col("doc_id"), col("n"),
            explode(transform(
              sequence(lit(1), size(col("tk")) - col("n") + 1),
              s => concat_ws(" ", slice(col("tk"), s, col("n")))))
              .as("phrase"))
        windows.join(rphrase, Seq("n", "phrase"))
          .groupBy("query_id", "doc_id")
          .agg(count(lit(1)).as("n_occurrences"))
          .select(col("query_id"), col("doc_id"), col("n_occurrences"))
      } finally rphrase.unpersist(): Unit
    } finally dtk.unpersist(): Unit
  }

  /** Fold `roots` (absolute commit dirs) into the staged commit dir
   *  `dst` — the ONE leg-fold implementation compaction and federated
   *  merge share. Core legs (post/vocab/stats) are mandatory; the
   *  optional legs (pos/del/docs) fold iff present on EVERY input and
   *  refuse loudly on a mixed set (a partial leg would silently answer
   *  from part of the corpus). All folds are the legs' own monoids:
   *  postings/positions/docs concatenate (tb/db/fb are pure functions
   *  of their key, identical across shards, so bucket layout is
   *  preserved), vocab df and stats (nd, tl) sum, del keys
   *  set-union (the same (variant, token) pair recurs when shards
   *  share a token — folding dedups so the leg stays vocabulary-grain
   *  instead of growing with shard history).
   */
  private def foldLegs(
      spark: SparkSession, rootsGone: Seq[(String, Seq[String])],
      dst: String, tombRoots: Seq[String] = Seq.empty): Unit = {
    val roots = rootsGone.map(_._1)
    val scopeByRoot = rootsGone.toMap
    val conf = spark.sessionState.newHadoopConf()
    def having(sub: String): Seq[String] =
      roots.map(r => s"$r/$sub").filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).exists(hp)
      }
    def uniform(sub: String): Option[Seq[String]] = {
      val h = having(sub)
      require(h.isEmpty || h.size == roots.size,
        s"cannot fold: leg '$sub' exists on ${h.size} of ${roots.size} " +
          "input commits — a mixed-generation fold would publish a " +
          "partial leg that silently answers from part of the corpus; " +
          "re-ingest the pre-leg shards (or fold them separately) first")
      if (h.isEmpty) None else Some(h)
    }
    def read(sub: String, paths: Seq[String]): DataFrame =
      readLeg(spark, sub, paths)
    // tombstone application (FULL folds only — compactTiered guards):
    // each root's doc-grain rows drop ITS OWN scope's gone docs (a
    // tombstone covers only the commits that precede it, so a doc
    // re-ingested after its takedown survives the fold — physical
    // erasure of the OLD rows lands here, vacuum reclaims the dirs);
    // vocab/stats fold the global negative deltas in and keep df > 0,
    // del keys semi-join the surviving vocab so fully-deleted tokens
    // stop key-probing
    def readScoped(sub: String, paths: Seq[String]): DataFrame =
      paths.map { p =>
        val df = readLeg(spark, sub, Seq(p))
        val ts = scopeByRoot.getOrElse(p.stripSuffix(s"/$sub"), Seq.empty)
        if (ts.isEmpty) df
        else df.join(
          broadcast(readLeg(spark, "gone", ts.map(t => s"$t/gone"))
            .select("doc_id")),
          Seq("doc_id"), "left_anti")
      }.reduce(_.unionByName(_))
    def foldedVocab: DataFrame = {
      val base = read("vocab", having("vocab"))
      val all =
        if (tombRoots.isEmpty) base
        else base.unionByName(read("dvocab", tombRoots.map(t => s"$t/dvocab")))
      all.groupBy("token").agg(sum(col("df")).as("df"))
        .where(col("df") > 0)
    }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val jobs = Seq(
      Some(() =>
        readScoped("post", having("post"))
          .select(col("token"), col("doc_id"), col("tf"), col("dl"), col("tb"))
          .repartition(TokenBuckets, col("tb"))
          .write.partitionBy("tb").parquet(s"$dst/post")),
      uniform("pos").map(ps => () =>
        readScoped("pos", ps)
          .select(col("token"), col("doc_id"), col("positions"), col("tb"))
          .repartition(TokenBuckets, col("tb"))
          .write.partitionBy("tb").parquet(s"$dst/pos")),
      Some(() =>
        foldedVocab
          .coalesce(4)
          .write.parquet(s"$dst/vocab")),
      uniform("del").map(ds => () => {
        val base = read("del", ds)
          .select(col("variant"), col("token"), col("db"))
          .dropDuplicates("variant", "token")
        val live =
          if (tombRoots.isEmpty) base
          else base.join(foldedVocab.select("token"), Seq("token"),
            "left_semi")
        live
          .repartition(TokenBuckets, col("db"))
          .write.partitionBy("db").parquet(s"$dst/del")
      }),
      Some(() => {
        val base = read("stats", having("stats"))
        val all =
          if (tombRoots.isEmpty) base
          else base.unionByName(read("dstats", tombRoots.map(t => s"$t/dstats")))
        all.agg(sum(col("nd")).as("nd"), sum(col("tl")).as("tl"))
          .coalesce(1).write.parquet(s"$dst/stats")
      }),
      uniform("docs").map(ds => () =>
        readScoped("docs", ds)
          .select(col("doc_id"), col("text"), col("fb"))
          .repartition(TokenBuckets, col("fb"))
          .write.partitionBy("fb").parquet(s"$dst/docs"))
    ).flatten
    Await.result(
      Future.sequence(jobs.map(j => Future(j()))), Duration.Inf): Unit
  }

  /** Full fold: every live shard commit into one. Right for an
   *  explicit "optimize"; the steady-state policy is [[compactTiered]]
   *  (a full fold under sustained ingest rewrites O(N²) bytes total).
   */
  def compact(spark: SparkSession, dir: String): Unit =
    compactTiered(spark, dir, fanIn = Int.MaxValue)

  /** SIZE-TIERED shard compaction — the same LSM policy as the rollup
   *  store's compactTiered, applied to the index's three legs, which
   *  all fold associatively: postings CONCATENATE (tb is a pure
   *  function of token, identical across shards, so bucket layout is
   *  preserved), vocab df and stats (nd, tl) are sum monoids. Without
   *  this, every ingested shard adds a commit dir forever and
   *  [[searchBm25]]'s per-commit union grows linearly in shard count —
   *  query-PLANNING cost ∝ history, the small-files problem in index
   *  clothing. Folding only the `fanIn` smallest commits bounds write
   *  amplification (a commit's bytes are rewritten O(log N)-ish times
   *  over its life, not once per trigger).
   *
   *  Atomicity rides the same CommitLog swap as ingest: the folded
   *  output is invisible until the version-file create, `#txn:`
   *  delivery keys pass through UNTOUCHED (exactly-once survives any
   *  number of compactions), and if a concurrent writer moved any
   *  input commit the publish ABORTS and drops its staging — folding
   *  an already-folded input would double-count df/nd/tl.
   */
  def compactTiered(spark: SparkSession, dir: String, fanIn: Int = 8): Unit = {
    requireUnpinned(spark, dir, "compactTiered")
    val cl = clog(dir)
    val (_, live) = cl.latest(spark)
    val all = live.filter(_.startsWith("c-"))
    val tombs = live.filter(_.startsWith("t-"))
    // tombstones fold away ONLY in a full fold: a partial fold cannot
    // know a gone doc's rows all sit inside its inputs, and folding
    // the dvocab/dstats deltas while the doc's postings survive in an
    // unfolded commit would subtract twice — partial folds concatenate
    // pure, fold WITHIN one run of consecutive shard commits (no
    // tombstone between them), and SPLICE their output at the run's
    // position so every commit keeps exactly its original
    // subsequent-tombstone coverage
    val full = fanIn >= all.size
    val applyTombs = full && tombs.nonEmpty
    if (all.isEmpty || (all.size <= 1 && !applyTombs)) return
    val conf = spark.sessionState.newHadoopConf()
    val name = s"c-${java.util.UUID.randomUUID().toString.take(12)}"
    if (full) {
      // scoped application: each shard drops the gone sets of the
      // tombstones AFTER it; every tombstone retires (its deltas fold
      // into the one output's vocab/stats)
      val ordered = live.filter(e =>
        e.startsWith("c-") || e.startsWith("t-"))
      val rootsGone = ordered.zipWithIndex
        .filter(_._1.startsWith("c-"))
        .map { case (c, i) =>
          (s"$dir/data/$c", ordered.drop(i + 1)
            .filter(_.startsWith("t-")).map(t => s"$dir/data/$t"))
        }
      foldLegs(spark, rootsGone, s"$dir/data/$name",
        tombRoots = tombs.map(t => s"$dir/data/$t"))
      val replaced = all ++ tombs
      // CommitLog.spliceReplace, never append: a tombstone published
      // concurrently during the fold (its stale-abort only watches
      // the c-/t- set it observed, so against a pre-fold snapshot it
      // lands fine) sits AFTER this fold's inputs in log order —
      // appending the folded output after it would empty that
      // tombstone's order-scoped coverage, silently resurrecting the
      // acknowledged takedown while its dvocab/dstats deltas still
      // fold globally. Aborts (None) if an input moved — never
      // double-fold.
      val published = cl.commit(spark) { now =>
        graft.store.CommitLog.unlessPinned(now)(
          graft.store.CommitLog.spliceReplace(now, replaced, name))
      }
      if (!published) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/data/$name")
        p.getFileSystem(conf).delete(p, true): Unit
      }
    } else {
      // runs of consecutive c- commits between tombstone boundaries;
      // fold the fanIn smallest within the largest run
      val ordered = live.filter(e =>
        e.startsWith("c-") || e.startsWith("t-"))
      val runs = ordered.foldLeft(Seq(Seq.empty[String])) { (acc, e) =>
        if (e.startsWith("t-")) acc :+ Seq.empty
        else acc.init :+ (acc.last :+ e)
      }
      val run = runs.maxBy(_.size)
      if (run.size <= 1) return
      val dirs = run.map { d =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/data/$d")
        val fs = p.getFileSystem(conf)
        (d, if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L)
      }.sortBy(_._2).take(math.max(2, fanIn)).map(_._1)
      if (dirs.size <= 1) return
      foldLegs(spark, dirs.map(d => (s"$dir/data/$d", Seq.empty[String])),
        s"$dir/data/$name")
      // splice at the first input's position — the output stays
      // inside its run, keeping the same tombstone coverage; None
      // when an input moved under us (abort, never double-fold)
      val published = cl.commit(spark) { now =>
        graft.store.CommitLog.unlessPinned(now)(
          graft.store.CommitLog.spliceReplace(now, dirs, name))
      }
      if (!published) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/data/$name")
        p.getFileSystem(conf).delete(p, true): Unit
      }
    }
  }

  /** TOMBSTONE-SCOPED RETIREMENT — the takedown-stream answer to "only
   *  a FULL fold retires tombstones": retire the OLDEST live tombstone
   *  by rewriting IN PLACE only the covered commits that actually
   *  contain its rows. Order-scoping already knows the covered set
   *  (every commit before the tombstone); a containment probe (one
   *  gone-semi-join per covered commit's postings) skips commits that
   *  hold none of the gone docs, so cost is ∝ the commits the docs
   *  live in — never the post-tombstone ingest stream, never a
   *  whole-index rewrite. Each rewritten commit keeps its LOG
   *  POSITION (spliced in place), so every other tombstone's coverage
   *  is untouched, and its vocab/stats are RECOMPUTED from its
   *  surviving postings — exactly the state a full fold would have
   *  produced, so the tombstone's dvocab/dstats deltas are consumed
   *  and the tombstone entry drops. One atomic commit publishes all
   *  rewrites + the retirement; any concurrent c-/t- movement aborts
   *  (staging dropped) and the caller re-runs.
   *
   *  Under a steady right-to-be-forgotten stream this bounds read
   *  fan-in at cost ∝ covered commits per retirement, where the old
   *  policy ([[compact]]) re-read the WHOLE stored index; commits
   *  after the oldest tombstone — the live ingest frontier — are
   *  never rewritten. Returns true when a tombstone was retired;
   *  false when none are live. [[retireTombstones]] loops it.
   */
  /** The shared per-commit in-place rewrite behind tombstone
   *  retirement AND the Minimal-profile direct delete: ONE
   *  containment-probe job over `covered` (a per-commit probe loop
   *  would pay one job's fixed overhead per commit and dominate at
   *  high commit counts), then each touched commit rewrites WITHOUT
   *  the gone docs — doc-grain legs anti-join the gone set;
   *  vocab/stats RECOMPUTE from the surviving postings (df = live
   *  posting rows per token, nd/tl = live docs / token total — the
   *  ingest-time invariants, which exact-delta folds preserve); del
   *  keys semi-join the surviving vocab so fully-deleted tokens stop
   *  key-probing. Returns old-name -> new-name ("" = every doc gone,
   *  drop the commit); the caller owns the atomic publish and the
   *  abort cleanup.
   *
   *  ZERO-TOKEN DOCS (text that tokenizes to nothing) live ONLY in
   *  the forward docs leg — ingest writes docs rows for every doc but
   *  postings only for tokens — so both the containment probe and the
   *  drop-commit decision run over docs ∪ post, never post alone: a
   *  post-only probe would skip the commit holding an erased
   *  zero-token doc's text (the text resurrects in docsFor/docsWhere
   *  the moment its tombstone retires — an erasure-contract breach
   *  full folds don't have, since they anti-join the docs leg), and a
   *  post-only drop decision would destroy still-live zero-token
   *  docs' forward rows when a commit's postings all die. A commit
   *  whose postings empty but whose docs survive rewrites with
   *  zero-row token-grain legs written UNPARTITIONED (an empty
   *  partitionBy write creates no files and is unreadable; a plain
   *  empty write keeps one schema-bearing file) — every read path
   *  unions per-commit and filters tb/db as a column, so layout can
   *  differ per commit.
   */
  private def rewriteCommitsWithout(
      spark: SparkSession, dir: String, gone: DataFrame,
      covered: Seq[String]): Map[String, String] = {
    val conf = spark.sessionState.newHadoopConf()
    def has(c: String, sub: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/data/$c/$sub")
      p.getFileSystem(conf).exists(p)
    }
    val touched: Set[String] =
      if (covered.isEmpty) Set.empty
      else covered.map { c =>
          val p = readLeg(spark, "post", Seq(s"$dir/data/$c/post"))
            .select(col("doc_id"))
          // docs ∪ post: zero-token docs appear in the docs leg only
          (if (has(c, "docs"))
            p.unionByName(readLeg(spark, "docs", Seq(s"$dir/data/$c/docs"))
              .select(col("doc_id")))
          else p).withColumn("cmt", lit(c))
        }
        .reduce(_.unionByName(_))
        .join(gone, Seq("doc_id"), "left_semi")
        .select("cmt").distinct()
        .collect().map(_.getString(0)).toSet
    covered.flatMap { c =>
      if (!touched.contains(c)) None
      else {
        val post = readLeg(spark, "post", Seq(s"$dir/data/$c/post"))
        // keep a keyed commit's key-digest prefix so batch-grain pair/
        // report addressing survives the rewrite
        val name = (if (c.matches("c-k[0-9a-f]{16}-.*"))
          c.substring(0, 19) else "c") +
          s"-${java.util.UUID.randomUUID().toString.take(12)}"
        val dst = s"$dir/data/$name"
        val post2 = post.join(gone, Seq("doc_id"), "left_anti").persist()
        val docs2 = Option.when(has(c, "docs"))(
          readLeg(spark, "docs", Seq(s"$dir/data/$c/docs"))
            .join(gone, Seq("doc_id"), "left_anti").persist())
        try {
          val postEmpty = post2.isEmpty
          if (postEmpty && docs2.forall(_.isEmpty))
            // every doc of this commit is taken down across BOTH
            // doc-grain legs — drop the commit from the live list
            // instead of publishing an empty one
            Some(c -> "")
          else {
            // concurrent leg writes off the materialized post2/docs2
            // caches — the foldLegs discipline (the isEmpty probes
            // above already populated them). When the postings all
            // died but forward docs survive (zero-token docs), the
            // token-grain legs are zero rows: write them plain — an
            // empty partitionBy write has no files and is unreadable
            val vocab2 = post2.groupBy("token")
              .agg(count(lit(1)).as("df"))
            def bucketed(df: DataFrame, bcol: String, leg: String): Unit =
              if (postEmpty)
                df.coalesce(1).write.parquet(s"$dst/$leg")
              else
                df.repartition(TokenBuckets, col(bcol))
                  .write.partitionBy(bcol).parquet(s"$dst/$leg")
            import scala.concurrent.{Await, ExecutionContext, Future}
            import scala.concurrent.duration.Duration
            implicit val ec: ExecutionContext = ExecutionContext.global
            val jobs = Seq(
              Some(() => bucketed(post2
                .select(col("token"), col("doc_id"), col("tf"), col("dl"),
                  col("tb")), "tb", "post")),
              Some(() =>
                vocab2.coalesce(4).write.parquet(s"$dst/vocab")),
              Some(() => post2.groupBy("doc_id").agg(sum("tf").as("dl"))
                .agg(count(lit(1)).as("nd"),
                  coalesce(sum(col("dl")), lit(0L)).as("tl"))
                .coalesce(1).write.parquet(s"$dst/stats")),
              Option.when(has(c, "pos"))(() =>
                bucketed(readLeg(spark, "pos", Seq(s"$dir/data/$c/pos"))
                  .join(gone, Seq("doc_id"), "left_anti")
                  .select(col("token"), col("doc_id"), col("positions"),
                    col("tb")), "tb", "pos")),
              docs2.map(d => () =>
                // docs2 ⊇ post2's docs, so it is non-empty here —
                // always the partitioned layout
                d.select(col("doc_id"), col("text"), col("fb"))
                  .repartition(TokenBuckets, col("fb"))
                  .write.partitionBy("fb").parquet(s"$dst/docs")),
              Option.when(has(c, "del"))(() =>
                bucketed(readLeg(spark, "del", Seq(s"$dir/data/$c/del"))
                  .join(vocab2.select("token"), Seq("token"), "left_semi")
                  .select(col("variant"), col("token"), col("db")),
                  "db", "del"))
            ).flatten
            Await.result(
              Future.sequence(jobs.map(j => Future(j()))), Duration.Inf): Unit
            Some(c -> name)
          }
        } finally {
          post2.unpersist(): Unit
          docs2.foreach(_.unpersist(): Unit)
        }
      }
    }.toMap
  }

  /** Publish a rewriteCommitsWithout result atomically: apply the
   *  old->new mapping in place, drop `alsoDrop` entries, append
   *  `append` entries; abort (staging dropped, loud) when the live
   *  c-/t- set moved from `snap`.
   */
  private def publishRewrites(
      spark: SparkSession, dir: String, snap: Seq[String],
      rewrites: Map[String, String], alsoDrop: Set[String],
      append: Seq[String], what: String): Unit = {
    val published = clog(dir).commit(spark) { now =>
      if (now.filter(e => e.startsWith("c-") || e.startsWith("t-"))
          != snap) None // live set moved under us — abort, re-run
      else graft.store.CommitLog.unlessPinned(now)(Some(now.flatMap { e =>
        if (alsoDrop.contains(e)) Seq.empty
        else rewrites.get(e) match {
          case Some("") => Seq.empty // fully-taken-down commit dropped
          case Some(n) => Seq(n) // rewritten in place — coverage intact
          case None => Seq(e)
        }
      } :++ append))
    }
    if (!published) {
      val conf = spark.sessionState.newHadoopConf()
      for (n <- rewrites.values if n.nonEmpty) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/data/$n")
        p.getFileSystem(conf).delete(p, true): Unit
      }
      throw new IllegalStateException(
        s"$what raced a concurrent writer at $dir — " +
          "staging dropped; re-run against the new live set")
    }
  }

  def retireOldestTombstone(spark: SparkSession, dir: String): Boolean = {
    requireUnpinned(spark, dir, "retireOldestTombstone")
    val cl = clog(dir)
    val (_, live) = cl.latest(spark)
    val snap = live.filter(e => e.startsWith("c-") || e.startsWith("t-"))
    val tIdx = snap.indexWhere(_.startsWith("t-"))
    if (tIdx < 0) return false
    val t = snap(tIdx)
    val covered = snap.take(tIdx).filter(_.startsWith("c-"))
    val gone = broadcast(
      readLeg(spark, "gone", Seq(s"$dir/data/$t/gone")).select("doc_id"))
    val rewrites = rewriteCommitsWithout(spark, dir, gone, covered)
    // t retired: its rows are physically out, its deltas are consumed
    // by the recomputed vocab/stats
    publishRewrites(spark, dir, snap, rewrites, alsoDrop = Set(t),
      append = Seq.empty, what = "retireOldestTombstone")
    true
  }

  /** DIRECT in-place deletion — the Minimal-profile answer to
   *  [[forgetDocs]] (which needs the forward docs leg for its exact
   *  deltas): rewrite every live commit holding the ids WITHOUT them,
   *  recomputing each commit's vocab/stats from its surviving
   *  postings — no tombstone, no deltas, no corpus parameter (the
   *  post leg already knows the docs), physical erasure immediate
   *  (vacuum reclaims the superseded dirs). Works on any profile;
   *  prefer [[forgetDocs]] when the docs leg exists (O(ids) tombstone
   *  now, rewrite deferred to retirement/folds — this rewrites the
   *  touched commits up front). Refuses while tombstones are live:
   *  a later tombstone's deltas were computed against these rows, so
   *  erasing them out from under it would double-subtract at its
   *  retirement — retire tombstones first. `key` ledgers the delete
   *  exactly-once; deleting ids the index never held is a ledgered
   *  no-op.
   */
  def forgetDocsRebuild(
      spark: SparkSession, dir: String, ids: Seq[Long],
      key: Option[String] = None): Unit = {
    require(ids.nonEmpty && ids.length <= 65536,
      s"forgetDocsRebuild takes 1..65536 ids per call (got ${ids.length})")
    requireUnpinned(spark, dir, "forgetDocsRebuild")
    val cl = clog(dir)
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad delivery key: $k")
      "#txn:" + k
    }
    txn.foreach { t =>
      require(!cl.latest(spark)._2.contains(t),
        s"delete with delivery key ${key.get} was already applied to " +
          s"$dir — redelivery rejected (deletion is exactly-once)")
    }
    val (_, live) = cl.latest(spark)
    val snap = live.filter(e => e.startsWith("c-") || e.startsWith("t-"))
    require(!snap.exists(_.startsWith("t-")),
      s"index $dir has live tombstones — their deltas were computed " +
        "against the rows this rebuild would erase (retiring them " +
        "later would double-subtract); retireTombstones first")
    import spark.implicits._
    val gone = broadcast(ids.distinct.toDF("doc_id"))
    val rewrites = rewriteCommitsWithout(spark, dir, gone,
      snap.filter(_.startsWith("c-")))
    publishRewrites(spark, dir, snap, rewrites, alsoDrop = Set.empty,
      append = txn.toSeq, what = "forgetDocsRebuild")
  }

  /** Retire up to `upTo` tombstones, oldest first (each retirement is
   *  one atomic commit; a concurrent-writer race aborts loudly and the
   *  caller re-runs). Returns the number retired.
   */
  def retireTombstones(
      spark: SparkSession, dir: String, upTo: Int = Int.MaxValue): Int = {
    var n = 0
    while (n < upTo && retireOldestTombstone(spark, dir)) n += 1
    n
  }

  /** FEDERATED MERGE: fold ANOTHER index instance's live shards into
   *  this one as ONE commit — the operation that unifies indexes built
   *  independently (per-region crawls, per-tenant corpora, a backfill
   *  job's private index) WITHOUT re-reading any corpus text. All
   *  three legs fold by the same monoids compaction uses — postings
   *  concatenate (tb is a pure function of token, identical in every
   *  instance, so bucket layout is preserved), vocab df and stats
   *  (nd, tl) sum — so merge cost is ∝ the SOURCE INDEX bytes (the
   *  tokenized projection of its corpus), never a re-tokenize. At
   *  100 TB this is the difference between unifying two regional
   *  crawl indexes overnight and re-indexing a region.
   *
   *  Contract: the two instances index DISJOINT doc_id spaces — the
   *  same contract two shards of one index already live under (df/nd/
   *  tl sums and posting concat are only meaningful then).
   *
   *  Exactly-once COMPOSES across the merge: the source's `#txn:`
   *  delivery keys ride into the destination's commit log, so a shard
   *  redelivered to the MERGED index is still rejected; conversely the
   *  merge REFUSES a source that shares any delivery key with the
   *  destination (those docs are already here — folding them would
   *  double-count df/nd/tl and duplicate postings). The merge itself
   *  may carry its own `key`, making a redelivered merge a loud no-op
   *  too. The source is read-only throughout — on any failure the
   *  destination's staging is dropped and BOTH indexes stand.
   */
  def mergeFrom(
      spark: SparkSession, dstDir: String, srcDir: String,
      key: Option[String] = None): Unit = {
    val cl = clog(dstDir)
    val (srcV, srcLive) = clog(srcDir).latest(spark)
    val srcShards = srcLive.filter(_.startsWith("c-"))
    require(!srcLive.exists(_.startsWith("t-")),
      s"source index $srcDir has live tombstones — fully compact it " +
        "first (a merge folds shard legs by concatenation and cannot " +
        "carry another index's pending deletions)")
    // + the snapshot-identity marker: keyless sources re-merged twice
    // must refuse too (graft.store.CommitLog.sourceIdentity)
    val srcTxn = srcLive.filter(_.startsWith("#txn:")) :+
      graft.store.CommitLog.sourceIdentity(srcV, srcLive)
    require(srcShards.nonEmpty, s"nothing to merge: $srcDir has no live shards")
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad delivery key: $k")
      "#txn:" + k
    }
    val dstNow = cl.latest(spark)._2.toSet
    (srcTxn ++ txn).foreach { t =>
      require(!dstNow.contains(t),
        s"merge of $srcDir into $dstDir rejected: delivery key " +
          s"${t.stripPrefix("#txn:")} already lives in the destination — " +
          "its shard is already folded here (merging again would " +
          "double-count df/nd/tl)")
    }
    // a missing live dir proves the source snapshot went stale under a
    // concurrent source-side compact+vacuum — abort before staging, the
    // strict-snapshot discipline of ivfIndexRebuildFrom
    val conf = spark.sessionState.newHadoopConf()
    srcShards.foreach { d =>
      val hp = new org.apache.hadoop.fs.Path(s"$srcDir/data/$d")
      require(hp.getFileSystem(conf).exists(hp),
        s"source commit $d vanished mid-merge (concurrent vacuum?) — " +
          "re-read the source and retry")
    }
    val name = s"c-${java.util.UUID.randomUUID().toString.take(12)}"
    foldLegs(spark,
      srcShards.map(d => (s"$srcDir/data/$d", Seq.empty[String])),
      s"$dstDir/data/$name")
    val published = cl.commit(spark) { now =>
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
  }

  /** ZERO-COPY BRANCH of the index as of a published version — the
   *  same shallow clone the store offers (CommitLog.cloneAsOf): data
   *  files hard-link, the as-of live set (delivery keys included)
   *  becomes the branch's first version, and the two indexes diverge
   *  independently from there — experiment with a different
   *  compaction policy, df cap, or shard mix on a branch of a corpus-
   *  scale index without copying a byte. A shard folded before the
   *  branch point still rejects redelivery on the branch; one
   *  ingested only after it lands normally.
   */
  def cloneAsOf(
      spark: SparkSession, srcDir: String, dstDir: String,
      version: Long): Unit =
    clog(srcDir).cloneAsOf(
      spark, s"$srcDir/data", s"$dstDir/data", clog(dstDir), version)

  /** Reclaim data dirs no longer referenced by the LATEST version
   *  (superseded by compaction). Run once in-flight readers of older
   *  snapshots drain — after vacuum, an as-of read of a superseded
   *  version fails loudly at the existence filter, never silently
   *  partially.
   */
  /** Bound the MANIFEST history alone (CommitLog.vacuumVersions):
   *  version files only — the live set, data dirs, and delivery keys
   *  are untouched, so this is safe to run CONTINUOUSLY (the
   *  streaming maintainer calls it per batch when asked; data-dir
   *  vacuum stays a separate, explicitly-scheduled action because it
   *  races in-flight readers of superseded snapshots).
   */
  def vacuumManifest(spark: SparkSession, dir: String, keep: Int): Unit =
    clog(dir).vacuumVersions(spark, keep)

  def vacuum(spark: SparkSession, dir: String,
      keepVersions: Int = Int.MaxValue): Unit = {
    val live = clog(dir).latest(spark)._2.toSet
    val dd = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = dd.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dd)) return
    fs.listStatus(dd)
      .filter(st => !live.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true): Unit)
    // bound the MANIFEST history too (CommitLog.vacuumVersions)
    if (keepVersions != Int.MaxValue)
      clog(dir).vacuumVersions(spark, keepVersions)
  }
}
