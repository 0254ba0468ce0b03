package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Fidelity

/**
 * Manifest-committed, merge-on-read variant of the rollup table — the
 * "beyond dynamic overwrite" commit path SCALE.md promises for
 * sustained high-cardinality ingest (and the round-3 audit's one
 * remaining driver-side scale concern with `Tables.mergeRollups`).
 *
 * The idea is the Delta/Iceberg commit protocol reduced to what this
 * table needs (same shape as the reference's one-file-at-a-time agg
 * rewrite, src/index.py:521-550, lifted to atomic snapshots):
 *
 *  - every ingest APPENDS its per-level partial aggregates as new
 *    parquet files under an immutable commit directory — no read, no
 *    merge shuffle, no rewrite of existing data on the write path;
 *  - visibility is ONE atomic manifest rename: `_manifests/v<N>` lists
 *    the live commit dirs; writers race on rename-if-absent and the
 *    loser re-reads and retries (optimistic concurrency). Commit cost
 *    is O(1) in partition count, series cardinality, and table size —
 *    the property dynamic partition overwrite (driver-serial dir
 *    moves) fundamentally lacks;
 *  - readers resolve the latest manifest and fold the rollup monoid
 *    (min/max/sum/cnt) across live commits at read time — merge-ON-READ;
 *  - COMPACTION bounds read amplification: fold all live commits into
 *    one and swap the manifest atomically; `vacuum` deletes unreferenced
 *    dirs afterwards. LSM semantics: ingest latency trades against a
 *    bounded number of overlapping commits.
 *
 * Physical layout per commit: files partitioned by `fidelity` only
 * (the leading query predicate → manifest-level pruning); `ds_b` and
 * `part_s` stay as SORTED data columns, so series/time predicates skip
 * row groups via parquet min/max stats instead of needing directories.
 * That keeps a commit at a handful of files — what makes the rename
 * protocol cheap — while preserving the same pruning the partitioned
 * table gets from its directory tree.
 *
 * Atomicity relies on create-no-overwrite of the version file: atomic
 * on HDFS, a conditional PUT on S3 (the same caveat every
 * manifest-based table format carries), and check-then-create on a
 * POSIX local FS — not perfectly atomic there, but it FAILS LOUDLY on
 * a lost race where a rename would silently replace the other
 * writer's manifest.
 *
 * PIN/LEASE CONTRACT (audited round 15): unlike the three persisted
 * indexes, this store's destructive maintenance (compact /
 * compactTiered / compactRawTiered, vacuumManifest, vacuum,
 * expireBefore, forgetDataset) deliberately carries NO replay-pin
 * lease. Consumers are protected by the loud-refusal + resync
 * contract instead: every incremental or historical consumer
 * (cdcBetween / cdcRawBetween, the as-of reads, cloneAsOf) validates
 * its window or snapshot against the manifest and REFUSES with the
 * real cause (compaction boundary, raw rewrite, retention floor)
 * rather than returning partial or guessed data; the documented
 * recovery is a full re-read at the current head and a rebased
 * cursor. This is the right trade HERE because the rollup delta is a
 * commutative monoid fold of the live level — a resync is always
 * exact and can never lose acknowledged state — whereas the indexes'
 * replay splits (membership cuts, per-batch pair reports) are NOT
 * re-derivable after their commits move, which is exactly why those
 * carry the `#pin:` lease and this store does not. The full
 * refusal → resync → resume journey is pinned end-to-end in
 * ManifestStoreSpec ("CDC consumer survives a concurrent
 * compact + vacuum").
 */
object ManifestStore {

  private def tableRoot(root: String) = s"$root/mrollup"
  private def dataDir(root: String) = s"${tableRoot(root)}/data"
  private def manifestDir(root: String) = s"${tableRoot(root)}/_manifests"

  /** Physical file schema, CURRENT (v2) revision: fidelity lives in the
   *  directory name. `sumsq` (Σv² — variance/stddev support) is the v2
   *  addition: v1 commit files simply lack the column and parquet schema
   *  reconciliation reads it as NULL, so old commits need no rewrite.
   *  The merge rule for an evolved column is CONSERVATIVE: a bucket's
   *  folded `sumsq` is non-null iff EVERY contributing commit carries it
   *  — a partial sum over only the v2 contributors would silently claim
   *  a Σv² that excludes v1 rows. The rule is the null-poisoning sum
   *  monoid, so it is associative and compaction preserves it.
   */
  private val physSchema: StructType = StructType(Seq(
    StructField("dataset_id", StringType),
    StructField("part_s", LongType),
    StructField("bucket_s", LongType),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType),
    StructField("sum_v", DoubleType),
    StructField("cnt", LongType),
    StructField("sumsq", DoubleType),
    StructField("ds_b", IntegerType)))

  /** Fields every commit revision carries (the v1 schema): a commit file
   *  is written with exactly the evolvable columns its writer knows,
   *  never null-padded — that is what keeps old readers working and
   *  makes the NULL-on-read reconciliation the single evolution
   *  mechanism rather than one of two.
   */
  private val requiredFields: Set[String] =
    Set("dataset_id", "part_s", "bucket_s", "min_v", "max_v", "sum_v", "cnt", "ds_b")

  /** On-disk schema of an `r-` raw commit dir ([[writeRawCommitDir]]:
   *  raw fields + ds_b as a DATA column, unpartitioned). Passed to
   *  every raw-commit read so Spark skips the footer-inference job the
   *  schemaless `read.parquet` pays per call (Tables.rawDiskSchema's
   *  rationale).
   */
  private val rawCommitSchema: StructType = StructType(
    Tables.rawSchema.fields :+ StructField("ds_b", IntegerType))

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  // the commit protocol itself lives in CommitLog (shared with every
  // other manifest-governed dataset, e.g. the persisted dedup index)
  private def log(root: String) = new CommitLog(manifestDir(root))

  /** Latest snapshot: (version, live commit-dir names); (0, Nil) when
   *  the table has never been written.
   */
  def latest(spark: SparkSession, root: String): (Long, Seq[String]) =
    log(root).latest(spark)

  /** The live commit set AS OF a published version — time travel.
   *  Valid for any version whose commit dirs `vacuum` has not yet
   *  reclaimed (manifest files themselves are never deleted, so the
   *  failure mode is a loud missing-data read, not silent corruption).
   */
  def liveAt(spark: SparkSession, root: String, v: Long): Seq[String] =
    log(root).liveAt(spark, v)

  /** Optimistic-concurrency manifest commit: compute the next live set
   *  from the current one and publish it as the next version with an
   *  atomic create-exclusive (hard-link publish on POSIX — Hadoop's
   *  local create(overwrite=false) checks-then-creates and DID lose a
   *  racing writer's manifest under load; rename-no-replace on HDFS;
   *  a conditional PUT on S3 — see CommitLog.publishExclusive). A
   *  losing writer re-reads and retries. `next` returning None ABORTS
   *  the commit (used by
   *  compaction when its input snapshot was invalidated by a
   *  concurrent compactor — publishing anyway would double-count).
   *  Returns true iff a version was published.
   */
  private def commit(spark: SparkSession, root: String)(
      next: Seq[String] => Option[Seq[String]]): Boolean =
    log(root).commit(spark)(next)

  /** Write a frame as one immutable commit directory (shared by append
   *  and compaction so the physical layout — ds_b derivation, sort,
   *  file caps, level partitioning — cannot drift between the two).
   *  Returns the commit-dir name; the caller still owns the manifest
   *  update that makes it visible.
   */
  private def writeCommitDir(root: String, partials: DataFrame): String = {
    val name = s"c-${UUID.randomUUID().toString.take(12)}"
    val withB = partials.withColumn("ds_b", Tables.dsBucket(col("dataset_id")))
    val present = withB.columns.toSet
    val fields = physSchema.fieldNames.toIndexedSeq
      .filter(f => requiredFields(f) || present(f))
    require(fields.forall(present),
      s"commit partials missing required columns: ${fields.filterNot(present)}")
    withB
      .select((col("fidelity") +: fields.map(col)): _*)
      .repartition(col("fidelity"))
      .sortWithinPartitions(
        col("fidelity"), col("ds_b"), col("part_s"), col("dataset_id"), col("bucket_s"))
      .write
      .mode("errorifexists")
      .option("maxRecordsPerFile", Fidelity.GroupSize)
      .partitionBy("fidelity")
      .parquet(s"${dataDir(root)}/$name")
    name
  }

  /** Append one batch's `allLevelPartials` output as a new immutable
   *  commit. No existing data is read or rewritten; the only
   *  serialization point is the manifest rename. The repartition on
   *  `fidelity` bounds the commit to ~one file per level at local
   *  scale (add `ds_b` to the repartition on a cluster for write
   *  parallelism — the manifest protocol is indifferent to file count).
   */
  def appendPartials(spark: SparkSession, root: String, partials: DataFrame): Unit = {
    val name = writeCommitDir(root, partials)
    commit(spark, root)(live => Some(live :+ name)): Unit
  }

  /** Manifest entries starting with this prefix are application-level
   *  TRANSACTION KEYS, not commit dirs: `#txn:<key>` lines ride the
   *  same atomically-published version file as the data they guard and
   *  are PRESERVED by compaction (Delta's txn/appId-version idea
   *  reduced to this table) — so the duplicate check can never race or
   *  be garbage-collected away from a redelivery.
   */
  private val TxnPrefix = "#txn:"

  /** Txn keys preserved across a compaction (most recent first to go
   *  is oldest): bounds manifest growth under a perpetual stream while
   *  keeping the duplicate-check window orders of magnitude wider than
   *  any real redelivery window (~1 micro-batch).
   */
  val MaxTxnKeys: Int = 1024

  /** Typed manifest entries: `c-` rollup-partial commits, `r-` raw
   *  commits (see [[ingestBatchAtomic]]), `#txn:` delivery keys. Each
   *  reader selects its own prefix, so a level scan never lists raw
   *  dirs and vice versa.
   */
  private def dirEntries(live: Seq[String]): Seq[String] =
    live.filter(_.startsWith("c-"))

  private def rawDirEntries(live: Seq[String]): Seq[String] =
    live.filter(_.startsWith("r-"))

  /** Idempotent [[appendPartials]] keyed by a caller-supplied delivery
   *  key (e.g. a streaming micro-batch id). If the key was already
   *  published, the staged commit dir is dropped and nothing changes —
   *  foreachBatch redeliveries after a crash between sink-commit and
   *  checkpoint-commit fold in EXACTLY once. Returns true iff this
   *  call published. The key check is part of the manifest's own
   *  optimistic-commit read: no second coordination channel, so there
   *  is no window where the key and the data disagree.
   */
  def appendPartialsIdempotent(
      spark: SparkSession, root: String, partials: DataFrame,
      key: String): Boolean = {
    require(!key.contains('\n') && key.nonEmpty, s"bad txn key: $key")
    val txn = TxnPrefix + key
    val name = writeCommitDir(root, partials)
    val published = commit(spark, root) { live =>
      if (live.contains(txn)) None else Some(live :+ name :+ txn)
    }
    if (!published) {
      val p = new Path(s"${dataDir(root)}/$name")
      fsFor(spark, p).delete(p, true): Unit
    }
    published
  }

  private def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Tables.rollupSchema)

  /** The rollup monoid folded at read time over the given pre-filtered
   *  per-commit frames. `sumsq` (v2) folds under the null-poisoning sum:
   *  non-null iff every contributing row carries it (SQL `sum` would
   *  silently SKIP the v1 contributors' nulls and report a Σv² that
   *  excludes their rows).
   */
  private def mergeOnRead(parts: DataFrame): DataFrame =
    parts
      .groupBy("dataset_id", "bucket_s")
      .agg(
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        sum("sum_v").as("sum_v"),
        sum("cnt").as("cnt"),
        when(count(lit(1)) === count(col("sumsq")), sum(col("sumsq")))
          .as("sumsq"))

  /** Live `fidelity=<level>` leaf dirs for one level (manifest-level
   *  pruning: other levels' files are never listed, let alone read).
   */
  private def levelDirs(spark: SparkSession, root: String, f: Fidelity): Seq[String] = {
    val (_, live) = latest(spark, root)
    dirEntries(live)
      .map(d => s"${dataDir(root)}/$d/fidelity=${Tables.fidelityPart(f)}")
      .filter(StoreFs.exists(spark, _))
  }

  /** Read one level, merged across live commits (S5 equivalent). */
  def readLevel(spark: SparkSession, root: String, f: Fidelity): DataFrame = {
    val dirs = levelDirs(spark, root, f)
    if (dirs.isEmpty) empty(spark)
    else mergeOnRead(spark.read.schema(physSchema).parquet(dirs: _*))
      .select(Tables.rollupSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** [[readLevel]] with the v2 schema exposed: `sumsq` is Σv² for a
   *  bucket when every contributing commit was written by a v2 writer,
   *  NULL when any v1 commit touched the bucket (the conservative
   *  evolution rule — see `physSchema`). Callers derive variance as
   *  `(sumsq - sum_v²/cnt) / cnt` where non-null.
   */
  def readLevelV2(spark: SparkSession, root: String, f: Fidelity): DataFrame = {
    val dirs = levelDirs(spark, root, f)
    if (dirs.isEmpty)
      empty(spark).withColumn("sumsq", lit(null).cast(DoubleType))
    else mergeOnRead(spark.read.schema(physSchema).parquet(dirs: _*))
      .select((Tables.rollupSchema.fieldNames.toIndexedSeq :+ "sumsq").map(col): _*)
  }

  /** Snapshot (time-travel) level read: fold the monoid over the live
   *  set AS OF `version` — the reader sees exactly the table state the
   *  version's writer published, regardless of later commits.
   */
  def readLevelAsOf(
      spark: SparkSession, root: String, f: Fidelity, version: Long): DataFrame = {
    val dirs = asOfLevelDirs(spark, root, f, version)
    if (dirs.isEmpty) empty(spark)
    else mergeOnRead(spark.read.schema(physSchema).parquet(dirs: _*))
      .select(Tables.rollupSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Level read pruned to one series BEFORE the merge fold: the ds_b +
   *  dataset_id equalities ride the within-file sort's row-group stats
   *  (the manifest analog of `Tables.readRollupFor`).
   */
  def readLevelFor(
      spark: SparkSession, root: String, f: Fidelity, datasetId: String): DataFrame = {
    val dirs = levelDirs(spark, root, f)
    if (dirs.isEmpty) empty(spark)
    else mergeOnRead(
      spark.read.schema(physSchema).parquet(dirs: _*)
        .where(col("ds_b") === Tables.dsBucket(lit(datasetId)) &&
          col("dataset_id") === datasetId))
      .select(Tables.rollupSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Range read for chart queries: series + bucket predicates apply
   *  BELOW the merge fold (a post-fold filter would aggregate the whole
   *  table to serve one chart). `part_s` and `bucket_s` ride the
   *  within-file sort's row-group stats; the fold then touches only the
   *  surviving buckets. This is the manifest-store leg of
   *  `RangeQuery.agg`.
   */
  def readLevelRange(
      spark: SparkSession, root: String, f: Fidelity,
      datasetId: String, startS: Long, endS: Long): DataFrame =
    readLevelRangeDirs(spark, levelDirs(spark, root, f), f,
      datasetId, startS, endS)

  /** [[readLevelRange]] AS OF a published version: the chart-serving
   *  read against a frozen snapshot — same double pruning (series
   *  bucket + part/bucket bounds below the merge fold), dirs resolved
   *  from the version's live set. Paired with [[readRawAsOf]] this
   *  serves a whole dashboard from one consistent instant.
   */
  def readLevelRangeAsOf(
      spark: SparkSession, root: String, f: Fidelity,
      datasetId: String, startS: Long, endS: Long, version: Long): DataFrame =
    readLevelRangeDirs(spark, asOfLevelDirs(spark, root, f, version), f,
      datasetId, startS, endS)

  /** Level leaf dirs for a SNAPSHOT read. The leaf (`fidelity=`) filter
   *  is legitimate — a commit only writes the levels it touched — but
   *  the PARENT `c-` commit dir must still exist: an absent one means
   *  vacuum reclaimed it after a compaction superseded this version,
   *  and silently skipping it would serve a partial snapshot. Fail
   *  loudly instead (mirrors [[requireRawDirs]] on the raw tier).
   */
  private def asOfLevelDirs(
      spark: SparkSession, root: String, f: Fidelity,
      version: Long): Seq[String] = {
    val entries = dirEntries(liveAt(spark, root, version))
    val missing = entries
      .filterNot(d => StoreFs.exists(spark, s"${dataDir(root)}/$d"))
    require(missing.isEmpty,
      s"commit dir(s) ${missing.mkString(", ")} referenced by version " +
        s"$version at $root no longer exist (vacuumed after a rewrite); " +
        "this snapshot is unreadable — refusing to return partial data")
    entries
      .map(d => s"${dataDir(root)}/$d/fidelity=${Tables.fidelityPart(f)}")
      .filter(StoreFs.exists(spark, _))
  }

  private def readLevelRangeDirs(
      spark: SparkSession, dirs: Seq[String], f: Fidelity,
      datasetId: String, startS: Long, endS: Long): DataFrame =
    if (dirs.isEmpty) empty(spark)
    else {
      val w = Tables.partitionWindowS(f)
      mergeOnRead(
        spark.read.schema(physSchema).parquet(dirs: _*)
          .where(col("ds_b") === Tables.dsBucket(lit(datasetId)) &&
            col("dataset_id") === datasetId &&
            col("part_s").between(startS / w * w, endS / w * w) &&
            col("bucket_s").between(startS, endS)))
        .select(Tables.rollupSchema.fieldNames.map(col).toIndexedSeq: _*)
    }

  private val cdcSchema: StructType = StructType(Seq(
    StructField("dataset_id", StringType),
    StructField("bucket_s", LongType),
    StructField("op", StringType),
    StructField("old_min_v", DoubleType),
    StructField("old_max_v", DoubleType),
    StructField("old_sum_v", DoubleType),
    StructField("old_cnt", LongType),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType),
    StructField("sum_v", DoubleType),
    StructField("cnt", LongType)))

  /** Change-data feed for one level between two published versions:
   *  every (dataset_id, bucket_s) whose aggregate changed in
   *  (fromV, toV], with the OLD and NEW aggregate values and the change
   *  kind (`insert` for buckets born inside the window, `update`
   *  otherwise) — the incremental-consumption read every downstream
   *  materialization (cache refresh, alert re-evaluation, export sync)
   *  wants instead of a full-table diff.
   *
   *  Scale shape: cost ∝ the DELTA, never the table. Only commit dirs
   *  ADDED inside the window are read and folded; the old state is read
   *  from the `fromV` snapshot pruned twice — a driver-computed
   *  (ds_b, part_s) bounding box from the tiny folded delta pushed into
   *  the scan (riding the within-file sort's row-group stats), then an
   *  exact left-semi join on the changed keys above it. Requires
   *  append-only history across the window: a compaction rewrites the
   *  live set and makes "what changed" underivable from the manifest
   *  alone, so that case fails loudly rather than guessing. Rollup
   *  deltas are pure monoid appends — `cnt` strictly grows — so every
   *  delta key IS a change; no value-compare against the old state is
   *  needed.
   */
  def cdcBetween(
      spark: SparkSession, root: String, f: Fidelity,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"cdcBetween: fromV $fromV > toV $toV")
    // the append-only requirement binds on the PARTIAL (`c-`) entries
    // the feed derives from — raw-tier folds and txn-key trims in the
    // window don't affect what changed on a level
    val before = if (fromV == 0L) Seq.empty
      else dirEntries(liveAt(spark, root, fromV))
    val after = dirEntries(liveAt(spark, root, toV))
    val beforeSet = before.toSet
    require(before.forall(after.contains),
      s"CDC window ($fromV, $toV] at $root crosses a compaction/vacuum " +
        "boundary: the old live set is not a subset of the new one, so " +
        "the window's net change is not derivable from the manifest alone")
    val level = s"fidelity=${Tables.fidelityPart(f)}"
    val addedDirs = dirEntries(after.filterNot(beforeSet))
      .map(d => s"${dataDir(root)}/$d/$level")
      .filter(StoreFs.exists(spark, _))
    if (addedDirs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cdcSchema)
    val deltaRaw = spark.read.schema(physSchema).parquet(addedDirs: _*)
    val delta = mergeOnRead(deltaRaw)
    // driver-side bounding box of the delta (4 scalars off the small
    // delta scan, never a key list) → row-group pruning on the old scan
    val bb = deltaRaw.agg(
      min("ds_b"), max("ds_b"), min("part_s"), max("part_s")).head()
    val beforeDirs = dirEntries(before)
      .map(d => s"${dataDir(root)}/$d/$level")
      .filter(StoreFs.exists(spark, _))
    val old =
      if (beforeDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], physSchema)
          .drop("part_s", "ds_b")
      else mergeOnRead(
        spark.read.schema(physSchema).parquet(beforeDirs: _*)
          .where(col("ds_b").between(bb.getInt(0), bb.getInt(1)) &&
            col("part_s").between(bb.getLong(2), bb.getLong(3))))
    val oldK = old
      .join(delta.select("dataset_id", "bucket_s"),
        Seq("dataset_id", "bucket_s"), "left_semi")
      .select(
        col("dataset_id"), col("bucket_s"),
        col("min_v").as("old_min_v"), col("max_v").as("old_max_v"),
        col("sum_v").as("old_sum_v"), col("cnt").as("old_cnt"))
    delta
      .join(oldK, Seq("dataset_id", "bucket_s"), "left")
      .select(
        col("dataset_id"), col("bucket_s"),
        when(col("old_cnt").isNull, "insert").otherwise("update").as("op"),
        col("old_min_v"), col("old_max_v"), col("old_sum_v"), col("old_cnt"),
        when(col("old_cnt").isNull, col("min_v"))
          .otherwise(least(col("min_v"), col("old_min_v"))).as("min_v"),
        when(col("old_cnt").isNull, col("max_v"))
          .otherwise(greatest(col("max_v"), col("old_max_v"))).as("max_v"),
        (col("sum_v") + coalesce(col("old_sum_v"), lit(0.0))).as("sum_v"),
        (col("cnt") + coalesce(col("old_cnt"), lit(0L))).as("cnt"))
  }

  /** Raw-tier change feed: the raw rows ADDED in (fromV, toV] — the
   *  replication/export primitive (ship every new row downstream
   *  without diffing tables). Raw commits are immutable and the raw
   *  live set is append-only between rewrites (compactRawTiered /
   *  forgetDataset / expireBefore), so the delta IS the added `r-`
   *  dirs — no old-state join at all, cost ∝ the delta. A window
   *  crossing a rewrite fails loudly, exactly like the partials feed.
   */
  def cdcRawBetween(
      spark: SparkSession, root: String, fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"cdcRawBetween: fromV $fromV > toV $toV")
    val before = if (fromV == 0L) Seq.empty[String]
      else rawDirEntries(liveAt(spark, root, fromV))
    val after = rawDirEntries(liveAt(spark, root, toV))
    require(before.forall(after.contains),
      s"raw CDC window ($fromV, $toV] at $root crosses a raw rewrite " +
        "(compaction/forget/expiry): the added-dirs delta is not the " +
        "net change there")
    readRawDirs(spark, after.filterNot(before.toSet), root)
  }

  /** Fold ALL live commits into one and swap the manifest atomically.
   *  Readers see either the old set or the compacted one, never both.
   *  Commits that land AFTER this compaction's snapshot was read are
   *  preserved by the functional manifest update; if the snapshot
   *  itself was invalidated (a CONCURRENT compactor already folded —
   *  and thus duplicated — some of our inputs), the commit ABORTS and
   *  this compaction's output dir is dropped: publishing both folds
   *  would double-count every cell they share. Aborting only loses
   *  optimization work, never data.
   *
   *  A full fold rewrites the whole table — right for an explicit
   *  "optimize" call, WRONG as the steady-state policy under sustained
   *  ingest (N batches would write O(N²) bytes total). The auto paths
   *  use [[compactTiered]].
   */
  def compact(spark: SparkSession, root: String): Unit =
    compactTiered(spark, root, fanIn = Int.MaxValue)

  /** SIZE-TIERED compaction (the LSM policy): fold only the `fanIn`
   *  SMALLEST live commits into one, leaving large, already-compacted
   *  commits untouched. Under sustained ingest each trigger folds the
   *  fresh small tier — so a commit's bytes are rewritten only when it
   *  is among the smallest, i.e. O(log N)-ish times over its life
   *  instead of every trigger, which is what bounds write
   *  amplification at 100 TB (the full fold rewrites the ENTIRE table
   *  per trigger: O(N²) total bytes over N batches). Same atomicity,
   *  txn-key preservation, and concurrent-compactor abort as
   *  [[compact]]; the fold is the same associative monoid, so
   *  read-time answers are unchanged by WHICH commits folded.
   */
  /** Size-tiered selection: the `fanIn` smallest of `entries` by commit
   *  dir length — one driver-side listing per live commit, no data
   *  read. Returns everything when `fanIn` covers the set.
   */
  private def pickSmallest(
      spark: SparkSession, root: String,
      entries: Seq[String], fanIn: Int): Seq[String] =
    if (fanIn >= entries.size) entries
    else {
      val sized = entries.map { d =>
        val p = new Path(s"${dataDir(root)}/$d")
        val fs = fsFor(spark, p)
        val len = if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
        (d, len)
      }
      sized.sortBy(_._2).take(math.max(2, fanIn)).map(_._1)
    }

  /** The raw (`r-`) leg of the size-tiered policy: concatenate the
   *  `fanIn` smallest raw commits into one re-sorted dir and swap the
   *  manifest — bounds both write amplification and the small-files
   *  problem on raw scans (thousands of micro-batch commits would
   *  otherwise each keep ≥ 1 file forever). No monoid here: raw rows
   *  concatenate, and [[writeRawCommitDir]] restores the
   *  (ds_b, dataset_id, ts) clustering row-group pruning rides. Same
   *  concurrent-compactor abort as the partial fold.
   */
  def compactRawTiered(spark: SparkSession, root: String, fanIn: Int = 8): Unit = {
    val (_, live) = latest(spark, root)
    val dirs = pickSmallest(spark, root, rawDirEntries(live), fanIn)
    if (dirs.size <= 1) return
    val merged = spark.read
      .parquet(dirs.map(d => s"${dataDir(root)}/$d"): _*)
      .select("dataset_id", "ts_us", "value")
    val name = writeRawCommitDir(root, merged)
    val published = commit(spark, root) { now =>
      if (dirs.forall(now.contains)) Some(now.filterNot(dirs.contains) :+ name)
      else None
    }
    if (!published) {
      val p = new Path(s"${dataDir(root)}/$name")
      fsFor(spark, p).delete(p, true): Unit
    }
  }

  def compactTiered(spark: SparkSession, root: String, fanIn: Int = 8): Unit = {
    val (_, live) = latest(spark, root)
    // fold DATA commits only; `#txn:` key lines survive every
    // compaction untouched (that permanence is what makes the
    // idempotent append's duplicate check durable)
    val all = dirEntries(live)
    if (all.size <= 1) return
    val dirs = pickSmallest(spark, root, all, fanIn)
    if (dirs.size <= 1) return
    val full = StructType(physSchema.fields :+ StructField("fidelity", StringType))
    val merged = dirs
      .map(d => spark.read.schema(full)
        .option("basePath", s"${dataDir(root)}/$d")
        .parquet(s"${dataDir(root)}/$d"))
      .reduce(_.unionByName(_))
      .groupBy("fidelity", "dataset_id", "part_s", "bucket_s")
      .agg(
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        sum("sum_v").as("sum_v"),
        sum("cnt").as("cnt"),
        // null-poisoning fold (see mergeOnRead): a compacted bucket any
        // v1 commit touched stays null, so read-time and compacted
        // answers agree — the fold is associative
        when(count(lit(1)) === count(col("sumsq")), sum(col("sumsq")))
          .as("sumsq"))
    val name = writeCommitDir(root, merged)
    val published = commit(spark, root) { now =>
      if (dirs.forall(now.contains)) {
        // trim the txn-key tail so the manifest stays bounded under a
        // perpetual stream: exactly-once is guaranteed for
        // redeliveries within the last MaxTxnKeys batches (streaming
        // redelivery windows are ~1 batch)
        val kept = now.filterNot(dirs.contains)
        val (txns, rest) = kept.partition(_.startsWith(TxnPrefix))
        Some(rest :+ name :++ txns.takeRight(MaxTxnKeys))
      }
      else None // inputs already folded elsewhere — abort, don't double
    }
    if (!published) {
      val p = new Path(s"${dataDir(root)}/$name")
      fsFor(spark, p).delete(p, true): Unit
    }
  }

  /** ZERO-COPY BRANCH: clone the dataset AS OF a published version
   *  into a fresh root — the lakehouse shallow-clone, composed with
   *  time travel. Every data file of the version's live commits
   *  HARD-LINKS into the new root: bytes are shared, names are
   *  independent, and since store files are immutable once written
   *  (every mutation adds or unlinks whole files, never appends in
   *  place) neither side's compaction / vacuum / forget can ever
   *  reach the other through a shared inode. The branch is born with
   *  ONE manifest version listing exactly the as-of live set —
   *  `#txn:` keys included, so a batch the source had folded by
   *  `version` is still rejected if redelivered to the BRANCH, while
   *  a batch folded only AFTER the branch point ingests normally
   *  (the branch genuinely diverges). Cost ∝ live file COUNT, zero
   *  bytes moved — a dev branch of a 100 TB store in seconds. On a
   *  filesystem without hard links through the Hadoop API the files
   *  COPY instead: same semantics, storage-proportional cost.
   *
   *  Loud failures: an unpublished `version`, a live commit already
   *  vacuumed away (the as-of read discipline), or a non-empty
   *  destination (branching into an existing dataset would silently
   *  interleave two histories).
   */
  def cloneAsOf(
      spark: SparkSession, srcRoot: String, dstRoot: String,
      version: Long): Unit =
    // the generic commit-log clone (shared with the index branches)
    log(srcRoot).cloneAsOf(
      spark, dataDir(srcRoot), dataDir(dstRoot), log(dstRoot), version)

  /** FEDERATED MERGE: fold ANOTHER store instance's live raw and
   *  rollup state into this one under ONE manifest version — the
   *  operation that unifies stores built independently (per-region
   *  ingest pipelines, a backfill job's private store) without
   *  replaying a single batch. The source's rollup PARTIALS
   *  concatenate into one staged commit (the merge-on-read monoid
   *  makes that equivalent to every source commit individually —
   *  same-series buckets from both stores fold correctly at read
   *  time, so DISJOINT key spaces are NOT required), its raw rows
   *  restage through [[writeRawCommitDir]] (preserving the
   *  ds_b/dataset_id/ts clustering row-group pruning rides), and the
   *  single version-file create publishes both — a reader sees none
   *  of the source or all of it, raw and rollups agreeing exactly.
   *
   *  Exactly-once COMPOSES across the merge: the source's `#txn:`
   *  keys ride into the destination's manifest (a batch redelivered
   *  to the merged store is still rejected), and a source sharing any
   *  delivery key with the destination is REFUSED — that key means
   *  the same upstream batch was ingested on both sides, and folding
   *  it twice would double-count. The merge may carry its own `key`.
   *  The source is read-only throughout; a lost race drops the
   *  staging and fails loudly, both stores standing.
   */
  def mergeFrom(
      spark: SparkSession, dstRoot: String, srcRoot: String,
      key: Option[String] = None): Unit = {
    val (srcV, srcLive) = latest(spark, srcRoot)
    val srcC = dirEntries(srcLive)
    val srcR = rawDirEntries(srcLive)
    val srcTxn = srcLive.filter(_.startsWith(TxnPrefix)) :+
      CommitLog.sourceIdentity(srcV, srcLive)
    require(srcC.nonEmpty || srcR.nonEmpty,
      s"nothing to merge: $srcRoot has no live commits")
    val txn = key.map { k =>
      require(k.nonEmpty && !k.contains('\n'), s"bad txn key: $k")
      TxnPrefix + k
    }
    val dstNow = latest(spark, dstRoot)._2
    (srcTxn ++ txn).foreach { t =>
      require(!dstNow.contains(t),
        s"merge of $srcRoot into $dstRoot rejected: delivery key " +
          s"${t.stripPrefix(TxnPrefix)} already lives in the destination " +
          "— its batch is already folded here (merging again would " +
          "double-count it)")
    }
    (srcC ++ srcR).foreach { d =>
      val p = new Path(s"${dataDir(srcRoot)}/$d")
      require(fsFor(spark, p).exists(p),
        s"source commit $d vanished mid-merge (concurrent vacuum?) — " +
          "re-read the source and retry")
    }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val full = StructType(physSchema.fields :+ StructField("fidelity", StringType))
    val writes = Seq(
      if (srcC.isEmpty) Future.successful(None)
      else Future(Some(writeCommitDir(dstRoot,
        // plain concat of the source's partials: v1 commits read sumsq
        // NULL here and the null lands in the staged rows, which the
        // null-poisoning fold treats exactly like the absent column
        srcC.map(d => spark.read.schema(full)
            .option("basePath", s"${dataDir(srcRoot)}/$d")
            .parquet(s"${dataDir(srcRoot)}/$d"))
          .reduce(_.unionByName(_))))),
      if (srcR.isEmpty) Future.successful(None)
      else Future(Some(writeRawCommitDir(dstRoot,
        spark.read
          .parquet(srcR.map(d => s"${dataDir(srcRoot)}/$d"): _*)
          .select("dataset_id", "ts_us", "value")))))
    val names = Await.result(Future.sequence(writes), Duration.Inf).flatten
    val published = commit(spark, dstRoot) { now =>
      if ((srcTxn ++ txn).exists(now.contains)) None // raced duplicate
      else Some(now :++ names :++ srcTxn :++ txn.toSeq)
    }
    if (!published) {
      dropStaged(spark, dstRoot, names)
      require(published,
        s"merge of $srcRoot into $dstRoot raced a concurrent writer " +
          "that committed one of its delivery keys — this attempt's " +
          "staging was dropped")
    }
  }

  /** Right-to-be-forgotten on the atomic store: rewrite every live
   *  commit that CONTAINS the series without it and swap the manifest
   *  ONCE — readers resolve the pre-delete or post-delete table, never
   *  a partial delete (the partitioned-store `Tables.forgetDataset`
   *  cannot make that claim across its per-partition rewrites). Cost ∝
   *  commits actually containing the series: the containment probe is
   *  a ds_b/dataset_id-pruned scan riding each commit's row-group
   *  stats, untouched commits keep their dirs byte-for-byte (no write
   *  amplification), and a commit left EMPTY by the delete simply
   *  drops out of the manifest. Replaced dirs stay on disk for
   *  time-travel readers until `vacuum` reclaims them — so the
   *  compliance clock for physical erasure is the caller's vacuum
   *  schedule, and `readRawAsOf`/`readLevelAsOf` of old versions fail
   *  loudly (missing dirs) after it runs, never silently resurrect.
   */
  def forgetDataset(spark: SparkSession, root: String, datasetId: String): Unit = {
    val hit = col("ds_b") === Tables.dsBucket(lit(datasetId)) &&
      col("dataset_id") === datasetId
    rewriteLive(spark, root, partialsHit = hit, rawHit = hit,
      what = s"forgetDataset($datasetId)")
  }

  /** Time-based retention on the atomic store: delete every bucket
   *  strictly BEFORE `cutoffS` from both tables in one manifest swap.
   *  Exact at any cutoff aligned to the coarsest level (100000 s —
   *  every finer width divides it), which the partitioned store's
   *  directory-grain expiry cannot be: it must keep whole straddling
   *  partitions. Same rewrite machinery as [[forgetDataset]]: commits
   *  wholly before the cutoff drop out of the manifest with NO data
   *  read beyond the containment probe, straddlers rewrite once.
   */
  def expireBefore(spark: SparkSession, root: String, cutoffS: Long): Unit = {
    require(cutoffS % 100000L == 0,
      s"cutoff $cutoffS must align to the coarsest level (100000 s) so " +
        "every rollup level's buckets split exactly")
    rewriteLive(spark, root,
      partialsHit = col("bucket_s") < cutoffS,
      rawHit = col("ts_us") < cutoffS * 1000000L,
      what = s"expireBefore($cutoffS)")
  }

  /** Shared delete machinery: rewrite every live commit containing a
   *  `hit` row without those rows and publish ONE new version; commits
   *  left empty drop, untouched commits keep their dirs. Aborts (and
   *  cleans its output) if the live set moved underneath.
   */
  private def rewriteLive(
      spark: SparkSession, root: String,
      partialsHit: org.apache.spark.sql.Column,
      rawHit: org.apache.spark.sql.Column,
      what: String): Unit = {
    val (_, live) = latest(spark, root)
    val fullC = StructType(physSchema.fields :+ StructField("fidelity", StringType))
    // old entry -> replacement (None = commit becomes empty, drop it)
    val replaced = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    for (d <- dirEntries(live) ++ rawDirEntries(live)) {
      val path = s"${dataDir(root)}/$d"
      if (StoreFs.exists(spark, path)) {
        val isPartials = d.startsWith("c-")
        val hit = if (isPartials) partialsHit else rawHit
        val df =
          if (isPartials)
            spark.read.schema(fullC).option("basePath", path).parquet(path)
          else spark.read.schema(rawCommitSchema).parquet(path)
        if (!df.where(hit).isEmpty) {
          val survivors = df.where(!hit)
          replaced(d) =
            if (survivors.isEmpty) None
            else if (isPartials)
              Some(writeCommitDir(root, survivors.drop("ds_b")))
            else
              Some(writeRawCommitDir(
                root, survivors.select("dataset_id", "ts_us", "value")))
        }
      }
    }
    if (replaced.isEmpty) return
    val published = commit(spark, root) { now =>
      if (replaced.keys.forall(now.contains))
        Some(now.flatMap(e => replaced.get(e).getOrElse(Some(e))))
      else None // live set moved under us — abort, caller retries
    }
    if (!published) {
      for (n <- replaced.values.flatten) {
        val p = new Path(s"${dataDir(root)}/$n")
        fsFor(spark, p).delete(p, true): Unit
      }
      throw new IllegalStateException(
        s"$what lost the manifest race at $root — rerun against the new live set")
    }
  }

  /** Delete data dirs no manifest-visible snapshot references and older
   *  than `minAgeMs`. The age floor is what makes GC safe against (a)
   *  writers that have WRITTEN a commit dir but not yet published its
   *  manifest entry, and (b) readers still resolving a superseded
   *  snapshot — both live in a bounded window, so production callers
   *  keep a retention (the auto-path uses VacuumRetentionMs, the
   *  Delta/Iceberg pattern); `minAgeMs = 0` is for explicit cleanup
   *  once a caller knows everything has drained.
   */
  /** Bound the MANIFEST history alone (CommitLog.vacuumVersions):
   *  version files only — live set, data dirs, and delivery keys are
   *  untouched, so this is safe to run CONTINUOUSLY (the streaming
   *  ingest maintainers call it per batch when asked; data-dir vacuum
   *  stays a separate, explicitly-scheduled action because it races
   *  in-flight readers of superseded snapshots).
   */
  def vacuumManifest(spark: SparkSession, root: String, keep: Int): Unit =
    log(root).vacuumVersions(spark, keep)

  def vacuum(spark: SparkSession, root: String, minAgeMs: Long = 0L,
      keepVersions: Int = Int.MaxValue): Unit = {
    val (_, live) = latest(spark, root)
    val dd = new Path(dataDir(root))
    val fs = fsFor(spark, dd)
    if (!fs.exists(dd)) return
    val cutoff = System.currentTimeMillis() - minAgeMs
    fs.listStatus(dd)
      .filter(st => !live.contains(st.getPath.getName) &&
        st.getModificationTime <= cutoff)
      .foreach(st => fs.delete(st.getPath, true): Unit)
    // MANIFEST retention (CommitLog.vacuumVersions): the version files
    // themselves accrue one per commit forever — a streaming maintainer
    // at one commit per 10 s is ~8.6k/day — and only matter for
    // time-travel/branch, so a production deployment bounds them here;
    // reads below the floor fail loudly naming retention
    if (keepVersions != Int.MaxValue)
      log(root).vacuumVersions(spark, keepVersions)
  }

  /** Retention the auto compact+vacuum path leaves for in-flight
   *  writers/readers of superseded snapshots (see `vacuum`).
   */
  val VacuumRetentionMs: Long = 15L * 60L * 1000L

  /** Raw rows as one immutable `r-` commit dir: ds_b-bucketed and
   *  (dataset_id, ts)-sorted so series/time predicates ride row-group
   *  stats; the manifest version plays the time-window role the
   *  partitioned raw table gets from `win_s` directories.
   */
  private def writeRawCommitDir(root: String, batch: DataFrame): String = {
    val name = s"r-${UUID.randomUUID().toString.take(12)}"
    batch
      .withColumn("ds_b", Tables.dsBucket(col("dataset_id")))
      .repartition(col("ds_b"))
      .sortWithinPartitions(col("ds_b"), col("dataset_id"), col("ts_us"))
      .write
      .mode("errorifexists")
      .option("maxRecordsPerFile", graft.model.Fidelity.GroupSize)
      .parquet(s"${dataDir(root)}/$name")
    name
  }

  /** ATOMIC MULTI-TABLE ingest: the batch's raw rows AND its all-level
   *  rollup partials become visible in ONE manifest version — a reader
   *  resolving any snapshot sees a raw table and a rollup pyramid that
   *  agree exactly, and a crash anywhere before the version publish
   *  leaves only orphan dirs that `vacuum` reclaims (the plain
   *  [[ingestBatch]] writes the two tables as independent appends, so a
   *  crash between them publishes a raw/rollup disagreement). The two
   *  commit dirs write concurrently — the serialization point is still
   *  the single version-file create. An optional delivery `key` makes
   *  the whole two-table publish idempotent exactly like
   *  [[appendPartialsIdempotent]]. Returns true iff this call
   *  published (false: duplicate key or empty batch).
   */
  def ingestBatchAtomic(
      spark: SparkSession, root: String, batchLong: DataFrame,
      key: Option[String] = None, maxLiveCommits: Int = 16): Boolean = {
    require(key.forall(k => k.nonEmpty && !k.contains('\n')),
      s"bad txn key: $key")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val batch = graft.ingest.Melt.sanitize(batchLong).persist()
    try {
      if (batch.isEmpty) return false
      val writes = Seq(
        Future(writeRawCommitDir(root, batch)),
        Future(writeCommitDir(root,
          Tables.allLevelPartials(batch, withSumsq = true))))
      val names = Await.result(Future.sequence(writes), Duration.Inf)
      publishStaged(spark, root, names, key, maxLiveCommits)
    } finally batch.unpersist(): Unit
  }

  /** Publish already-staged commit dirs under one version (shared by
   *  [[ingestBatchAtomic]] and [[ingestBatchAudited]]): the delivery-key
   *  duplicate check rides the commit closure, a lost publish deletes
   *  the staging, a won one runs the tiered-compaction trigger.
   */
  private def publishStaged(
      spark: SparkSession, root: String, names: Seq[String],
      key: Option[String], maxLiveCommits: Int): Boolean = {
    val txn = key.map(TxnPrefix + _)
    val published = commit(spark, root) { live =>
      if (txn.exists(live.contains)) None
      else Some(live :++ names :++ txn.toSeq)
    }
    if (!published) dropStaged(spark, root, names)
    else {
      val liveNow = latest(spark, root)._2
      val fanIn = math.max(2, maxLiveCommits / 2)
      val foldC = liveNow.count(_.startsWith("c-")) > maxLiveCommits
      val foldR = liveNow.count(_.startsWith("r-")) > maxLiveCommits
      if (foldC) compactTiered(spark, root, fanIn)
      if (foldR) compactRawTiered(spark, root, fanIn)
      if (foldC || foldR) vacuum(spark, root, VacuumRetentionMs)
    }
    published
  }

  private def dropStaged(
      spark: SparkSession, root: String, names: Seq[String]): Unit =
    for (d <- names) {
      val p = new Path(s"${dataDir(root)}/$d")
      fsFor(spark, p).delete(p, true): Unit
    }

  /** WRITE-AUDIT-PUBLISH ingest (the lakehouse WAP pattern): stage both
   *  tables' commit dirs exactly as [[ingestBatchAtomic]] would, AUDIT
   *  the STAGED raw data by reading it back through the same schema'd
   *  path readers use (so the audit also catches writer/layout bugs,
   *  not just bad input), and create the version file ONLY if every
   *  expectation holds on every staged row. A failed audit deletes the
   *  staging and leaves the table byte-identical — bad data is never
   *  visible to ANY reader, not even transiently (publish-then-delete
   *  has a window where a dashboard serves the bad batch; the manifest
   *  protocol gives WAP for free because staged dirs are invisible
   *  until the version-file create).
   *
   *  `expectations` are (name, boolean Column over the raw schema); a
   *  row violates one when the predicate is false OR null (SQL
   *  three-valued logic must not smuggle nulls past a gate). All
   *  expectations evaluate in ONE aggregation pass over the staged
   *  batch — cost ∝ batch, never ∝ table. Returns (published, report)
   *  where the report has one (expectation, violations) row per
   *  expectation, in input order.
   */
  /** The four semantically distinct ways a WAP ingest can end —
   *  previously conflated into one `false`: a duplicate delivery is
   *  success-equivalent (the data IS in the table), an empty batch a
   *  no-op, an audit failure a data problem someone must look at.
   */
  sealed trait WapOutcome
  object WapOutcome {
    case object Published extends WapOutcome
    case object DuplicateDelivery extends WapOutcome
    case object EmptyBatch extends WapOutcome
    case object AuditFailed extends WapOutcome
  }

  def ingestBatchAudited(
      spark: SparkSession, root: String, batchLong: DataFrame,
      expectations: Seq[(String, org.apache.spark.sql.Column)],
      key: Option[String] = None, maxLiveCommits: Int = 16): (Boolean, DataFrame) = {
    val (outcome, report) = ingestBatchAuditedOutcome(
      spark, root, batchLong, expectations, key, maxLiveCommits)
    (outcome == WapOutcome.Published, report)
  }

  def ingestBatchAuditedOutcome(
      spark: SparkSession, root: String, batchLong: DataFrame,
      expectations: Seq[(String, org.apache.spark.sql.Column)],
      key: Option[String] = None,
      maxLiveCommits: Int = 16): (WapOutcome, DataFrame) =
    ingestBatchAuditedWith(spark, root, batchLong, expectations, key,
      maxLiveCommits, b => Tables.allLevelPartials(b, withSumsq = true))

  /** [[ingestBatchAuditedOutcome]] with an injectable partials writer —
   *  the seam that lets a spec stage CORRUPTED rollup partials and pin
   *  the conservation audit's rejection (the negative control a
   *  pre-publish gate needs: proof it can actually fail).
   */
  private[graft] def ingestBatchAuditedWith(
      spark: SparkSession, root: String, batchLong: DataFrame,
      expectations: Seq[(String, org.apache.spark.sql.Column)],
      key: Option[String], maxLiveCommits: Int,
      partialsOf: DataFrame => DataFrame): (WapOutcome, DataFrame) = {
    require(expectations.nonEmpty, "ingestBatchAudited without expectations")
    require(key.forall(k => k.nonEmpty && !k.contains('\n')),
      s"bad txn key: $key")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    import spark.implicits._
    val conservationNames = Fidelity.aggLevels
      .map(f => s"rollup_cnt_conservation_${Tables.fidelityPart(f)}")
    def emptyReport = (expectations.map { case (n, _) => (n, 0L) } ++
      conservationNames.map((_, 0L))).toDF("expectation", "violations")
    // cheap up-front rejection: a redelivered batch must not pay the
    // full stage+audit cost before losing to its own key (the same
    // up-front check Dedup/TextIndex make; the in-closure check inside
    // publishStaged still guards the concurrent-redelivery race)
    val txn = key.map(TxnPrefix + _)
    if (txn.exists(latest(spark, root)._2.contains))
      return (WapOutcome.DuplicateDelivery, emptyReport)
    val batch = graft.ingest.Melt.sanitize(batchLong).persist()
    try {
      if (batch.isEmpty) return (WapOutcome.EmptyBatch, emptyReport)
      val writes = Seq(
        Future(writeRawCommitDir(root, batch)),
        Future(writeCommitDir(root, partialsOf(batch))))
      val names = Await.result(Future.sequence(writes), Duration.Inf)
      // audit what readers WOULD see: both STAGED commit dirs through
      // the readers' schema'd paths (so writer/layout bugs are caught
      // too, not just bad input), concurrently:
      //  - raw tier: one aggregation pass, all expectations as
      //    parallel violation counts over the staged raw rows;
      //  - rollup tier: per-level COUNT CONSERVATION — every fidelity's
      //    Σcnt must equal the staged raw row count (the invariant
      //    manifest_history checks post-hoc, moved pre-publish so an
      //    allLevelPartials writer bug never becomes visible data).
      // Cost of both ∝ batch, never ∝ table.
      val rawName = names.find(_.startsWith("r-")).get
      val rollName = names.find(_.startsWith("c-")).get
      val countsF = Future {
        spark.read.schema(rawCommitSchema).parquet(s"${dataDir(root)}/$rawName")
          .select(Tables.rawSchema.fieldNames.map(col).toIndexedSeq: _*)
          .agg(
            count(lit(1)).as("__n"),
            expectations.map { case (n, pred) =>
              sum(when(pred.isNull || !pred, 1L).otherwise(0L)).as(n)
            }: _*).head()
      }
      val perLevelF = Future {
        val full = StructType(
          physSchema.fields :+ StructField("fidelity", StringType))
        spark.read.schema(full)
          .option("basePath", s"${dataDir(root)}/$rollName")
          .parquet(s"${dataDir(root)}/$rollName")
          .groupBy("fidelity").agg(sum(col("cnt")).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val counts = Await.result(countsF, Duration.Inf)
      val perLevel = Await.result(perLevelF, Duration.Inf)
      val nRaw = counts.getLong(0)
      // violations for a conservation row = the absolute row-count
      // discrepancy at that level (an absent level counts all nRaw)
      val conservation = Fidelity.aggLevels.map { f =>
        val part = Tables.fidelityPart(f)
        (s"rollup_cnt_conservation_$part",
          math.abs(perLevel.getOrElse(part, 0L) - nRaw))
      }
      val report = (expectations.zipWithIndex
        .map { case ((n, _), i) => (n, counts.getLong(i + 1)) } ++
        conservation)
        .toDF("expectation", "violations")
      val clean = expectations.indices.forall(i => counts.getLong(i + 1) == 0L) &&
        conservation.forall(_._2 == 0L)
      if (!clean) {
        dropStaged(spark, root, names)
        (WapOutcome.AuditFailed, report)
      } else if (publishStaged(spark, root, names, key, maxLiveCommits))
        (WapOutcome.Published, report)
      else // lost the publish race to a concurrent redelivery of our key
        (WapOutcome.DuplicateDelivery, report)
    } finally batch.unpersist(): Unit
  }

  /** Raw datapoint scan over the atomic store (S4 for manifest roots):
   *  the union of live `r-` commit dirs — exactly the batches whose
   *  version published, never a torn write's orphans.
   */
  def readRaw(spark: SparkSession, root: String): DataFrame =
    readRawDirs(spark, rawDirEntries(latest(spark, root)._2), root)

  /** Snapshot raw read AS OF a published version. Because
   *  [[ingestBatchAtomic]] publishes both tables in one version, the
   *  pair (readRawAsOf, readLevelAsOf) at the SAME version is
   *  mutually consistent — cross-table time travel, which two
   *  independently-versioned tables cannot give.
   */
  def readRawAsOf(spark: SparkSession, root: String, version: Long): DataFrame =
    readRawDirs(spark, rawDirEntries(liveAt(spark, root, version)), root)

  /** Per-series raw read (the FULL-fidelity chart route): the ds_b +
   *  dataset_id equalities ride the commit files' (ds_b, dataset_id,
   *  ts) sort via row-group stats — the manifest analog of
   *  `Tables.readRawFor`'s partition-dir pruning, with the manifest
   *  itself standing in for the directory tree.
   */
  def readRawFor(
      spark: SparkSession, root: String, datasetId: String): DataFrame =
    readRawForDirs(spark, rawDirEntries(latest(spark, root)._2), root, datasetId)

  /** [[readRawFor]] AS OF a published version — the FULL-fidelity leg
   *  of chart time travel (pairs with [[readLevelRangeAsOf]]).
   */
  def readRawForAsOf(
      spark: SparkSession, root: String, datasetId: String,
      version: Long): DataFrame =
    readRawForDirs(spark, rawDirEntries(liveAt(spark, root, version)),
      root, datasetId)

  private def readRawForDirs(
      spark: SparkSession, entries: Seq[String], root: String,
      datasetId: String): DataFrame = {
    val dirs = requireRawDirs(spark, entries, root)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Tables.rawSchema)
    else spark.read.schema(rawCommitSchema).parquet(dirs: _*)
      .where(col("ds_b") === Tables.dsBucket(lit(datasetId)) &&
        col("dataset_id") === datasetId)
      .select(Tables.rawSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Resolve `r-` commit entries to data dirs, REQUIRING each to exist.
   *  Raw commit dirs (unlike per-level `c-<id>/fidelity=` leaf dirs,
   *  which legitimately exist only for levels the commit touched) are
   *  always present when their version published — an absent one means
   *  vacuum reclaimed a superseded dir after a rewrite, and silently
   *  skipping it would return PARTIAL data from an as-of read or
   *  [[cdcRawBetween]]. Fail loudly instead, like [[liveAt]] does for
   *  reclaimed versions.
   */
  private def requireRawDirs(
      spark: SparkSession, entries: Seq[String], root: String): Seq[String] = {
    val dirs = entries.map(d => s"${dataDir(root)}/$d")
    val missing = dirs.filterNot(StoreFs.exists(spark, _))
    require(missing.isEmpty,
      s"raw commit dir(s) ${missing.mkString(", ")} referenced by the " +
        s"manifest at $root no longer exist (vacuumed after a rewrite); " +
        "this snapshot/CDC window is unreadable — refusing to return " +
        "partial data")
    dirs
  }

  private def readRawDirs(
      spark: SparkSession, entries: Seq[String], root: String): DataFrame = {
    val dirs = requireRawDirs(spark, entries, root)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Tables.rawSchema)
    else spark.read.schema(rawCommitSchema).parquet(dirs: _*)
      .select(Tables.rawSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** §3.2 ingest through the manifest path: sanitize → concurrent raw
   *  append + rollup partials append (no merge on the write path) →
   *  compact + vacuum when live commits exceed `maxLiveCommits`.
   */
  def ingestBatch(
      spark: SparkSession, root: String, batchLong: DataFrame,
      maxLiveCommits: Int = 16): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global

    val batch = graft.ingest.Melt.sanitize(batchLong).persist()
    try {
      if (!batch.isEmpty) {
        val writes = Seq(
          Future(Tables.appendRaw(batch, root)),
          Future(appendPartials(spark, root,
            Tables.allLevelPartials(batch, withSumsq = true))))
        Await.result(Future.sequence(writes), Duration.Inf): Unit
        if (latest(spark, root)._2.size > maxLiveCommits) {
          // steady-state policy: fold the small tier, never the table
          compactTiered(spark, root, fanIn = math.max(2, maxLiveCommits / 2))
          vacuum(spark, root, VacuumRetentionMs)
        }
      }
    } finally batch.unpersist(): Unit
  }
}
