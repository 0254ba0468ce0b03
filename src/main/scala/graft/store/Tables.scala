package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Fidelity
import graft.ops.Rollup

/**
 * Physical table layout — the Spark re-expression of the reference's
 * `data/<fidelity>/<dataset_id>/<a>/<b>/<c>/<bucket>` path scheme
 * (reference: src/index.py:22-29, 460-505).
 *
 * One parquet table per fidelity level:
 *   raw:     partitioned by (dataset_id, day_s)   — append-only
 *            (the reference appends raw files, src/index.py:517)
 *   rollup d: partitioned by (dataset_id, part_s) — read-merge-rewrite
 *            scoped to AFFECTED partitions only via dynamic partition
 *            overwrite (the reference rewrites one agg file at a time,
 *            src/index.py:521-550; a full-table rewrite per batch would
 *            be a scale-killer at 100 TB).
 *
 * `part_s = bucket_s div (5000 * d) * (5000 * d)` mirrors the
 * reference's DATAPOINT_GROUP_SIZE=5000-row file windows
 * (src/index.py:45-57): one partition holds ~5000 buckets. Catalyst
 * partition pruning on (dataset_id, part_s) replaces the reference's
 * `_subpaths` arithmetic (src/index.py:408-458).
 */
object Tables {

  val rawSchema: StructType = StructType(Seq(
    StructField("dataset_id", StringType),
    StructField("ts_us", LongType),
    StructField("value", DoubleType)))

  val rollupSchema: StructType = StructType(Seq(
    StructField("dataset_id", StringType),
    StructField("bucket_s", LongType),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType),
    StructField("sum_v", DoubleType),
    StructField("cnt", LongType)))

  def rawPath(root: String): String = s"$root/raw"
  def rollupPath(root: String, f: Fidelity): String = s"$root/rollup_${f.name}"

  /** Partition window per level: at least one DAY, else ~5000 buckets
   *  (src/index.py:46). The reference's fixed 5000-bucket file windows
   *  assume dense 10 Hz series; for sparse series they explode into
   *  thousands of near-empty partition directories (a filesystem-
   *  metadata scale-killer), so fine levels partition by day — the
   *  idiomatic Spark layout (SURVEY §1.5) — and coarse levels keep the
   *  5000-bucket window.
   */
  def partitionWindowS(f: Fidelity): Long =
    if (f.isFull) 86400L
    else math.max(86400L, Fidelity.GroupSize * f.seconds)

  /** S2 — append a sanitized long batch to the raw table. The
   *  within-partition ts sort is the reference's ingest sort (O1,
   *  src/index.py:117-122) re-purposed: hash aggregation doesn't need
   *  sorted input, but time-clustered files get tight parquet min/max
   *  row-group stats, which is what makes range scans skip IO. File
   *  size caps at the reference's 5000-point group (A3,
   *  src/index.py:46).
   */
  def appendRaw(long: DataFrame, root: String): Unit =
    long
      .withColumn("day_s", expr("ts_us div 86400000000") * 86400L)
      .repartition(col("dataset_id"), col("day_s"))
      .sortWithinPartitions(col("dataset_id"), col("day_s"), col("ts_us"))
      .write
      .mode("append")
      .option("maxRecordsPerFile", Fidelity.GroupSize)
      .partitionBy("dataset_id", "day_s")
      .parquet(rawPath(root))

  /** Read a table back; a never-written table reads as empty (the
   *  reference treats missing files as empty results, src/index.py:556-558).
   */
  private def readOrEmpty(
      spark: SparkSession, path: String, schema: StructType, partCols: Seq[String]): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.parquet(path)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .select(schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def readRaw(spark: SparkSession, root: String): DataFrame =
    readOrEmpty(spark, rawPath(root), rawSchema, Seq("dataset_id", "day_s"))

  /** Raw read restricted to a day_s partition range — the filter lands
   *  on the partition column BEFORE projection, so it prunes statically.
   */
  private def readRawDays(
      spark: SparkSession, root: String, dayLo: Long, dayHi: Long): DataFrame = {
    val path = rawPath(root)
    if (!new java.io.File(path).exists())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rawSchema)
    else
      spark.read.parquet(path)
        .where(col("day_s").between(dayLo, dayHi))
        .select(rawSchema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)
  }

  def readRollup(spark: SparkSession, root: String, f: Fidelity): DataFrame =
    readOrEmpty(spark, rollupPath(root, f), rollupSchema, Seq("dataset_id", "part_s"))

  /**
   * S3 — merge-upsert partial aggregates into one rollup table with
   * UNBOUNDED lateness (src/index.py:521-550, 328-374): read only the
   * affected (dataset_id, part_s) partitions (left-semi join against the
   * batch's distinct partition keys — broadcast, since a batch touches
   * few partitions), fold with the A2 monoid, and dynamically overwrite
   * just those partitions.
   */
  def mergeRollup(
      spark: SparkSession, root: String, f: Fidelity, partials: DataFrame): Unit = {
    val w = partitionWindowS(f)
    def withPart(df: DataFrame): DataFrame =
      df.withColumn("part_s", expr(s"bucket_s div $w") * w)

    val newPart = withPart(partials)
    // Restrict the existing-table read to the batch's time range with
    // TWO literal bounds (static partition pruning — a per-key OR chain
    // would blow up Catalyst planning), then exact-match the affected
    // (dataset_id, part_s) partitions with a broadcast semi-join. The
    // affected set is bounded by (#series × #file-windows) in the batch,
    // the same bound as the reference's per-put file list
    // (src/index.py:408-458).
    val affected = newPart.select("dataset_id", "part_s").distinct()
    val bounds = newPart.agg(min("part_s"), max("part_s")).head()
    if (bounds.isNullAt(0)) return // empty batch: nothing to merge
    val existing = withPart(readRollup(spark, root, f))
      .where(col("part_s").between(bounds.getLong(0), bounds.getLong(1)))
      .join(broadcast(affected), Seq("dataset_id", "part_s"), "left_semi")

    val merged = Rollup
      .mergePartials(existing.drop("part_s").unionByName(newPart.drop("part_s")))

    // Rewrite only the affected partitions (partitionOverwriteMode=dynamic)
    withPart(merged)
      .repartition(col("dataset_id"), col("part_s"))
      .sortWithinPartitions(col("dataset_id"), col("part_s"), col("bucket_s"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", Fidelity.GroupSize)
      .partitionBy("dataset_id", "part_s")
      .parquet(rollupPath(root, f))
  }

  /**
   * §3.2 `Index.put` — one ingest batch: sanitize → append raw →
   * cascade all 6 rollup levels → merge each into its table
   * (reference: src/index.py:124-177). Used by both the batch bootstrap
   * path and the Structured Streaming `foreachBatch` sink.
   */
  def ingestBatch(
      spark: SparkSession, root: String, batchLong: DataFrame,
      dedup: Boolean = false): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global

    // The reference double-counts re-POSTed points (acknowledged TODO,
    // src/index.py:39-40): append + merge have no dedup. Default
    // replicates that for parity; `dedup = true` fixes it — exact-dup
    // drop within the batch, then a left-anti join against ONLY the
    // raw partitions the batch touches (day-range pruned, so the check
    // scales with the batch, not the table).
    val sanitized = graft.ingest.Melt.sanitize(batchLong)
    val deduped =
      if (!dedup) sanitized
      else {
        val inBatch = sanitized.dropDuplicates("dataset_id", "ts_us", "value")
        val bounds = inBatch.agg(min("ts_us"), max("ts_us")).head()
        if (bounds.isNullAt(0)) inBatch
        else {
          val dayLo = bounds.getLong(0) / 86400000000L * 86400L
          val dayHi = bounds.getLong(1) / 86400000000L * 86400L
          val existing = readRawDays(spark, root, dayLo, dayHi)
            .where(col("ts_us").between(bounds.getLong(0), bounds.getLong(1)))
          inBatch.join(
            existing.select("dataset_id", "ts_us", "value"),
            Seq("dataset_id", "ts_us", "value"), "left_anti")
        }
      }
    // dedup's anti-join lineage READS the raw table this very ingest is
    // about to append to — a lazy recompute racing the append would see
    // the batch's own rows and drop them. localCheckpoint materializes
    // the deduped batch eagerly and severs that lineage.
    val batch =
      if (dedup) deduped.localCheckpoint(true)
      else deduped.persist()
    val partials = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      // Cascade: level k's partials come from level k-1's (10× less
      // input per level than the reference's recompute-from-raw,
      // src/index.py:137-177). Partials are tiny; persist each so the
      // concurrent writers below share them instead of recomputing.
      var finer = Rollup.aggregate(batch, Fidelity.aggLevels.head.seconds).persist()
      partials += finer
      var levelDfs = Map(Fidelity.aggLevels.head -> finer)
      for (f <- Fidelity.aggLevels.tail) {
        val next = Rollup.cascade(finer, f.seconds).persist()
        partials += next
        levelDfs += f -> next
        finer = next
      }
      // The raw append and the 6 per-level merges write to DISJOINT
      // tables — run them as concurrent Spark jobs so the batch pays
      // max(level latencies), not their sum (the reference writes its 7
      // levels sequentially, src/index.py:124-177).
      val writes =
        Future(appendRaw(batch, root)) +:
          Fidelity.aggLevels.map(f => Future(mergeRollup(spark, root, f, levelDfs(f))))
      Await.result(Future.sequence(writes), Duration.Inf)
    } finally {
      partials.foreach(_.unpersist())
      batch.unpersist()
    }
  }
}
