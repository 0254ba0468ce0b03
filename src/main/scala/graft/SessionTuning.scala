package graft

import org.apache.spark.sql.SparkSession

/**
 * Engine session tuning shared by every driver entry point (Bench,
 * Verify, Profile) so the measured session IS the shipped session.
 *
 * Every value is env-overridable and the defaults are SCALE-ADAPTIVE
 * policies, not local-machine constants (optimization guide §2.2/§3.1):
 *
 *  - AQE partition coalescing stays at Spark's `parallelismFirst=true`
 *    default, exposed as a knob: A/B-measured this round (see
 *    OPTIMIZATION_r15.md), `false` consistently regressed the
 *    store-writer probes 25-45% (ingest_incremental_1s, rollup_repair,
 *    store_compact) because collapsing a tiny shuffle to one partition
 *    also serializes the partitioned fixture WRITE behind it — file
 *    opens dominate at this scale. At 100 TB the advisory size, not
 *    the local core count, already governs (partitions are byte-bound
 *    well above parallelism), so the default loses nothing there.
 *  - `preferSortMergeJoin=false` + an AQE shuffled-hash threshold:
 *    lets the planner (and AQE at runtime) take a shuffled hash join
 *    when each post-shuffle partition's build side fits comfortably —
 *    no sort, same shuffle (guide §3.1). Sort-merge remains the
 *    fallback for anything larger.
 *  - a parallel-listing threshold of 128 paths: file-source listing
 *    below that runs inline on the driver (a local/POSIX listing is a
 *    few syscalls; spawning a Spark job to list 33 directories costs
 *    more than the listing). Object-store deployments with
 *    thousand-partition tables still get distributed listing past the
 *    threshold, and the env knob restores the default where listing
 *    itself is remote-slow.
 */
object SessionTuning {
  def env(name: String, default: String): String =
    sys.env.getOrElse(name, default)

  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      env("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      env("SPARK_GRAFT_ADVISORY_PART", "64m"))
    .config("spark.sql.join.preferSortMergeJoin",
      env("SPARK_GRAFT_PREFER_SMJ", "false"))
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
      env("SPARK_GRAFT_SHJ_LOCAL_MAP", "64m"))
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
      env("SPARK_GRAFT_LISTING_THRESHOLD", "128"))
}
