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
 *  - join strategy: Spark defaults (`preferSortMergeJoin=true`, AQE
 *    SHJ rewrite off). Round 15 shipped `preferSortMergeJoin=false`
 *    + a 64m AQE shuffled-hash threshold; the round-16 A/B on the
 *    join-heavy tier (14 queries: dedup/graph/shingle/cluster) at
 *    sf0.1 measured SMJ ~11-26% faster in AGGREGATE at local[32]
 *    (72.2 s vs 81.1/98.0 s over two SHJ runs; per-query deltas in
 *    plans/r16/join_policy_ab.md) and no query where SHJ won by >10%.
 *    With 32 concurrent tasks the per-partition SHJ build maps add
 *    allocation/GC pressure that the sort path avoids (guide §3.1's
 *    "fits comfortably" caveat + §5); at 8 cores the two policies
 *    tie. Sort-merge also spills gracefully at 100 TB partition
 *    sizes, so the scale-safe default and the measured-fast local
 *    default agree. Both knobs stay env-overridable.
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
      env("SPARK_GRAFT_PREFER_SMJ", "true"))
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
      env("SPARK_GRAFT_SHJ_LOCAL_MAP", "0b"))
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
      env("SPARK_GRAFT_LISTING_THRESHOLD", "128"))
}
