package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Fidelity
import graft.ops.Rollup
import graft.plans.{RollupCatalog, RollupRewriteRule}
import graft.store.Tables

/**
 * The rollup materialized-view rewrite (SURVEY §7.3): an aggregate over
 * a registered store's raw table must be rewritten by the optimizer to
 * a rollup-table scan with identical results; unregistered tables and
 * non-level durations keep their normal aggregation plan.
 */
class RollupRewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val root: String = {
    // install the rule once on the shared session (the production hook
    // is GraftExtensions.injectOptimizerRule)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RollupRewriteRule(spark)
    val r = TestSpark.tmpDir("graft_rewrite")
    Tables.ingestBatch(spark, r, TestSpark.longDF(Seq(
      ("rw.a", "2024-01-01T01:00:00", 1.0),
      ("rw.a", "2024-01-01T01:00:05", 3.0),
      ("rw.a", "2024-01-01T01:00:11", 5.0),
      ("rw.b", "2024-01-01T01:00:00", -1.0))))
    r
  }

  test("registered raw-table window aggregate rewrites to a rollup scan") {
    RollupCatalog.register(root)
    try {
      val q = Rollup.aggregate(Tables.readRaw(spark, root), 10L)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Aggregate"), s"aggregate survived in:\n$optimized")
      // the physical scan reads the combined rollup table pruned to the
      // requested level's fidelity partition, not raw
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("/rollup"), s"no rollup scan in:\n$physical")
      assert(physical.contains("= d10"), s"no fidelity partition filter in:\n$physical")
      assert(!physical.contains("/raw"), s"raw scan survived in:\n$physical")

      // identical results to the direct rollup table read
      val got = q.orderBy("dataset_id", "bucket_s").collect().toSeq
      val want = Tables.readRollup(spark, root, Fidelity.S10)
        .select("dataset_id", "bucket_s", "min_v", "max_v", "sum_v", "cnt")
        .orderBy("dataset_id", "bucket_s").collect().toSeq
      assert(got == want)
      assert(got.map(_.getLong(5)).sum == 4)
    } finally RollupCatalog.clear()
  }

  test("non-level durations and unregistered stores keep the aggregation plan") {
    RollupCatalog.register(root)
    try {
      val odd = Rollup.aggregate(Tables.readRaw(spark, root), 7L)
      assert(odd.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      assert(odd.collect().nonEmpty)
    } finally RollupCatalog.clear()

    // unregistered: same query, no rewrite
    val q = Rollup.aggregate(Tables.readRaw(spark, root), 10L)
    assert(q.queryExecution.optimizedPlan.toString.contains("Aggregate"))
  }
}
