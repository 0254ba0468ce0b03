package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The SCALE.md claim "at 100 TB both fact sides would be bucketed on
 * the join key to make the join shuffle-free" — demonstrated: two
 * tables bucketed+sorted on the key join with NO ShuffleExchange in
 * the physical plan (the bucketed scan satisfies the join's required
 * distribution directly).
 */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def collectShuffles(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case s: ShuffleExchangeExec => s }

  test("co-bucketed tables join without a shuffle exchange") {
    val db = "graft_bucket_test"
    val loc = TestSpark.tmpDir("graft_bucketed")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    val oldBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a real join strategy decision (no broadcast escape hatch)
      // and a plain physical plan (AQE wraps it in AdaptiveSparkPlanExec,
      // which hides exchanges from a naive collect)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      (0L until 1000L).map(k => (k, s"left_$k")).toDF("k", "l")
        .write.format("parquet").bucketBy(4, "k").sortBy("k")
        .mode("overwrite").saveAsTable(s"$db.a")
      (0L until 1000L).map(k => (k, k * 2)).toDF("k", "r")
        .write.format("parquet").bucketBy(4, "k").sortBy("k")
        .mode("overwrite").saveAsTable(s"$db.b")

      val joined = spark.table(s"$db.a").join(spark.table(s"$db.b"), "k")
      assert(joined.count() == 1000L)
      val shuffles = collectShuffles(joined.queryExecution.executedPlan)
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found: ${shuffles.map(_.nodeName)}")

      // the same join over plain (unbucketed) frames DOES shuffle —
      // the assertion above is meaningful, not vacuous
      val plain = (0L until 1000L).map(k => (k, s"l$k")).toDF("k", "l")
        .join((0L until 1000L).map(k => (k, k * 2)).toDF("k", "r"), "k")
      plain.count()
      assert(collectShuffles(plain.queryExecution.executedPlan).nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
