package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: dump the optimized plan tree (with expression classes) of a
 *  Rollup.aggregate over a store's raw table, to ground the
 *  RollupRewriteRule matcher in the real plan shape.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("plandump").toString
    graft.store.Tables.ingestBatch(spark, root,
      Seq(("a", 1704067200000000L, 1.0)).toDF("dataset_id", "ts_us", "value"))
    val df = graft.ops.Rollup.aggregate(
      graft.store.Tables.readRaw(spark, root), 10L)
    val opt = df.queryExecution.optimizedPlan
    println(opt.treeString)
    opt.foreach { n =>
      println("NODE " + n.getClass.getName)
      n match {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.groupingExpressions.foreach(e => println("  GROUP " + e.getClass.getName + " :: " + e))
          a.aggregateExpressions.foreach(e => println("  AGG   " + e.getClass.getName + " :: " + e))
        case _ =>
      }
    }
    spark.stop()
  }
}
