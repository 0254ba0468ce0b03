package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.CoreQueries
import graft.model.Fidelity
import graft.ops.Rollup
import graft.store.Tables
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    val root = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val long = CoreQueries.ev(spark, dir)
    time("ev count")(long.count())
    val b0 = long.where(pmod(crc32(concat_ws("|", col("dataset_id"), col("ts_us"))), lit(3)) === 0)
    val batch = time("sanitize+persist")({ val b = graft.ingest.Melt.sanitize(b0).persist(); b.count(); b })
    time("appendRaw")(Tables.appendRaw(batch, root))
    time("mergeRollups b1")(Tables.mergeRollups(spark, root, Tables.allLevelPartials(batch)))
    time("mergeRollups b2 (merge)")(Tables.mergeRollups(spark, root, Tables.allLevelPartials(batch)))
    time("mergeRollups b3 (merge)")(Tables.mergeRollups(spark, root, Tables.allLevelPartials(batch)))
    val n = java.nio.file.Files.walk(java.nio.file.Paths.get(root)).count()
    println(s"[prof] files under store: $n")
    spark.stop()
  }
}
