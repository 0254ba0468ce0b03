package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextOps

/** Builder-side profiling scratch: where does cluster_canonical spend
  * time beyond dedup_clusters? Not part of the library surface.
  */
object ProfileCanonical {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(
      d.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" zz0 zz1 zz2")).as("text")))

    time("warm corpus")(corpus.count())
    val pairs = time("minhashDedup")(
      Dedup.minhashDedup(corpus, "doc_id", "text", 0.6))
    val comps = time("connectedComponents")(Dedup.connectedComponents(pairs))
    val quality = TextOps.profile(corpus, "doc_id", "text")
      .select(col("doc_id"), round(col("quality") * 1e6).cast("long").as("qppm"))
    time("profile count")(quality.count())
    val canon = Dedup.canonicalPerCluster(comps, quality)
    time("canonical agg+collect")(canon.orderBy("comp").collect().length)
    time("clusters collect")(comps.orderBy("doc_id").collect().length)
    spark.stop()
  }
}
