package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** Builder-side profiling scratch: stage-by-stage timing of the
  * MinHash dedup pipeline at a given sf dir. Not part of the library
  * surface.
  */
object ProfileMinhash {
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

    time("corpus count")(corpus.count())
    val sh = Dedup.shingleSet(corpus, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSh = time("shingleSet")(sh.count())
    val sig = Dedup.minhashSignature(sh, 64).persist(StorageLevel.MEMORY_AND_DISK)
    val nSig = time("signature")(sig.count())
    val cand = Dedup.lshCandidates(sig, 64, 16).persist(StorageLevel.MEMORY_AND_DISK)
    val nCand = time("lshCandidates")(cand.count())
    val pruned = Dedup.estimatePrune(cand, sig, 64, 0.3).persist(StorageLevel.MEMORY_AND_DISK)
    val nPruned = time("estimatePrune")(pruned.count())
    val nOut = time("verifyJaccard")(Dedup.verifyJaccard(pruned, sh, 0.6).count())
    println(s"[prof] rows: shingles=$nSh sigs=$nSig cand=$nCand pruned=$nPruned out=$nOut")
    spark.stop()
  }
}
