package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamPercolate
import graft.text.TextOps

/**
 * Percolation: the row-local literal-rule formulation (streaming path)
 * must answer exactly like the aggregate broadcast-join formulation
 * (batch path), for conjunctive and min-should-match semantics alike.
 */
class StreamPercolateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "alert disk full on node"),
    (1L, "disk almost full"),
    (2L, "node down alert"),
    (3L, "all quiet nothing to see"),
    (4L, "alert alert disk")).toDF("doc_id", "text")

  private val rules = Seq(
    1L -> Seq("alert", "disk"),
    2L -> Seq("node", "down"),
    3L -> Seq("quiet", "nothing", "missingtoken"))

  private def rulesDf = rules
    .flatMap { case (q, ts) => ts.map((q, _)) }.toDF("query_id", "token")

  private def dump(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "doc_id", "n_matched", "n_terms")
      .collect().map(_.toString).sorted.toSeq

  test("row-local matches == aggregate percolate, conjunctive and minMatch") {
    for (mm <- Seq(0, 1, 2)) {
      assert(dump(StreamPercolate.matches(docs, rules, minMatch = mm)) ==
        dump(TextOps.percolate(docs, "doc_id", "text", rulesDf, mm)),
        s"formulations diverged at minMatch=$mm")
    }
    // conjunctive ground truth: rule 1 (alert+disk) fires on 0/4 only
    // (doc 1 lacks 'alert'), rule 2 on 2, rule 3 never (missingtoken)
    val fired = StreamPercolate.matches(docs, rules)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fired == Set((1L, 0L), (1L, 4L), (2L, 2L)))
    // duplicate rule tokens count once in n_terms
    val dup = StreamPercolate.matches(docs,
      Seq(9L -> Seq("alert", "alert", "disk")))
      .where(col("doc_id") === 4).collect().head
    assert(dup.getLong(2) == 2L && dup.getLong(3) == 2L)
  }

  test("streamed matches equal the batch run (stateless append, 2 micro-batches)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_spc_spec")
    for (i <- 0 until 2) {
      val scratch = srcDir.resolve(s"scratch$i")
      docs.where(pmod(col("doc_id"), lit(2)) === i)
        .coalesce(1).write.parquet(scratch.toString)
      val parts = java.nio.file.Files.list(scratch)
      try {
        val part = parts
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        java.nio.file.Files.move(part, srcDir.resolve(s"b$i.parquet"))
      } finally parts.close()
    }
    val schema = spark.read.parquet(s"$srcDir/b0.parquet").schema
    val qn = "spcspec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    StreamPercolate.matches(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
        rules)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .option("checkpointLocation", s"$srcDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(dump(spark.table(qn)) ==
      dump(StreamPercolate.matches(docs, rules)))
  }
}
