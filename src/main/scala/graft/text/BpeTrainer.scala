package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge-rule trainer (Sennrich et al., "Neural
 * Machine Translation of Rare Words with Subword Units", ACL 2016) —
 * the tokenizer-training step of an LLM data pipeline, learning the
 * top-k merge rules from corpus word frequencies.
 *
 * Scale design: the corpus is reduced to the WORD-FREQUENCY grain
 * once (one corpus-sized hash aggregate — the only pass whose cost is
 * proportional to data volume); every training round after that
 * operates on the vocabulary table only (≤ a few million rows at any
 * corpus size, Heaps' law), so k rounds cost k vocabulary-sized
 * aggregates plus k single-row collects of the winning pair — the
 * standard distributed-BPE shape. Pair counting is a narrow
 * explode + hash aggregate with map-side partial aggregation; the
 * merge application is one codegen'd fold per word (no UDF, no
 * shuffle). Nothing corpus-sized is ever iterated.
 *
 * Determinism: the winning pair each round is (count DESC, lhs, rhs)
 * with binary string comparison — identical in Spark and DuckDB — and
 * the merge pass is the standard greedy left-to-right non-overlapping
 * rewrite, expressed as a string fold so both engines apply byte-wise
 * identical semantics.
 */
object BpeTrainer {

  /** Word terminator symbol, distinguishing word-final merges (the
   *  classic `</w>` marker; never a single character, so it cannot
   *  collide with an alphabet symbol).
   */
  val EndOfWord = "</w>"

  /** `w`'s characters joined by single spaces, terminated by
   *  [[EndOfWord]] — the round-0 symbol sequence of each word.
   */
  def charRepr(w: Column): Column =
    concat(
      array_join(
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
        " "),
      lit(" " + EndOfWord))

  /** One greedy left-to-right merge pass of the rule `x y -> xy` over
   *  a space-joined symbol string: fold the symbols into a rebuilt
   *  string, replacing the accumulator's last symbol with `xy`
   *  whenever it is exactly `x` and the incoming symbol is `y`.
   *  Because the merged symbol `xy` differs from `x`'s role as a
   *  fold suffix only via the trailing-symbol check, overlapping
   *  occurrences resolve left-to-right non-overlapping — the standard
   *  BPE convention ("a a a" under `a a -> aa` becomes "aa a").
   */
  def applyMerge(repr: Column, x: String, y: String): Column =
    aggregate(split(repr, " "), lit(""), (acc, t) =>
      when(
        t === lit(y) && (acc === lit(x) || acc.endsWith(lit(" " + x))),
        when(acc === lit(x), lit(x + y))
          .otherwise(concat(
            acc.substr(lit(1), length(acc) - lit(x.length)),
            lit(x + y))))
        .otherwise(
          when(acc === lit(""), t).otherwise(concat(acc, lit(" "), t))))

  /** [[applyMerge]] for a whole rule list, in training (priority)
   *  order — the BPE ENCODER's word-level segmentation.
   */
  def applyMerges(repr: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(repr) { case (r, (x, y)) => applyMerge(r, x, y) }

  /**
   * Learn `k` merge rules from a word-frequency table. Returns the
   * k-row merge table (round, lhs, rhs, n) in training order — the
   * artifact a tokenizer loads. `words` must be word-grain with a
   * positive count column.
   */
  def train(
      s: SparkSession,
      words: DataFrame,
      wordCol: String,
      cntCol: String,
      k: Int): DataFrame = {
    import s.implicits._
    trainRules(words, wordCol, cntCol, k).toDF("round", "lhs", "rhs", "n")
  }

  /** [[train]], returning the rules as driver-side values (k rows —
   *  bounded) so an encoder can inline them as literals.
   */
  def trainRules(
      words: DataFrame,
      wordCol: String,
      cntCol: String,
      k: Int): Seq[(Long, String, String, Long)] = {
    var cur = words
      .select(col(wordCol).as("word"), col(cntCol).cast("long").as("cnt"))
      .withColumn("repr", charRepr(col("word")))
    // vocabulary-grain; persisted so round r does not replay rounds
    // 1..r-1's folds from the corpus scan (bounded: vocab size)
    cur.persist()
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame](cur)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    try {
      for (r <- 1 to k) {
        val t = split(col("repr"), " ")
        // winning pair: one vocab-sized aggregate + a 1-row collect
        val best = cur
          .select(col("cnt"), explode(zip_with(
            slice(t, lit(1), size(t) - 1),
            slice(t, lit(2), size(t) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("lhs"), col("rhs"))
          .limit(1)
          .collect()(0)
        val (x, y, n) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((r.toLong, x, y, n))
        if (r < k) {
          cur = cur.withColumn("repr", applyMerge(col("repr"), x, y))
          cur.persist()
          persisted += cur
        }
      }
    } finally persisted.foreach(_.unpersist(blocking = false))
    merges.toSeq
  }
}
