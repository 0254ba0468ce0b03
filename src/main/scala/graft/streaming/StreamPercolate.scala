package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * STREAMING PERCOLATION: stored queries watch a document stream — the
 * saved-search/alerting posture on a live crawl (the reverse of ad-hoc
 * retrieval; the reference has no streaming surface at all, this is
 * engine-native capability on top of src/index.py's batch-only world).
 *
 * The rules ride as a LITERAL array column (registered alerting rules
 * are driver-resident config by nature — bounded, loud past the cap),
 * and each document's matches are computed ROW-LOCALLY: distinct doc
 * tokens once, then per rule an `array_intersect` count. No state
 * store, no watermark, no shuffle — the operator is embarrassingly
 * parallel and works identically in append-mode streaming and batch,
 * which is exactly what makes it safe at any stream rate: cost per
 * micro-batch is one narrow pass over the batch's rows × |rules|.
 *
 * Match semantics are [[graft.text.TextOps.percolate]]'s: a rule fires
 * when at least `minMatch` of its distinct tokens appear in the doc
 * (`minMatch = 0` = ALL tokens, conjunctive). A batch DataFrame runs
 * through the same function unchanged (spec + oracle pin equality with
 * the aggregate formulation).
 */
object StreamPercolate {

  private val MaxRules = 65536

  /** (query_id, doc_id, n_matched, n_terms) for every firing rule —
   *  works on a streaming OR batch (doc_id, text) frame.
   */
  def matches(
      docs: DataFrame, rules: Seq[(Long, Seq[String])],
      idCol: String = "doc_id", textCol: String = "text",
      minMatch: Int = 0): DataFrame = {
    require(rules.nonEmpty, "percolate with no rules")
    require(rules.size <= MaxRules,
      s"${rules.size} rules — the literal-rule percolator is for " +
        "capped-small registered-rule sets (shard the rule table)")
    require(minMatch >= 0, s"bad minMatch: $minMatch")
    // parity with TextOps.percolate: empty tokens exist NEITHER on the
    // rule side (a (query_id, token) table cannot hold a rule with no
    // rows — an all-empty rule here would conjunctively fire on every
    // doc, an alert storm) NOR on the doc side (split(" ") emits ""
    // for doubled separators; the aggregate formulation drops them)
    val cleaned = rules.map { case (q, ts) =>
      (q, ts.distinct.filter(_.nonEmpty))
    }
    require(cleaned.forall(_._2.nonEmpty),
      s"rules with no non-empty tokens: ${cleaned.filter(_._2.isEmpty).map(_._1)}")
    val ruleArr = array(cleaned.map { case (q, distinctToks) =>
      struct(lit(q).as("query_id"),
        array(distinctToks.map(lit): _*).as("toks"))
    }: _*)
    docs
      .select(col(idCol).as("doc_id"),
        array_distinct(filter(graft.text.TextOps.tokens(col(textCol)),
          t => length(t) > 0)).as("dt"))
      .select(col("doc_id"), explode(
        filter(
          transform(ruleArr, r => struct(
            r.getField("query_id").as("query_id"),
            size(array_intersect(r.getField("toks"), col("dt")))
              .cast("long").as("n_matched"),
            size(r.getField("toks")).cast("long").as("n_terms"))),
          m =>
            if (minMatch == 0) m.getField("n_matched") === m.getField("n_terms")
            else m.getField("n_matched") >= minMatch)).as("m"))
      .select(col("m.query_id"), col("doc_id"),
        col("m.n_matched"), col("m.n_terms"))
  }
}
