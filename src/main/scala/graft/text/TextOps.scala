package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality stats, language-ID heuristics, document
 * fingerprinting, and winnowing. All pure column expressions (codegen'd,
 * no UDFs) so they stay inside whole-stage codegen and scale linearly
 * with input splits — no shuffle anywhere except explicit groupBys.
 */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** k-word shingles from a PRE-TOKENIZED array column (empty when the
   *  doc is shorter than k tokens). Token indices are 1-based via
   *  `element_at` so the shingle set matches a 1-based SQL formulation
   *  exactly.
   *
   *  Callers must bind `toks` to a materialized column (project
   *  `tokens(text)` in its own select first): higher-order functions
   *  evaluate interpreted, so an inlined `split` here would re-split
   *  the whole document for every element_at — measured 15× slower on
   *  the shingle explode.
   */
  def shinglesOf(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (1 to k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** k-word shingles of a text column. Prefer tokenizing into a real
   *  column and calling `shinglesOf` when the expression feeds an
   *  explode (see scaladoc there).
   */
  def shingles(text: Column, k: Int = 3): Column = shinglesOf(tokens(text), k)

  /** Per-doc repetition signals (Gopher/C4-style quality inputs) in ONE
   *  narrow projection — no explode, no aggregation, no join. Output:
   *  `doc_id, n_tok, top_tok_n, n_tri, n_tri_uniq` where `top_tok_n`
   *  is the dominant token's occurrence count (max run length over the
   *  sorted in-row token array — one O(n log n) sort + one O(n) fold
   *  per document) and the trigram columns count total / distinct
   *  3-shingles. The equivalent explode → groupBy(doc, tok) →
   *  groupBy(doc) → join formulation shuffles the corpus token stream
   *  twice and the doc spine once; this shape shuffles NOTHING — at
   *  100 TB the signals ride the scan.
   */
  /** Dominant token's occurrence count from a token-array column: max
   *  run length over the in-row sorted array — one O(n log n) sort +
   *  one O(n) fold per document, NO explode/groupBy/join. The initial
   *  prev="" sentinel is safe: a real "" first token just starts its
   *  run at 0+1 like any other first element.
   */
  def topTokenCount(toks: Column): Column =
    aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
    val topTok = topTokenCount(col("toks"))
    toked
      .withColumn("tris", shinglesOf(col("toks"), 3))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        topTok.as("top_tok_n"),
        size(col("tris")).cast("long").as("n_tri"),
        size(array_distinct(col("tris"))).cast("long").as("n_tri_uniq"))
  }

  private val StopWords = Seq("the", "a", "data", "key")

  /** The quality-stat columns (single source of truth — `stats` and
   *  `profile` must never diverge).
   */
  private def statCols(t: Column): Seq[Column] = {
    val toks = tokens(t)
    val nWords = size(toks).cast("long")
    val stopN = size(filter(toks, w => w.isInCollection(StopWords))).cast("long")
    val stopRatio = stopN.cast("double") / nWords.cast("double")
    Seq(
      length(t).cast("long").as("n_chars"),
      nWords.as("n_words"),
      (length(regexp_replace(t, " ", "")).cast("double") / nWords.cast("double"))
        .as("avg_word_len"),
      stopN.as("n_stopwords"),
      stopRatio.as("stop_ratio"),
      (least(lit(1.0), nWords.cast("double") / 100.0) * (lit(1.0) - stopRatio))
        .as("quality"))
  }

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "las"))

  /** Per-language marker-hit counts (`en_n` … `es_n`). */
  private def markerCols(t: Column): Seq[Column] = {
    val toks = tokens(t)
    Markers.map { case (lang, ws) =>
      size(filter(toks, w => w.isInCollection(ws))).cast("long").as(s"${lang}_n")
    }
  }

  /** Argmax when-chain over MATERIALIZED marker-count columns (each
   *  count column is referenced more than once — inlining the count
   *  expressions would re-split the text per reference).
   */
  private def langPredCol: Column = {
    val Seq(en, de, fr, es) = Markers.map { case (l, _) => col(s"${l}_n") }
    when(en === 0 && de === 0 && fr === 0 && es === 0, "unknown")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Quality-scoring stats: word/char counts, average word length,
   *  stopword ratio, and a simple composite score.
   */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol) +: statCols(col(textCol)): _*)

  /** Marker-word language-ID heuristic: count stopword hits per
   *  language, argmax with a deterministic priority order, 'unknown'
   *  when nothing matches.
   */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol) +: markerCols(col(textCol)): _*)
      .withColumn("lang_pred", langPredCol)

  /** Full per-document profile — the `stats` columns AND the language
   *  prediction in one two-step narrow projection. Use this instead of
   *  `stats(...).join(langId(...))`, which shuffles both projections
   *  just to re-align rows that never moved.
   */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol) +: (statCols(t) ++ markerCols(t)): _*)
      .withColumn("lang_pred", langPredCol)
  }

  /** Whitespace + regex token counts and a chars/4 BPE-count estimate. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(tokens(t)).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(t, lit("[a-z0-9]+"), lit(0))).cast("long").as("n_re_tokens"),
      ceil(length(t) / 4.0).cast("long").as("n_bpe_est"))
  }

  /** Whole-document fingerprint: md5 of the normalized text. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      md5(lower(trim(col(textCol)))).as("fp"))

  /**
   * Winnowing fingerprint (local minima of rolling shingle hashes —
   * the standard robust near-dup fingerprint): for each position keep
   * min(md5(shingle)) over a trailing window of `w` shingles, count the
   * distinct selected hashes per doc. One window function + one
   * aggregation; both partition by doc so they scale with docs, not
   * corpus size.
   */
  def winnow(docs: DataFrame, idCol: String, textCol: String, w: Int = 4): DataFrame = {
    val sh = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(shinglesOf(col("toks"), 3)).as(Seq("pos", "sh")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    sh.withColumn("wmin", min(md5(col("sh"))).over(win))
      .groupBy(col(idCol))
      .agg(count_distinct(col("wmin")).as("n_fp"))
  }

  /** PII patterns kept to the Java-regex ∩ RE2 common subset (char
   *  classes, +, {n} — no lookaround, no backreferences), so the engine
   *  and a RE2-based oracle match the same spans.
   */
  private[graft] val EmailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
  private[graft] val PhoneRe = "555-[0-9]{4}"

  /** PII detection + redaction: per-doc email/phone match counts, and
   *  the redacted text's length and md5 (the fingerprint proves the
   *  REPLACEMENT itself matches, not just the counts). Pure codegen'd
   *  column expressions — at 100 TB this is a narrow map over the scan,
   *  no shuffle at all.
   */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val red = regexp_replace(
      regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    docs.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      length(red).cast("long").as("n_red_chars"),
      md5(red).as("red_fp"))
  }

  /** Per-language top-k vocabulary (token, count, rank) — the
   *  tokenizer-training / coverage stat of a data pipeline. One hash
   *  aggregation collapses the corpus to vocabulary grain with map-side
   *  combine; the rank window's input is the vocabulary, never the
   *  corpus, and Spark plans WindowGroupLimit below the exchange so
   *  each partition ships only its local top-k. Ties rank
   *  deterministically by token text.
   */
  def vocabTopK(docs: DataFrame, langCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
    docs
      .select(col(langCol).as("lang"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Per-document top-k terms by TF-IDF — keyword extraction / rare-term
   *  salience, the relevance primitive of corpus curation.
   *
   *  Float discipline (the ppm pattern): idf = ln(N/df) is converted to
   *  an exact integer `idf_ppm = round(idf·10⁶)` ONCE per vocabulary
   *  term, so the rank key `tf · idf_ppm` is integer arithmetic — no
   *  ulp-order hazard can flip two near-equal ranks between engines —
   *  and the emitted score divides identical integers (bit-deterministic
   *  IEEE division). Plan shape: corpus → (doc, term, tf) hash agg with
   *  map-side combine; df is a second agg over VOCABULARY grain (tiny);
   *  the rank window partitions by doc, so WindowGroupLimit ships only
   *  local top-k per partition — nothing scales worse than the corpus
   *  token count.
   */
  def tfidfTopK(
      docs: DataFrame, idCol: String, textCol: String, k: Int, nDocs: Long): DataFrame =
    tfidfTopKPlan(docs, idCol, textCol, k, lit(nDocs).cast("double"))

  /** Like [[tfidfTopK]] but N (corpus doc count) is folded INTO the
   *  plan as a 1-row broadcast aggregate instead of a separate eager
   *  `docs.count()` action — one job per invocation, no second corpus
   *  pass on the driver's dime.
   */
  def tfidfTopK(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).cast("double").as("_n_docs"))
    tfidfTopKPlan(docs, idCol, textCol, k, col("_n_docs"), Some(n))
  }

  private def tfidfTopKPlan(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      nDocs: Column, nRel: Option[DataFrame] = None): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_ppm").desc, col("token"))
    val joined = nRel.foldLeft(tf.join(df, Seq("token")))(
      (d, n) => d.crossJoin(broadcast(n)))
    joined
      .withColumn("idf_ppm",
        round(log(nDocs / col("df")) * 1e6).cast("long"))
      .withColumn("score_ppm", col("tf") * col("idf_ppm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(
        col("doc_id"), col("token"), col("tf"), col("df"),
        (col("score_ppm").cast("double") / 1e6).as("tfidf"), col("rank"))
  }

  /** Per-document unigram language-model score — the corpus-LM fluency
   *  signal of a quality pipeline: each token's log-probability under
   *  the corpus unigram distribution, summed and averaged per doc
   *  (low avg ⇒ rare-token-heavy / junk docs).
   *
   *  Float discipline (ppm): `lp_ppm = round(ln(cnt/T)·10⁶)` is integer
   *  ONCE per vocabulary term (the tfidf idf_ppm pattern), so per-doc
   *  sums are exact integer arithmetic in any accumulation order and
   *  the average divides identical operands. Plan shape: corpus →
   *  (doc, term, tf) hash agg with map-side combine; the vocabulary is
   *  small → the lp lookup joins broadcast; per-doc reduction is one
   *  aggregation at doc grain.
   */
  def docLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("token").agg(sum(col("tf")).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).cast("double").as("t"))
    val lp = cnt.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("t")) * 1e6).cast("long").as("lp_ppm"))
    tf.join(broadcast(lp), Seq("token"))
      .groupBy("doc_id")
      .agg(
        sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("lp_ppm")).as("sum_lp_ppm"))
      .select(
        col("doc_id"), col("n_tok"), col("sum_lp_ppm"),
        (col("sum_lp_ppm").cast("double") / (col("n_tok") * lit(1e6))).as("avg_logp"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
   *  Resampling, Xie et al. 2023): per-doc log-likelihood RATIO
   *  between a TARGET unigram LM (docs matching `isTarget`) and the
   *  SOURCE LM (the whole corpus), both add-1 smoothed over the shared
   *  source vocabulary so tokens unseen in the target slice score
   *  finitely. `sum_w_ppm > 0` ⇔ the doc looks more target- than
   *  source-like — the resampling weight a curation pass feeds into
   *  weighted sampling (sample_weighted) to steer a 100 TB crawl
   *  toward a high-quality slice.
   *
   *  Float discipline: the only floats are the two `ln`s per
   *  vocabulary entry, evaluated on identical integer-derived doubles
   *  by both engines, rounded ONCE to ppm; everything per-doc is
   *  exact integer arithmetic ([[docLogProb]]'s proven rule). Scale:
   *  vocabulary-grain aggregates with map-side combine, LM attach by
   *  token-key equi-join, one doc-grain reduction — corpus rows never
   *  self-join.
   */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
    val tf = base.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val sc = base.groupBy("token").agg(
      count(lit(1)).as("s_cnt"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("t_cnt"))
    val v = sc.agg(
      count(lit(1)).as("v"), sum(col("s_cnt")).as("s"), sum(col("t_cnt")).as("t"))
    val lp = sc.crossJoin(broadcast(v))
      .select(col("token"),
        round((log((col("t_cnt") + 1).cast("double") / (col("t") + col("v"))) -
          log((col("s_cnt") + 1).cast("double") / (col("s") + col("v"))))
          * 1e6).cast("long").as("w_ppm"))
    tf.join(lp, Seq("token"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"), sum(col("tf") * col("w_ppm")).as("sum_w_ppm"))
      .select(
        col("doc_id"), col("n_tok"), col("sum_w_ppm"),
        (col("sum_w_ppm").cast("double") / (col("n_tok") * lit(1e6))).as("avg_w"),
        (col("sum_w_ppm") > 0).as("target_like"))
  }

  /** Corpus bigram-LM fluency score per doc — the second-order companion
   *  to [[docLogProb]]: the first token scores under the corpus unigram
   *  LM, every subsequent token under p(w₂|w₁) = cnt(w₁w₂)/cnt(w₁·),
   *  all in exact ppm integers (the only floats are the per-probability
   *  `log`s, which both engines evaluate identically on identical
   *  double ratios — the proven docLogProb discipline).
   *
   *  Scale shape: every aggregation is (bigram|token)-vocabulary-grain
   *  with map-side combine — state ∝ observed vocabulary, never corpus
   *  rows; the LM attaches back by equi-join on the bigram key (NOT a
   *  broadcast: at web scale the bigram vocabulary outgrows any driver),
   *  so the whole lineage is shuffle-by-vocabulary-key, skew-bounded by
   *  the df-style frequency cap Zipf puts on any single bigram share.
   */
  def docBigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = docs
      .select(col(idCol).as("doc_id"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("fl"))
      .where(size(col("fl")) > 0)
    // adjacent pairs in one narrow pass; sequence() guards the 1-token
    // case (Spark's sequence(1,0) would generate DESCENDING [1,0])
    val bg = f
      .select(col("doc_id"),
        explode(when(size(col("fl")) >= 2,
          transform(sequence(lit(1), size(col("fl")) - 1),
            i => struct(
              element_at(col("fl"), i).as("w1"),
              element_at(col("fl"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val tok = f.select(col("doc_id"), explode(col("fl")).as("token"))
    val uni = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = uni.agg(sum(col("cnt")).cast("double").as("t"))
    val ulp = uni.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("t")) * 1e6)
          .cast("long").as("ulp_ppm"))
    val bcnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val pref = bcnt.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val blp = bcnt.join(pref, "w1")
      .select(col("w1"), col("w2"),
        round(log(col("c2").cast("double") / col("c1").cast("double")) * 1e6)
          .cast("long").as("blp_ppm"))
    val btf = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val s2 = btf.join(blp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("blp_ppm")).as("s2"), sum(col("tf")).as("nb"))
    val s1 = f.select(col("doc_id"), element_at(col("fl"), 1).as("token"))
      .join(ulp, "token")
      .select(col("doc_id"), col("ulp_ppm"))
    s1.join(s2, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        (lit(1L) + coalesce(col("nb"), lit(0L))).as("n_tok"),
        (col("ulp_ppm") + coalesce(col("s2"), lit(0L))).as("sum_lp_ppm"))
      .withColumn("avg_logp",
        col("sum_lp_ppm").cast("double") / (col("n_tok") * lit(1e6)))
  }

  /** Corpus-level collocation mining: adjacent token pairs ranked by
   *  pointwise mutual information, the phrase-extraction signal
   *  tokenizer and n-gram vocabulary builders use. With per-log ppm
   *  rounding (the docLogProb discipline) the PMI
   *    ln(p(w₁w₂) / (p(w₁)p(w₂)))
   *  becomes pure integer arithmetic:
   *    pmi_ppm = L(c₂) + 2·L(T) − L(T_b) − L(c₁) − L(c₁′).
   *
   *  Scale: all aggregations are vocabulary-grain with map-side
   *  combine; the unigram attach joins are vocabulary-sized equi-joins;
   *  only the already-min-count-filtered pair list reaches the final
   *  global top-k rank (WindowGroupLimit keeps per-partition top-k
   *  below the single-partition sort).
   */
  def collocationsTopK(
      docs: DataFrame, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    val f = docs
      .select(filter(tokens(col(textCol)), t => length(t) > 0).as("fl"))
      .where(size(col("fl")) > 0)
    val tok = f.select(explode(col("fl")).as("token"))
    val uni = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val tT = tok.agg(count(lit(1)).as("t"))
    val bg = f
      .select(explode(when(size(col("fl")) >= 2,
        transform(sequence(lit(1), size(col("fl")) - 1),
          i => struct(
            element_at(col("fl"), i).as("w1"),
            element_at(col("fl"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val tB = bg.agg(count(lit(1)).as("tb"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minCount)
    def lp(c: Column): Column =
      round(log(c.cast("double")) * 1e6).cast("long")
    bc
      .join(uni.select(col("token").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("token").as("w2"), col("c").as("c1b")), "w2")
      .crossJoin(broadcast(tT)).crossJoin(broadcast(tB))
      .withColumn("pmi_ppm",
        lp(col("c2")) + lit(2L) * lp(col("t")) - lp(col("tb")) -
          lp(col("c1")) - lp(col("c1b")))
      // filter the RAW int rank (cast only in the projection): the
      // Filter-over-Window pattern is what plans WindowGroupLimit, so
      // each partition ships only its local top-k to the single sort
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("pmi_ppm").desc, col("w1"), col("w2"))))
      .where(col("rk") <= k)
      .select(col("rk").cast("long").as("rank"),
        col("w1"), col("w2"), col("c2"), col("pmi_ppm"))
  }

  /** Per-doc character-bigram Shannon entropy (nats, ppm integers) — a
   *  gibberish/boilerplate signal: random bytes score high, repeated
   *  padding scores near zero, natural prose sits in a narrow band.
   *
   *  Exact-integer discipline: each ln(count) is rounded to ppm FIRST,
   *  then H·ppm = (n·L(n) − Σ c·L(c)) div n is pure integer arithmetic —
   *  no float-order hazard (the docLogProb rule applied to entropy).
   *
   *  Scale: per-doc bigram histograms are (doc × ≤|Σ|²)-grain aggs with
   *  map-side combine; everything shuffles on doc_id. The explode is
   *  chars-per-doc wide but NARROW (rides the scan); for 100 TB the
   *  histogram fold can move in-row behind a native expression like
   *  WinnowSelect if the explode volume ever dominates — the agg shape
   *  downstream is unchanged.
   */
  def charBigramEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .where(length(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("t")) - 1),
          i => col("t").substr(i, lit(2)))).as("b"))
    def lppm(c: Column): Column =
      round(log(c.cast("double")) * 1e6).cast("long")
    bg.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"), sum(col("c") * lppm(col("c"))).as("scl"))
      .withColumn("ln_ppm", lppm(col("n")))
      .select(col("doc_id"), col("n").as("n_pairs"),
        expr("(n * ln_ppm - scl) div n").as("h_nats_ppm"))
  }

  /** Inverted index at vocabulary grain: per token its document
   *  frequency, total occurrence count, and the first `sampleK` doc ids
   *  of the posting list (comma-joined — an engine-portable prefix
   *  sample of the postings).
   *
   *  Two shuffles, both skew-proof: the (token, doc) occurrence agg
   *  distributes a hot token across its doc keys, and the vocabulary
   *  agg computes df/total with map-side partial combine while
   *  MinKDistinctLongsAgg bounds every partial's posting buffer at
   *  `sampleK` longs — a stopword with billions of postings at 100 TB
   *  never funnels them into one task (the row_number-window
   *  formulation would).
   */
  def invertedIndex(
      docs: DataFrame, idCol: String, textCol: String, sampleK: Int = 10): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("n_occ"))
      .groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        sum(col("n_occ")).as("n_postings"),
        toCol(graft.functions.MinKDistinctLongsAgg(
          toExpr(col("doc_id")), sampleK).toAggregateExpression()).as("p"))
      .select(
        col("token"), col("df"), col("n_postings"),
        concat_ws(",", transform(col("p"), x => x.cast("string"))).as("postings_head"))
  }

  // ---- retrieval second stage: candidate-grain positional ops -------
  // Both take the candidate list as a DRIVER-SIDE Seq by contract: a
  // second stage operates on a first stage's top-k, which is bounded
  // and already on the driver (the ids become a pushed-down point
  // lookup on the corpus — never a corpus scan). Cost is ∝ the
  // candidates' token counts.

  /** Per-candidate query-term positions, 1-based (matches a 1-based
   *  SQL `generate_series` formulation): the shared scaffold of the
   *  positional second-stage ops.
   */
  private def termPositions(
      corpus: DataFrame, idCol: String, textCol: String,
      ids: Seq[Long], terms: Seq[String]): DataFrame =
    corpus
      .where(col(idCol).isin(ids: _*))
      .select(col(idCol).as("doc_id"), posexplode(tokens(col(textCol))))
      .where(col("col").isin(terms: _*))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("token"))

  /** Running last-seen position per query term (the linear min-window
   *  sweep): one window column per term, plus the count of terms seen
   *  so far (`nn`). Window length at a position = pos − least(last) +
   *  1; `least` skips nulls on Spark and DuckDB alike, so callers gate
   *  on how many terms must have appeared.
   */
  private[text] def lastSeenSweep(pos: DataFrame, terms: Seq[String]): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLs = terms.zipWithIndex.foldLeft(pos) { case (df, (t, i)) =>
      df.withColumn(s"l$i", max(when(col("token") === t, col("pos"))).over(w))
    }
    val lCols = terms.indices.map(i => col(s"l$i"))
    withLs
      .withColumn("nn",
        lCols.map(_.isNotNull.cast("long")).reduce(_ + _))
      .withColumn("lmin",
        if (lCols.size == 1) lCols.head else least(lCols: _*))
  }

  /** PERCOLATION (reverse search): match documents against a table of
   *  STORED queries — the alerting shape (saved searches watch a
   *  crawl) and the inverse of ad-hoc retrieval. `queries` is
   *  (query_id, token) rows — registered-rule-grain small by contract,
   *  broadcast onto the docs' distinct (doc, token) pairs — so cost is
   *  one tokenize pass over the DOCS at hand (a batch, a micro-batch,
   *  never the corpus) and no shuffle wider than the match-pair agg. A
   *  query matches when at least `minMatch` of its DISTINCT tokens
   *  appear in the doc (`minMatch = 0` means ALL tokens — conjunctive
   *  percolation). Returns (query_id, doc_id, n_matched, n_terms).
   */
  def percolate(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, minMatch: Int = 0): DataFrame = {
    require(minMatch >= 0, s"bad minMatch: $minMatch")
    val q = queries.select(col("query_id"), col("token")).distinct()
    val qSize = q.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    val dt = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .distinct()
    dt.join(broadcast(q), "token")
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .join(broadcast(qSize), "query_id")
      .where(
        if (minMatch == 0) col("n_matched") === col("n_terms")
        else col("n_matched") >= minMatch)
      .select(col("query_id"), col("doc_id"), col("n_matched"),
        col("n_terms"))
  }

  /** PHRASE PERCOLATION (reverse phrase search): match documents
   *  against STORED PHRASE rules — the alerting shape for exact
   *  phrases ("page me when 'kernel panic' appears in the crawl").
   *  Rules are registered-rule-grain small by contract and ride as
   *  LITERAL expressions: each doc tokenizes ONCE, every rule counts
   *  its occurrences with the same sliding positional scan as phrase
   *  search's verify (adjacent repeats and overlapping self-similar
   *  phrases count exactly), and matches explode row-locally — ZERO
   *  shuffles, ZERO state, so the same function serves a batch, a
   *  micro-batch, or an append-mode stream unchanged. Returns
   *  (query_id, doc_id, n_occurrences), matches only.
   */
  def percolatePhrases(
      docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(Long, String)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 4096,
      s"percolatePhrases takes 1..4096 literal rules (got ${rules.size})")
    val parsed = rules.map { case (q, p) =>
      val toks = p.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      require(toks.nonEmpty, s"rule $q has an empty phrase")
      (q, toks)
    }
    require(parsed.map(_._1).distinct.size == parsed.size,
      "duplicate rule query_ids")
    def occ(toks: Seq[String]): Column = {
      val n = toks.size
      when(size(col("tokens")) >= n,
        size(filter(sequence(lit(1), size(col("tokens")) - n + 1),
          i => toks.zipWithIndex.map { case (t, j) =>
            element_at(col("tokens"), i + j) === t
          }.reduce(_ && _))))
        .otherwise(lit(0)).cast("long")
    }
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tokens"))
      .select(col("doc_id"),
        explode(array(parsed.map { case (q, toks) =>
          struct(lit(q).as("query_id"), occ(toks).as("n_occurrences"))
        }: _*)).as("m"))
      .where(col("m.n_occurrences") > 0)
      .select(col("m.query_id").as("query_id"), col("doc_id"),
        col("m.n_occurrences").as("n_occurrences"))
  }

  /** PROXIMITY RERANK: rescore retrieval candidates by the smallest
   *  token window containing ALL query terms. Candidates carry their
   *  first-stage score; docs missing a term sort after full matches
   *  (n_present DESC, min_window ASC with missing → last, score DESC,
   *  doc_id). min_window is −1 when the doc lacks a term. Returns
   *  (rank, doc_id, n_present, min_window, score_ppm).
   */
  def proximityRerank(
      corpus: DataFrame, idCol: String, textCol: String,
      candidates: Seq[(Long, Long)], terms: Seq[String]): DataFrame = {
    require(candidates.nonEmpty, "proximityRerank with no candidates")
    require(terms.nonEmpty, "proximityRerank with no terms")
    val spark = corpus.sparkSession
    import spark.implicits._
    val scores = broadcast(candidates.toDF("doc_id", "score_ppm"))
    val pos = termPositions(
      corpus, idCol, textCol, candidates.map(_._1), terms)
    val mw = lastSeenSweep(pos, terms)
      .where(col("nn") === terms.size)
      .withColumn("wlen", col("pos") - col("lmin") + 1)
      .groupBy("doc_id").agg(min("wlen").as("min_window"))
    val np = pos.groupBy("doc_id")
      .agg(count_distinct(col("token")).as("n_present"))
    scores.join(np, Seq("doc_id"), "left_outer")
      .join(mw, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("score_ppm"),
        coalesce(col("n_present"), lit(0L)).as("n_present"),
        coalesce(col("min_window"), lit(-1L)).as("min_window"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_present").desc,
          when(col("min_window") === -1L, lit(Long.MaxValue))
            .otherwise(col("min_window")).asc,
          col("score_ppm").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_present"),
        col("min_window"), col("score_ppm"))
  }

  /** SNIPPET EXTRACTION: for each (rank, doc_id) candidate, the
   *  smallest token window containing every query term THE DOC HAS
   *  (validity = seen-term count equals the doc's present-term count —
   *  the all-present generalization of the rerank sweep), tie-resolved
   *  (min length, then min start), padded by `pad` context tokens,
   *  clamped to the doc, and sliced out of the token array. Returns
   *  (rank, doc_id, snip_start, snip_len, snippet); candidates with
   *  no query term at all yield no row.
   */
  def searchSnippets(
      corpus: DataFrame, idCol: String, textCol: String,
      candidates: Seq[(Long, Long)], terms: Seq[String],
      pad: Int = 2): DataFrame = {
    require(candidates.nonEmpty, "searchSnippets with no candidates")
    require(terms.nonEmpty && pad >= 0, "bad terms/pad")
    val spark = corpus.sparkSession
    import spark.implicits._
    val ranks = broadcast(candidates.toDF("rank", "doc_id"))
    val ids = candidates.map(_._2)
    val toks = corpus
      .where(col(idCol).isin(ids: _*))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tokens"))
    val pos = termPositions(corpus, idCol, textCol, ids, terms)
    val np = pos.groupBy("doc_id")
      .agg(count_distinct(col("token")).as("n_present"))
    val win = lastSeenSweep(pos, terms)
      .join(np, "doc_id")
      .where(col("nn") === col("n_present"))
      .withColumn("start", col("lmin"))
      .withColumn("wlen", col("pos") - col("start") + 1)
    val best = win.groupBy("doc_id").agg(min("wlen").as("wlen"))
    val bs = win.join(best, Seq("doc_id", "wlen"))
      .groupBy("doc_id", "wlen").agg(min("start").as("start"))
    ranks.join(bs, "doc_id").join(toks, "doc_id")
      .withColumn("s0", greatest(lit(1L), col("start") - pad))
      .withColumn("e0", least(size(col("tokens")).cast("long"),
        col("start") + col("wlen") - 1 + pad))
      .select(col("rank"), col("doc_id"), col("s0").as("snip_start"),
        (col("e0") - col("s0") + 1).as("snip_len"),
        array_join(slice(col("tokens"), col("s0"),
          col("e0") - col("s0") + 1), " ").as("snippet"))
  }
}
