package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Bigram-LM fluency and char-bigram entropy semantics on corpora
  * small enough to hand-compute every ppm integer.
  */
class TextLmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def docs(texts: String*) = {
    val sp = spark
    import sp.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def lppm(x: Double): Long = math.round(math.log(x) * 1e6)

  test("bigram LM scores first token unigram, rest conditional") {
    // corpus: "a b", "a b", "a c" → unigram a=3/6, bigrams ab=2/3 ac=1/3
    val out = TextOps.docBigramLogProb(docs("a b", "a b", "a c"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val ua = lppm(3.0 / 6)   // ln(1/2)
    val ab = lppm(2.0 / 3)
    val ac = lppm(1.0 / 3)
    assert(out(0).getLong(1) == 2L)            // n_tok
    assert(out(0).getLong(2) == ua + ab)       // sum_lp_ppm
    assert(out(2).getLong(2) == ua + ac)
    assert(out(0).getDouble(3) == (ua + ab).toDouble / 2e6)
  }

  test("single-token doc scores unigram only; empty doc drops") {
    val out = TextOps.docBigramLogProb(docs("a a b", "b", ""), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2) // empty doc excluded
    // corpus tokens: a,a,b,b → unigram b = 2/4; doc 1 = just "b"
    assert(out(1).getLong(1) == 1L)
    assert(out(1).getLong(2) == lppm(2.0 / 4))
  }

  test("multiple spaces collapse: filtered token sequence is adjacent") {
    // "a  b" tokenizes to [a, "", b] → filtered [a, b]: ONE bigram (a,b),
    // same as "a b" — adjacency is over the filtered sequence
    val o1 = TextOps.docBigramLogProb(docs("a  b", "a b"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(o1(0).getLong(1) == o1(1).getLong(1))
    assert(o1(0).getLong(2) == o1(1).getLong(2))
  }

  test("char entropy: constant run is 0, alternation matches closed form") {
    val out = TextOps.charBigramEntropy(docs("aaaa", "abab", "x"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2) // 1-char doc has no bigrams
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 0L)
    // "abab": bigrams ab×2, ba×1; H = (3·L(3) − (2·L(2) + 1·L(1))) div 3
    val h = (3L * lppm(3) - 2L * lppm(2)) / 3L
    assert(out(1).getLong(2) == h)
  }

  test("entropy is permutation-invariant at the histogram grain") {
    val out = TextOps.charBigramEntropy(docs("aabb", "bbaa"), "doc_id", "text")
      .orderBy("doc_id").collect()
    // both have histogram {aa:1, ab|ba:1, bb:1} → same entropy
    assert(out(0).getLong(2) == out(1).getLong(2))
  }
}
