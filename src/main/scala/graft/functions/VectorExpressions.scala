package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Native Catalyst expressions for the embedding hot path.
 *
 * Spark's higher-order functions (`aggregate`, `zip_with`) fall out of
 * whole-stage codegen and evaluate lambdas row-at-a-time; for a 64-dim
 * dot product inside an ANN candidate join that interpretation overhead
 * dominates. These expressions compile to a tight primitive loop via
 * `doGenCode` — the "custom Expression beats composition" case.
 *
 * Accumulation order is the same sequential left-to-right fold as both
 * the `aggregate(zip_with(...))` composition and DuckDB's
 * `list_sum(list_transform(...))`, so results are bit-identical to the
 * oracle formulation. Elements are assumed non-null (the engine casts
 * from non-null float parquet vectors).
 */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** Σ a_i * b_i over the common prefix of two double arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in ONE pass over both
 *  arrays (three accumulators), each accumulated in the same sequential
 *  order as the separate-sum oracle formulation.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}

/**
 * Top-n nearest centroids by cosine for one vector, over a DRIVER-SIDE
 * centroid table baked into the expression (ids + row-major flattened
 * vectors): the IVF assignment/probe primitive. Returns array<long> of
 * centroid ids ordered by (cos desc, id asc).
 *
 * This is the narrow-map formulation of IVF cell assignment: the
 * centroid set is index metadata (bounded small — stride sample or
 * k-means output), so scoring it per row inside whole-stage codegen
 * beats both a crossJoin+groupBy (shuffles the corpus × centroids
 * expansion) and a higher-order `transform` lambda (interpreted
 * per element). Cosine accumulation order matches CosineSimilarity
 * and the oracle's sequential `list_sum` fold bit-for-bit.
 */
case class TopCentroids(
    child: Expression, ids: Array[Long], vecs: Array[Double], n: Int)
    extends UnaryExpression {
  require(ids.nonEmpty && vecs.length % ids.length == 0,
    "flattened centroid matrix must be |ids| × dim")
  require(n >= 1 && n <= ids.length, s"n must be in [1, ${ids.length}]")

  private val dim = vecs.length / ids.length

  /** sqrt of Σx² per centroid, accumulated in array order (same fold
   *  as the oracle's norm) — computed once, shipped with the expr.
   */
  lazy val norms: Array[Double] = Array.tabulate(ids.length) { c =>
    var s = 0.0
    var i = 0
    while (i < dim) { val x = vecs(c * dim + i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: input vector has ${v.numElements()} components, index dim is $dim")
    val m = dim
    var vn = 0.0
    var i = 0
    while (i < m) { val x = v.getDouble(i); vn += x * x; i += 1 }
    val vnorm = math.sqrt(vn)
    val bestCos = new Array[Double](n)
    val bestId = new Array[Long](n)
    var filled = 0
    var c = 0
    while (c < ids.length) {
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v.getDouble(j) * vecs(c * dim + j); j += 1 }
      val cos = dot / (vnorm * norms(c))
      val id = ids(c)
      // insertion position: strictly-better cos, or equal cos + lower id
      var p = filled
      while (p > 0 && (cos > bestCos(p - 1) ||
        (cos == bestCos(p - 1) && id < bestId(p - 1)))) p -= 1
      if (p < n) {
        val last = math.min(filled, n - 1)
        var q = last
        while (q > p) { bestCos(q) = bestCos(q - 1); bestId(q) = bestId(q - 1); q -= 1 }
        bestCos(p) = cos
        bestId(p) = id
        if (filled < n) filled += 1
      }
      c += 1
    }
    new GenericArrayData(bestId.take(filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "double[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val vn = ctx.freshName("vn")
      val vnorm = ctx.freshName("vnorm")
      val bestCos = ctx.freshName("bestCos")
      val bestId = ctx.freshName("bestId")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val id = ctx.freshName("id")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val last = ctx.freshName("last")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "vec_top_centroids: input vector has " + $a.numElements() +
         |    " components, index dim is " + $dim);
         |}
         |int $m = $dim;
         |double $vn = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  double x = $a.getDouble($i); $vn += x * x;
         |}
         |double $vnorm = java.lang.Math.sqrt($vn);
         |double[] $bestCos = new double[$n];
         |long[] $bestId = new long[$n];
         |int $filled = 0;
         |for (int $c = 0; $c < ${ids.length}; $c++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dot += $a.getDouble($i) * $vecsRef[$c * $dim + $i];
         |  }
         |  double $cos = $dot / ($vnorm * $normsRef[$c]);
         |  long $id = $idsRef[$c];
         |  int $p = $filled;
         |  while ($p > 0 && ($cos > $bestCos[$p - 1] ||
         |      ($cos == $bestCos[$p - 1] && $id < $bestId[$p - 1]))) $p--;
         |  if ($p < $n) {
         |    int $last = java.lang.Math.min($filled, $n - 1);
         |    for (int $q = $last; $q > $p; $q--) {
         |      $bestCos[$q] = $bestCos[$q - 1]; $bestId[$q] = $bestId[$q - 1];
         |    }
         |    $bestCos[$p] = $cos;
         |    $bestId[$p] = $id;
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |long[] ${ev.value}Arr = new long[$filled];
         |System.arraycopy($bestId, 0, ${ev.value}Arr, 0, $filled);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}Arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_top_centroids"
}

/**
 * All LSH band buckets for one vector in a single pass: plane p's sign
 * bit is `v · plane_p > 0`, and band b's bucket is the bit-sum
 * Σ_j bit_{b·r+j} << j (r = nBits / bands). Returns array<long> of
 * `bands` buckets — the codegen'd replacement for a higher-order
 * `transform` over a plane literal (interpreted per element) followed
 * by per-band slice arithmetic. Matches Similarity.hyperplanes /
 * lshBuckets semantics and the ann_lsh SQL oracle bit-for-bit (same
 * sequential dot fold, same bit weights).
 */
case class LshBandBuckets(
    child: Expression, planes: Array[Double], nBits: Int, bands: Int)
    extends UnaryExpression {
  require(nBits > 0 && planes.length % nBits == 0,
    "flattened plane matrix must be nBits × dim")
  require(bands > 0 && nBits % bands == 0, "bands must divide nBits")

  private val dim = planes.length / nBits
  private val r = nBits / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: input vector has ${v.numElements()} components, plane dim is $dim")
    val m = dim
    val buckets = new Array[Long](bands)
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var i = 0
      while (i < m) { dot += v.getDouble(i) * planes(p * dim + i); i += 1 }
      if (dot > 0) buckets(p / r) |= 1L << (p % r)
      p += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val buckets = ctx.freshName("buckets")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "vec_lsh_buckets: input vector has " + $a.numElements() +
         |    " components, plane dim is " + $dim);
         |}
         |int $m = $dim;
         |long[] $buckets = new long[$bands];
         |for (int $p = 0; $p < $nBits; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dot += $a.getDouble($i) * $planesRef[$p * $dim + $i];
         |  }
         |  if ($dot > 0) $buckets[$p / $r] |= 1L << ($p % $r);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_lsh_buckets"
}

/** Static kernel behind `MinhashRowSignature` — the whole
 *  tokens→shingles→hashes→component-mins pipeline in one compiled
 *  loop, invoked as a single static call from both eval and codegen.
 */
object MinhashRow {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")
  /** Seed of the second hash family: xxhash64('graft-mh2', s) chains
   *  the literal's hash (seed 42) into the shingle's — identical to
   *  Spark's multi-argument xxhash64 evaluation order.
   */
  private val Seed2: Long =
    XxHash64Function.hash(UTF8String.fromString("graft-mh2"), StringType, 42L)

  def sign(toks: ArrayData, k: Int, shingleK: Int): ArrayData = {
    val n = toks.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    val last = n - shingleK
    while (j <= last) {
      var shingle = toks.getUTF8String(j)
      var m = 1
      while (m < shingleK) {
        shingle = UTF8String.concat(shingle, Space, toks.getUTF8String(j + m))
        m += 1
      }
      val sv = XxHash64Function.hash(shingle, StringType, 42L)
      val hv = XxHash64Function.hash(shingle, StringType, Seed2)
      var i = 0
      while (i < k) {
        val v = sv ^ ((hv << i) | (hv >>> (64 - i)))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/**
 * Per-ROW k-component MinHash signature straight from a document's
 * TOKEN array — the streaming counterpart of `MinhashSignatureAgg`
 * (which needs a groupBy and therefore a shuffle). Identical hash
 * family: shingles are the same space-joined k-grams, sh/h2 are the
 * same xxhash64 calls (the two-argument variant's seed chaining is
 * replicated via `MinhashRow.Seed2`), and component i folds
 * sh XOR rotl64(h2, i) into a running min with Java shift semantics —
 * so the output equals the aggregate's for the same document
 * (spec-asserted).
 *
 * The WHOLE shingle pipeline lives inside this one expression on
 * purpose: building shingles with `transform`/`element_at` over an
 * inlined `split` re-splits the document per element (the shinglesOf
 * scaladoc's 15× warning), and even a materialized shingle array gets
 * re-built per reference after projection collapse. One child = one
 * tokenization, one pass, one static-call codegen. Duplicate shingles
 * need no pre-distinct — a running min is idempotent. Docs shorter
 * than the shingle width yield the neutral all-MaxValue signature
 * (callers filter them, matching the batch path where they simply
 * produce no rows).
 */
case class MinhashRowSignature(child: Expression, k: Int, shingleK: Int = 3)
    extends UnaryExpression {
  require(k >= 1 && k <= 64, "rotation family supports k <= 64")
  require(shingleK >= 1, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    MinhashRow.sign(a.asInstanceOf[ArrayData], k, shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashRow.sign($a, $k, $shingleK);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_row_signature"
}

/**
 * All band buckets of a MinHash signature in ONE pass: bucket b mixes
 * the signature's components [b·r, (b+1)·r) with a 31-multiplier fold.
 * Exists for expression-DAG hygiene, not speed of the mix itself: a
 * `array((0 until bands).map(b => hash(slice(mh, ...))))` formulation
 * references the `mh` EXPRESSION bands times, and after projection
 * collapse each reference re-computes the entire upstream signature —
 * measured 16× the per-doc signing cost in the streaming path (batch
 * paths never hit this: their signature comes out of an aggregation,
 * which materializes). A single-child expression evaluates `mh` once
 * and derives every bucket from the VALUE.
 */
case class MinhashBandBuckets(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands >= 1, "bands must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val mh = a.asInstanceOf[ArrayData]
    val k = mh.numElements()
    // enforce against the ACTUAL width: a declared-k check at the call
    // site cannot see signatures built with a different k, and silently
    // dropping trailing components would mis-bucket, not fail
    if (k % bands != 0) throw new IllegalArgumentException(
      s"minhash_band_buckets: signature width $k not divisible by $bands bands")
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var j = b * r
      val end = j + r
      while (j < end) { h = h * 31L + mh.getLong(j); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.freshName("k")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val h = ctx.freshName("h")
      s"""
         |int $k = $a.numElements();
         |if ($k % $bands != 0) {
         |  throw new IllegalArgumentException(
         |    "minhash_band_buckets: signature width " + $k +
         |    " not divisible by $bands bands");
         |}
         |int $r = $k / $bands;
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 1125899906842597L;
         |  int $j = $b * $r;
         |  int $end = $j + $r;
         |  for (; $j < $end; $j++) { $h = $h * 31L + $a.getLong($j); }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_buckets"
}

/** Static kernel behind `CharHistogram` — one byte pass, invoked as a
 *  single static call from both eval and codegen.
 */
object CharHist {
  import org.apache.spark.unsafe.types.UTF8String

  def count(s: UTF8String, lut: Array[Int], dims: Int): ArrayData = {
    val counts = new Array[Double](dims)
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val idx = lut(s.getByte(i) & 0xff)
      if (idx >= 0) counts(idx) += 1.0
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/**
 * Occurrence counts of each character of an ASCII `alphabet` in one
 * pass over the string's UTF-8 bytes — the text→vector embed kernel of
 * the RAG tier. Semantically identical to the portable SQL
 * formulation `length(s) - length(replace(s, ch, ''))` per alphabet
 * char (ASCII bytes never occur inside multi-byte UTF-8 sequences, so
 * byte counting equals character counting), but ~alphabet-size×
 * cheaper: 64 `replace` calls allocate 64 string copies per row where
 * this expression reads each byte once.
 */
case class CharHistogram(child: Expression, alphabet: String)
    extends UnaryExpression {
  require(alphabet.nonEmpty && alphabet.forall(_ < 128),
    "char_histogram requires a non-empty ASCII alphabet")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  @transient private lazy val lut: Array[Int] = {
    val a = Array.fill(256)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  override def nullSafeEval(a: Any): Any =
    CharHist.count(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      lut, alphabet.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("charHistLut", lut, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharHist.count($a, $lutRef, ${alphabet.length});")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_histogram"
}

/** Static kernel behind `WinnowSelect` — rolling MD5 trailing-min
 *  winnowing in one pass with a w-slot ring buffer.
 */
object WinnowKernel {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  /** Unsigned lexicographic byte compare == hex-string compare (each
   *  byte maps to two hex chars monotonically), so the selection
   *  matches SQL `min(md5(win))` ordering exactly.
   */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    val n = s.numChars() - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    // ring of the trailing w window digests
    val ring = new Array[Array[Byte]](w)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < n) {
      // SQL substr is 1-based chars; substringSQL mirrors it
      val win = s.substringSQL(i + 1, k)
      md.reset()
      val dig = md.digest(win.getBytes)
      ring(i % w) = dig
      // min over the trailing window [max(0, i-w+1), i]
      var min = dig
      var j = math.max(0, i - w + 1)
      while (j < i) {
        val c = ring(j % w)
        if (less(c, min)) min = c
        j += 1
      }
      if (java.util.Arrays.equals(dig, min))
        out += XxHash64Function.hash(win, StringType, 42L)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/**
 * Winnowing window selection straight from the document string: the
 * k-char window at position i is SELECTED iff md5(win_i) is the
 * minimum over the trailing `w` window digests (ties select every
 * minimal position — identical to the SQL `m = min(m) OVER (ROWS w-1
 * PRECEDING)` formulation, which any engine replicates literally).
 * Emits xxhash64 of each selected window (Spark's two-arg seed-42
 * family) in position order, duplicates included — callers `distinct`.
 *
 * One pass, O(w) state, zero shuffle: the per-doc window-function
 * formulation moves every position through a doc-keyed exchange
 * carrying 32-char digests; this expression keeps selection inside the
 * scan so only SELECTED 8-byte fingerprints reach any exchange.
 */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "window width and winnow span must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    WinnowKernel.select(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowKernel.select($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}
