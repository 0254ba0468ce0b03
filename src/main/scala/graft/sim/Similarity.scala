package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]` cast to
 * double for exact, engine-portable math).
 *
 * Two paths, as a 100 TB pipeline needs:
 *  - brute-force exact top-k (the correctness baseline): broadcast the
 *    (small) query set against the corpus — one scan, no shuffle of the
 *    big side;
 *  - sign-LSH: deterministic md5-derived hyperplanes → sign bits →
 *    banded bit-sum buckets; candidate generation is a bucket-key join
 *    so the work is ∝ bucket collisions, never an n² cross join — and
 *    every ingredient is reproducible in plain SQL (full oracle).
 *
 * All dot products are sequential `aggregate(zip_with(...))` folds —
 * codegen'd, and bit-identical to a sequential `list_sum` fold in the
 * oracle engine.
 */
object Similarity {

  import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Native codegen'd dot product (graft.functions.DotProduct). */
  def dot(a: Column, b: Column): Column =
    toCol(graft.functions.DotProduct(toExpr(a), toExpr(b)))

  /** Squared L2 norm = dot(a, a). */
  def norm2(a: Column): Column = dot(a, a)

  /** Native single-pass cosine (graft.functions.CosineSimilarity). */
  def cosine(a: Column, b: Column): Column =
    toCol(graft.functions.CosineSimilarity(toExpr(a), toExpr(b)))

  /** Higher-order-function formulation of dot — kept as the reference
   *  semantics the native expression must match bit-for-bit (tested).
   */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineFold(a: Column, b: Column): Column = {
    def n2(c: Column) = aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x)
    dotFold(a, b) / (sqrt(n2(a)) * sqrt(n2(b)))
  }

  /** Normalize an embeddings table to (vec_id, v: array<double>). */
  def asDouble(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))

  /**
   * Exact top-k cosine neighbors for a query subset: broadcast the
   * queries, rank with a window per query. Output
   * (q_id, n_id, cos, rank), rank 1..k by (cos desc, n_id).
   */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("v").as("qv")))
    val scored = corpus.select(col("vec_id").as("n_id"), col("v"))
      .crossJoin(q)
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** Deterministic ENGINE-PORTABLE hyperplanes: coefficient (p, d) is
   *  the first 15 hex chars of md5("p_d") scaled to [-1, 1). Any SQL
   *  engine with md5 reproduces the planes exactly (the int→double
   *  conversion rounds identically and the 2^59 divide is an exact
   *  exponent shift), which is what makes the LSH path fully
   *  oracle-checkable. Uniform-cube (not gaussian) plane directions
   *  lose exact rotation invariance, but sign-LSH only needs a
   *  symmetric direction family — collision probability stays
   *  monotone in the pair angle, and final answers always come from
   *  the exact cosine pass.
   */
  def hyperplanes(nBits: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(p: Int, d: Int): Double = {
      val hex = md.digest(s"${p}_${d}".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble / 576460752303423488.0 - 1.0
    }
    Seq.tabulate(nBits)(p => Seq.tabulate(dim)(d => u(p, d)))
  }

  /** Sign-bit signature: array<int> of `v · plane > 0` (0/1). */
  def signBits(v: Column, planes: Seq[Seq[Double]]): Column =
    transform(typedLit(planes), p => (dot(v, p) > 0).cast("int"))

  /** Banded bucket rows (vec_id, band, bucket) for the LSH join. The
   *  bucket is the bit-sum Σ bit_j << j within the band — a plain
   *  integer any engine computes the same way (no engine-private hash),
   *  produced for all bands in one native pass (LshBandBuckets).
   */
  def lshBuckets(
      emb: DataFrame, planes: Seq[Seq[Double]], bands: Int): DataFrame =
    emb.select(
      col("vec_id"), col("v"),
      posexplode(toCol(graft.functions.LshBandBuckets(
        toExpr(col("v")), planes.flatten.toArray, planes.size, bands))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

  /** Near-duplicate pairs with cosine ≥ threshold via LSH candidates +
   *  exact verification (work ∝ candidates).
   */
  def nearDupPairs(
      emb: DataFrame, threshold: Double,
      nBits: Int = 96, bands: Int = 12): DataFrame = {
    val dim = 64
    val buckets = lshBuckets(emb, hyperplanes(nBits, dim), bands)
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("a_id"), col("x.v").as("va"),
        col("y.vec_id").as("b_id"), col("y.v").as("vb"))
      .dropDuplicates("a_id", "b_id")
    cand.withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
  }

  /**
   * IVF (inverted-file) approximate top-k: a deterministic, fully
   * oracle-checkable ANN scale path.
   *
   *  - centroids = every `centroidStep`-th corpus vector (deterministic
   *    — no k-means randomness, so an external engine reproduces the
   *    index exactly);
   *  - every corpus vector is assigned to its nearest centroid by
   *    cosine (tie → lowest centroid id) — a broadcast scan + one
   *    aggregation, no shuffle of pairwise scores;
   *  - a query probes its `nProbe` nearest centroids and ranks exactly
   *    within those cells, so scanned fraction ≈ nProbe/#centroids.
   *
   * At 100 TB the assignment is a write-once index column on the
   * embeddings table (partition/bucket by `cell`), and the probe reads
   * only those partitions.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      centroidStep: Long = 7L, nProbe: Int = 3): DataFrame = {
    // Centroids ARE the index metadata: a bounded small set (stride
    // sample here; k-means in a real build), materialized once on the
    // driver and shipped as a literal — the corpus-side assignment is
    // then a NARROW map (argmax over the centroid array per row), no
    // crossJoin row expansion and no shuffle of the wide vector column.
    // (The earlier crossJoin+groupBy plan moved |corpus| × |centroids|
    // rows carrying the 64-dim vector through a hash agg — a multi-GB
    // shuffle at sf0.1 that would be ruinous at 100 TB.)
    val cents: Array[(Long, Seq[Double])] = corpus
      .where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id"), col("v"))
      .limit(65537) // guard materialization before the size check below
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    // the driver-side collect is only legal because the index is small;
    // a stride that no longer bounds it must fail loudly, not OOM
    require(cents.nonEmpty && cents.length <= 65536,
      s"IVF centroid set must be 1..65536 rows (got ${cents.length}); " +
        "raise centroidStep (or build centroids with k-means) for this corpus")
    val centIds = cents.map(_._1)
    val centVecs = cents.flatMap(_._2.toArray)
    def topCells(v: Column, n: Int): Column =
      toCol(graft.functions.TopCentroids(toExpr(v), centIds, centVecs, n))
    val assigned = corpus.select(
      col("vec_id").as("n_id"), col("v"),
      element_at(topCells(col("v"), 1), 1).as("cell"))
    val probes = queries.select(
      col("vec_id").as("q_id"), col("v").as("qv"),
      explode(topCells(col("v"), nProbe)).as("cell"))
    assigned.join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** LSH-accelerated approximate top-k: exact ranking restricted to
   *  bucket-sharing candidates (the IVF-style scale path; recall < 1 by
   *  construction, bounded by the band parameters).
   */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 96, bands: Int = 12): DataFrame = {
    val planes = hyperplanes(nBits, 64)
    val cb = lshBuckets(corpus, planes, bands)
    val qb = lshBuckets(queries, planes, bands)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("band"), col("bucket"))
    val cand = cb.join(broadcast(qb), Seq("band", "bucket"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("qv"), col("vec_id").as("n_id"), col("v"))
      .dropDuplicates("q_id", "n_id")
    cand.withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }
}
