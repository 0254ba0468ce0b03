package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/**
 * Native vector expressions (graft.functions): the codegen'd
 * DotProduct/CosineSimilarity must match the higher-order-function
 * formulation bit-for-bit (same sequential accumulation order), handle
 * nulls, and be callable from SQL via the session extension hook.
 */
class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    (0L until 50L).map(i => (i, Seq.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
  }

  test("native dot/cosine are bit-identical to the fold formulation") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("dn"),
        Similarity.dotFold(col("a.v"), col("b.v")).as("df"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cn"),
        Similarity.cosineFold(col("a.v"), col("b.v")).as("cf"))
    val bad = pairs.where(col("dn") =!= col("df") || col("cn") =!= col("cf")).count()
    assert(bad == 0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL registration via GraftExtensions function builders") {
    // same injection the extension performs, applied to the live session
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(args(0), args(1)),
      "scala_udf")
    vecs.createOrReplaceTempView("fn_vecs")
    val r = spark.sql(
      """SELECT a.vec_id, b.vec_id, vec_cosine(a.v, b.v) AS c
        |FROM fn_vecs a JOIN fn_vecs b ON a.vec_id = 0 AND b.vec_id = 0""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }
}
