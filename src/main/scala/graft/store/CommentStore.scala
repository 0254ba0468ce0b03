package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * S12 / P5 / F7 / F14 / O3 — the comments ("marks") annotation store.
 *
 * The reference keeps all comments in one date-sorted file, rewritten on
 * every mutation (src/marks.py:31, 84-91, 144-181), assigns nanosecond
 * ids at create (src/marks.py:82), rejects `;` in fields (its CSV
 * delimiter, src/marks.py:74-79), and serves range + tag-subset queries
 * capped at 20 (src/marks.py:34-63).
 *
 * Spark shape: a tiny dimension table (Parquet), rewritten sorted on
 * mutation — broadcast-sized by construction, so if it is ever joined to
 * fact data it broadcasts. Ids are assigned at the API layer, never
 * inside a distributed job (SURVEY §7.4.5).
 */
object CommentStore {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("date_us", LongType),
    StructField("text", StringType),
    StructField("tags", ArrayType(StringType))))

  /** Field validation mirroring marks.py:74-79 (no `;` anywhere). */
  def validate(text: String, tags: Seq[String]): Unit =
    require(!(text +: tags).exists(_.contains(";")), "fields may not contain ';'")

  def load(spark: SparkSession, path: String): DataFrame =
    if (StoreFs.exists(spark, path))
      spark.read.parquet(path).select(
        col("id").cast(LongType), col("date_us").cast(LongType),
        col("text"), col("tags"))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** O3 — full sorted rewrite, the reference's write path (marks.py:163-181).
   *  coalesce-then-sortWithinPartitions: a single-partition local sort is
   *  the same global order as `orderBy` without the range-partitioner
   *  SAMPLING job a global sort schedules first — one job per mutation,
   *  not two (the store is broadcast-small by construction). The
   *  tmp-write + swap goes through the Hadoop FileSystem API so the
   *  store works on HDFS/S3 paths, not just the local filesystem.
   */
  private def rewrite(df: DataFrame, path: String): Unit = {
    val tmp = path + ".tmp"
    df.coalesce(1).sortWithinPartitions(col("date_us"), col("id"))
      .write.mode("overwrite").parquet(tmp)
    StoreFs.replace(df.sparkSession, tmp, path)
  }

  def create(
      spark: SparkSession, path: String,
      id: Long, dateUs: Long, text: String, tags: Seq[String]): Unit = {
    validate(text, tags)
    import spark.implicits._
    val row = Seq((id, dateUs, text, tags)).toDF("id", "date_us", "text", "tags")
    rewrite(load(spark, path).unionByName(row), path)
  }

  def update(
      spark: SparkSession, path: String,
      id: Long, dateUs: Long, text: String, tags: Seq[String]): Unit = {
    validate(text, tags)
    import spark.implicits._
    val row = Seq((id, dateUs, text, tags)).toDF("id", "date_us", "text", "tags")
    rewrite(load(spark, path).where(col("id") =!= id).unionByName(row), path)
  }

  def delete(spark: SparkSession, path: String, id: Long): Unit =
    rewrite(load(spark, path).where(col("id") =!= id), path)

  /**
   * P5 — comments with start ≤ date ≤ end whose tags are a superset of
   * every requested tag (marks.py:54-58), date order, cap 20
   * (marks.py:39).
   */
  def query(
      comments: DataFrame, startUs: Long, endUs: Long,
      tags: Seq[String], maxHits: Int = 20): DataFrame = {
    val tagPred =
      if (tags.isEmpty) lit(true)
      else size(array_except(
        array(tags.map(lit): _*), col("tags"))) === 0
    comments
      .where(col("date_us").between(startUs, endUs) && tagPred)
      .orderBy(col("date_us"), col("id"))
      .limit(maxHits)
  }
}
