package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local SparkSession for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** ISO-8601 (no zone, interpreted as UTC) → epoch microseconds. */
  def isoUs(iso: String): Long = {
    val ldt = java.time.LocalDateTime.parse(iso)
    ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L +
      ldt.getNano / 1000 % 1000
  }

  /** Build a canonical long DF from (datasetId, iso, value) triples. */
  def longDF(points: Seq[(String, String, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    points.map { case (d, iso, v) => (d, isoUs(iso), v) }
      .toDF("dataset_id", "ts_us", "value")
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Driver-generated small-SF dataset used by the plan-shape and ANN
   *  recall characterization specs. Resolved from the environment so
   *  other checkouts can point elsewhere; specs `assume(hasData)` and
   *  SKIP (not fail) when the directory is absent.
   */
  val dataDir: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

  def hasData: Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dataDir))
}
