package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * The manifest store's commit protocol, factored out so every
 * manifest-governed dataset (the rollup/raw store, the persisted dedup
 * index) shares ONE implementation of atomic visibility instead of
 * re-deriving it: a version file `v<N>` lists the live entries; writers
 * publish the next version with create-no-overwrite (atomic on HDFS, a
 * conditional PUT on S3, check-then-create on POSIX — a lost race
 * FAILS LOUDLY instead of silently replacing the other writer's
 * manifest) and losers re-read and retry. See ManifestStore's scaladoc
 * for the full design discussion; semantics here are identical.
 */
final class CommitLog(manifestDir: String) {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def versionPath(v: Long): Path =
    new Path(manifestDir + f"/v$v%012d")

  private def readVersionFile(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Latest snapshot: (version, live entries); (0, Nil) if never written. */
  def latest(spark: SparkSession): (Long, Seq[String]) = {
    val dir = new Path(manifestDir)
    val fs = fsFor(spark, dir)
    if (!fs.exists(dir)) (0L, Seq.empty)
    else {
      val versions = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("v")).map(_.drop(1).toLong)
      if (versions.isEmpty) (0L, Seq.empty)
      else {
        val v = versions.max
        (v, readVersionFile(fs, versionPath(v)))
      }
    }
  }

  /** Live entries AS OF a published version (loud if never published). */
  def liveAt(spark: SparkSession, v: Long): Seq[String] = {
    val p = versionPath(v)
    val fs = fsFor(spark, p)
    require(fs.exists(p), s"manifest version $v was never published at $manifestDir")
    readVersionFile(fs, p)
  }

  /** Optimistic-concurrency publish: compute the next live set from the
   *  current one; `next` returning None ABORTS. Returns true iff a
   *  version was published.
   */
  def commit(spark: SparkSession)(
      next: Seq[String] => Option[Seq[String]]): Boolean = {
    val dir = new Path(manifestDir)
    val fs = fsFor(spark, dir)
    fs.mkdirs(dir)
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 50, s"manifest commit contention at $manifestDir")
      val (v, live) = latest(spark)
      next(live) match {
        case None => return false
        case Some(entries) =>
          val target = versionPath(v + 1)
          try {
            val out = fs.create(target, false) // no overwrite: loser throws
            try out.write((entries.mkString("\n") + "\n").getBytes("UTF-8"))
            finally out.close()
            return true
          } catch {
            case _: java.io.IOException => () // version taken — re-read, retry
          }
      }
    }
    false
  }
}
