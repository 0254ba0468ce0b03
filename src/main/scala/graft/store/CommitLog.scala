package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * The manifest store's commit protocol, factored out so every
 * manifest-governed dataset (the rollup/raw store, the persisted dedup
 * index) shares ONE implementation of atomic visibility instead of
 * re-deriving it: a version file `v<N>` lists the live entries; writers
 * publish the next version with an atomic create-exclusive (hard-link
 * publish on POSIX, rename-no-replace on HDFS, a conditional PUT on
 * S3 — a lost race FAILS LOUDLY instead of silently replacing the
 * other writer's manifest, see [[publishExclusive]]) and losers
 * re-read and retry. See ManifestStore's scaladoc for the full design
 * discussion; semantics here are identical.
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

  /** Atomically publish `body` at `target`, returning false iff the
   *  version already exists (a lost race). The content must be COMPLETE
   *  the instant the target becomes visible — readers race `latest()`
   *  against publishes, and a torn version file would silently truncate
   *  the live set.
   *
   *  - `file://`: Hadoop's local `create(overwrite = false)` is a
   *    non-atomic exists-check-then-create — two racing writers can
   *    BOTH pass the check and both report success while one manifest
   *    silently vanishes (observed as a 6-writer race publishing 4
   *    versions). POSIX's atomic create-exclusive primitive is
   *    link(2): write a temp file, hard-link it to the target (EEXIST
   *    loses, content complete before the name appears), unlink the
   *    temp.
   *  - everything else: write a temp file and rename-no-replace into
   *    place — atomic fail-if-exists on HDFS; object stores need a
   *    conditional-PUT-backed FileSystem for the same guarantee.
   */
  private def publishExclusive(
      fs: FileSystem, target: Path, body: Array[Byte]): Boolean =
    if (Option(fs.getUri.getScheme).forall(_ == "file")) {
      val dir = java.nio.file.Paths.get(target.getParent.toUri.getPath)
      val tmp = dir.resolve(
        s".${target.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp, body)
      try {
        java.nio.file.Files.createLink(dir.resolve(target.getName), tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally {
        java.nio.file.Files.deleteIfExists(tmp): Unit
      }
    } else {
      val tmp = new Path(target.getParent,
        s".${target.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(body) finally out.close()
      val ok =
        try fs.rename(tmp, target)
        catch { case _: java.io.IOException => false }
      if (!ok) fs.delete(tmp, false): Unit
      ok
    }

  /** ZERO-COPY CLONE of a manifest-governed dataset as of a published
   *  version — the generic core every dataset's branch operation
   *  shares (the rollup store, the text/dedup/IVF indexes): hard-link
   *  every data dir the version references from `srcDataDir` into
   *  `dstDataDir` (bytes shared, names independent — commit dirs are
   *  immutable once published, so neither side's compaction or vacuum
   *  can reach the other through a shared inode), then publish the
   *  as-of live set — `#txn:` keys included, so exactly-once history
   *  branches with the data — as the destination log's first version.
   *  Cost ∝ live file COUNT, zero bytes moved; non-POSIX filesystems
   *  fall back to a byte copy with the same semantics. Loud on an
   *  unpublished version, a vacuumed snapshot, or a non-empty
   *  destination.
   */
  def cloneAsOf(
      spark: SparkSession, srcDataDir: String, dstDataDir: String,
      dstLog: CommitLog, version: Long): Unit = {
    require(dstLog.latest(spark)._1 == 0L,
      s"cannot branch into $dstDataDir — the destination already has " +
        "published versions (branch into a fresh root)")
    val live = liveAt(spark, version)
    val dirs = live.filterNot(_.startsWith("#txn:"))
    require(dirs.nonEmpty, s"version $version has no data commits")
    val conf = spark.sessionState.newHadoopConf()
    dirs.foreach { d =>
      val p = new Path(s"$srcDataDir/$d")
      require(p.getFileSystem(conf).exists(p),
        s"commit $d of version $version was vacuumed — snapshots below " +
          "the retention floor cannot branch")
    }
    val fs = new Path(srcDataDir).getFileSystem(conf)
    val localFs = Option(fs.getUri.getScheme).forall(_ == "file")
    for (d <- dirs) {
      if (localFs) {
        import java.nio.file.{Files, Paths}
        val from = Paths.get(new Path(s"$srcDataDir/$d").toUri.getPath)
        val to = Paths.get(new Path(s"$dstDataDir/$d").toUri.getPath)
        val walk = Files.walk(from)
        try walk.forEach { p =>
          val t = to.resolve(from.relativize(p))
          if (Files.isDirectory(p)) Files.createDirectories(t): Unit
          else Files.createLink(t, p): Unit
        } finally walk.close()
      } else
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new Path(s"$srcDataDir/$d"),
          fs, new Path(s"$dstDataDir/$d"), false, conf): Unit
    }
    val published = dstLog.commit(spark) { now =>
      if (now.nonEmpty) None else Some(live) // raced writer — abort
    }
    if (!published) {
      for (d <- dirs) {
        val p = new Path(s"$dstDataDir/$d")
        p.getFileSystem(conf).delete(p, true): Unit
      }
      require(published,
        s"cannot branch into $dstDataDir — a concurrent writer " +
          "published there first (branch into a fresh root)")
    }
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
    // the retry backstop counts attempts WITHOUT system-wide progress:
    // losing a race means someone ELSE published (healthy contention —
    // reset), so this only fires when the version stops moving and our
    // publishes still fail, i.e. a genuinely wedged filesystem
    var stalled = 0
    var lastSeen = -1L
    while (true) {
      val (v, live) = latest(spark)
      stalled = if (v != lastSeen) 1 else stalled + 1
      lastSeen = v
      require(stalled <= 50,
        s"manifest commit wedged at $manifestDir: 50 failed publishes " +
          s"with no version progress (stuck at v$v)")
      next(live) match {
        case None => return false
        case Some(entries) =>
          val body = (entries.mkString("\n") + "\n").getBytes("UTF-8")
          if (publishExclusive(fs, versionPath(v + 1), body)) return true
        // version taken — re-read, retry
      }
    }
    false
  }
}
