package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Snapshot-manifest table log — versioned, time-travelable parquet tables
  * (beyond-reference lake lifecycle, the minimal shape of the
  * Delta/Iceberg commit-log idea realized over plain parquet + JSON):
  *
  *  - a table is parquet files under `dir/data` plus `v%05d.json`
  *    manifests under `dir/_graft_log`; manifest vN lists exactly the
  *    data files visible at
  *    version N (absolute membership, not a delta — one manifest read
  *    resolves any snapshot)
  *  - commits are APPEND-ONLY over immutable data files: a new commit
  *    writes fresh part files and a new manifest; no existing file is
  *    ever rewritten, so every historical version stays readable forever
  *    (time travel) and a crashed commit leaves at worst orphan data
  *    files that no manifest references — invisible, and safe to vacuum
  *  - `overwrite = true` starts a new lineage in the SAME log: the new
  *    manifest lists only the new files, while older versions keep
  *    referencing the old ones (logical replace, physical retain)
  *  - manifests publish via an atomic hard-link CAS from a fully-written
  *    temp file; version numbering is multi-writer safe — a writer that
  *    loses the race for vN retries at vN+1 carrying the winner's files
  *    (see [[commit]]; the reference is a single-process CLI, so this is
  *    beyond-reference hardening)
  *
  * Scale posture: snapshot resolution is ONE manifest read (O(files) on
  * the driver, like Delta's checkpointed log), and the data read passes an
  * explicit file list to the parquet scan — no directory listing of an
  * ever-growing table dir, the listing cost that kills naive 100 TB
  * layouts. Readers never see partial commits because visibility IS the
  * manifest. */
object SnapshotLog {

  private def logDir(dir: Path) = dir.resolve("_graft_log")
  private def dataDir(dir: Path) = dir.resolve("data")
  private def manifestPath(dir: Path, v: Int) =
    logDir(dir).resolve(f"v$v%05d.json")

  /** Committed versions, ascending; empty for a fresh directory. */
  def versions(dir: Path): Seq[Int] =
    if (!Files.isDirectory(logDir(dir))) Seq.empty
    else listNames(logDir(dir))
      // only exact v<digits>.json names are manifests — a stray file in
      // _graft_log (say, 'versions.json') must be ignored, not crash
      // every log operation with NumberFormatException
      .collect { case s if s.startsWith("v") && s.endsWith(".json") &&
          s.stripPrefix("v").stripSuffix(".json").forall(_.isDigit) &&
          s.length > "v.json".length =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted

  /** Commit `df` as the next version; returns the new version number.
    *
    * MULTI-WRITER SAFE (round 11; previously documented-not-built): the
    * commit point is a compare-and-swap on the version number, realized
    * as an atomic hard-link publish of the manifest —
    * `Files.createLink(vN.json, tmp)` either creates vN.json or throws
    * `FileAlreadyExistsException`, atomically, unlike rename (POSIX
    * rename REPLACES silently, so the old `require(!exists)` + move was
    * a check-then-act race). A writer that loses the CAS re-reads the
    * log — picking up the winner's files as its carry-over — and retries
    * at the next version, so interleaved committers serialize cleanly:
    * distinct versions, no manifest ever overwritten, every writer's
    * rows in the final lineage ([[SnapshotLogSpec]] runs the race).
    * Data-file names carry a per-commit random token so racing writers
    * can never collide on a data file either (the old version-only
    * prefix let a loser clobber the winner's just-published parts). */
  def commit(df: DataFrame, dir: Path, overwrite: Boolean = false): Int = {
    Files.createDirectories(dataDir(dir))
    Files.createDirectories(logDir(dir))
    // stage next to data/ so promotion is a metadata rename (ParquetSink's
    // same-filesystem staging rule)
    val staging = Files.createTempDirectory(dataDir(dir), ".commit-")
    try {
      df.write.mode("overwrite").option("compression", "zstd")
        .parquet(staging.toString)
      val parts = listNames(staging)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .sorted.map(staging.resolve)
      val attemptV = versions(dir).lastOption.getOrElse(0) + 1
      val token = java.util.UUID.randomUUID().toString.take(8)
      val moved = parts.zipWithIndex.map { case (p, i) =>
        // token-unique target: cannot exist, so no REPLACE_EXISTING — a
        // crashed attempt leaves only unreferenced (vacuumable) orphans
        val name = f"c$attemptV%05d-$token-$i%05d.parquet"
        Files.move(p, dataDir(dir).resolve(name)); name
      }
      // CAS publish loop: each round re-reads the log so the carry-over
      // is the CURRENT latest manifest (a lost race means the winner's
      // files must be carried, not the stale snapshot's). Data files keep
      // their first-attempt name prefix — names are opaque; the manifest
      // is the only membership truth.
      var committed = -1
      while (committed < 0) {
        val prev = versions(dir)
        val v = math.max(attemptV, prev.lastOption.getOrElse(0) + 1)
        val carried =
          if (overwrite) Seq.empty
          else prev.lastOption.map(readManifest(dir, _)).getOrElse(Seq.empty)
        if (tryPublishManifest(dir, v, carried ++ moved)) committed = v
      }
      committed
    } finally deleteRecursively(staging)
  }

  /** Read the table AS OF `asOf` (default: latest committed version). */
  def read(spark: SparkSession, dir: Path, asOf: Option[Int] = None): DataFrame = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"$dir has no committed snapshots")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"version $v does not exist in $dir (have $vs)")
    val files = readManifest(dir, v).map(f => dataDir(dir).resolve(f).toString)
    require(files.nonEmpty,
      s"version $v of $dir is a zero-file snapshot — nothing to read " +
        "(commit an empty result with at least one schema-only part to make it readable)")
    spark.read.parquet(files: _*)
  }

  /** Data files no manifest references (crashed commits, or files orphaned
    * by an overwrite lineage whose old versions were dropped externally) —
    * the vacuum candidate list. Never deletes; callers decide retention. */
  def orphans(dir: Path): Seq[Path] = {
    val referenced = versions(dir).flatMap(readManifest(dir, _)).toSet
    if (!Files.isDirectory(dataDir(dir))) Seq.empty
    else listNames(dataDir(dir))
      .filter(n => n.endsWith(".parquet") && !referenced.contains(n))
      .sorted.map(dataDir(dir).resolve)
      .filter(Files.isRegularFile(_))
  }

  /** Expire all but the newest `keepVersions` manifests, then delete every
    * data file no SURVIVING manifest references. Two-phase on purpose —
    * manifests first, then data — so a crash between the phases leaves
    * only unreferenced-but-present files (invisible, re-vacuumable), never
    * a manifest pointing at deleted data. Returns (expired versions,
    * deleted data files). */
  def vacuum(dir: Path, keepVersions: Int = 1): (Seq[Int], Seq[String]) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val vs = versions(dir)
    val expire = vs.dropRight(keepVersions)
    expire.foreach(v => Files.deleteIfExists(manifestPath(dir, v)))
    val dead = orphans(dir)
    dead.foreach(Files.deleteIfExists(_))
    (expire, dead.map(_.getFileName.toString))
  }

  /** Atomically publish manifest `v`, or report that `v` is taken. The
    * hard link from a fully-written temp file IS the CAS: link creation
    * either succeeds or throws FileAlreadyExistsException atomically at
    * the filesystem layer — there is no observable window where vN.json
    * exists with partial content, and an existing manifest can never be
    * replaced (rename would clobber it silently). */
  private[graft] def tryPublishManifest(
      dir: Path, v: Int, files: Seq[String]): Boolean = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.compact(JsonMethods.render(
      ("version" -> v) ~ ("files" -> files)))
    val target = manifestPath(dir, v)
    val tmp = Files.createTempFile(logDir(dir), ".manifest", ".tmp")
    try {
      Files.writeString(tmp, json)
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  private def readManifest(dir: Path, v: Int): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Files.readString(manifestPath(dir, v)))
    (j \ "files") match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => throw new IllegalStateException(s"malformed manifest v$v in $dir")
    }
  }

  /** Files.list with the stream CLOSED (it holds a directory fd). */
  private def listNames(dir: Path): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator().asScala.map(_.getFileName.toString).toVector
    finally st.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listNames(p).foreach(n => deleteRecursively(p.resolve(n)))
    Files.deleteIfExists(p)
  }
}
