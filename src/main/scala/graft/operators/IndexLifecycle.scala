package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption}

/** Shared lifecycle for persisted derived artifacts (the IVF index, the
  * LSH signature table): corpus fingerprinting and build-once publication.
  *
  * Fingerprint: the RECURSIVE part-file listing — (relative name, size,
  * mtime) per regular file — not the top-level path's attributes. A
  * Spark-written dataset is a DIRECTORY whose entry size is ~constant and
  * whose mtime tracks only top-level churn, so an in-place content rewrite
  * that keeps part-file names would slip past a path-level fingerprint and
  * silently serve a stale index; per-file size+mtime catches it.
  *
  * Publication: builds land in a private staging dir and are atomically
  * renamed into place, so a finished dir is always complete. Two JVMs may
  * race to build the same index (Verify and a test run); each stages
  * privately and the rename loser discards its build — builds are
  * deterministic by construction (hash-rank seeds, fixed shapes), so the
  * racing artifacts are equivalent (identical up to floating-point
  * partial-aggregate merge order where means are involved) and whichever
  * lands serves correctly.
  */
object IndexLifecycle {

  /** Content fingerprint of a dataset path (file or directory), memoized
    * per JVM: probes call ensure() → indexDir() → fingerprint() on every
    * execution, and an O(part-files) recursive stat walk inside every
    * timed probe would defeat the point of the persisted index at the
    * very file counts (thousands of part files) where it matters. The
    * window this opens — a corpus rewritten IN PLACE, MID-JVM, serves
    * the stale index until restart — is the same window Spark's own
    * file-listing caches accept; cross-run staleness (the dangerous,
    * silent kind) is still caught because a fresh JVM always walks. */
  private val fingerprintMemo =
    new java.util.concurrent.ConcurrentHashMap[Path, String]()

  def fingerprint(src: Path): String =
    fingerprintMemo.computeIfAbsent(src.toAbsolutePath, computeFingerprint)

  private def computeFingerprint(src: Path): String =
    if (!Files.exists(src)) "absent"
    else if (Files.isRegularFile(src))
      s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
    else {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(src)
      val entries =
        try walk.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(p => s"${src.relativize(p)}:${Files.size(p)}:" +
            s"${Files.getLastModifiedTime(p).toMillis}")
          .toSeq.sorted
        finally walk.close()
      scala.util.hashing.MurmurHash3.orderedHash(entries).toHexString
    }

  /** Index directory for a derived artifact: a pure function of (dataset
    * path, content fingerprint, recipe string), rooted at `envVar` when
    * set else a tmp-dir subdirectory. Shared by IvfIndex/LshIndex so the
    * keying recipe cannot drift between artifacts. */
  def keyedDir(envVar: String, defaultRootName: String, datasetFile: Path,
      recipe: String): Path = {
    val root = java.nio.file.Paths.get(
      sys.env.getOrElse(envVar,
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/" + defaultRootName))
    val src = datasetFile.toAbsolutePath
    val key = scala.util.hashing.MurmurHash3.stringHash(
      s"$src|${fingerprint(src)}").toHexString
    root.resolve(s"$recipe-$key")
  }

  /** Run `build` into a fresh private staging sibling of `dir`, then
    * atomically publish. No-op if `dir` already exists. Any exit that does
    * not land the rename removes the staging dir — a failed build (OOM,
    * disk full, interrupt) must not leave near-corpus-sized orphans
    * accumulating under the index root. */
  def ensureBuilt(dir: Path)(build: Path => Unit): Path = synchronized {
    if (!Files.isDirectory(dir)) {
      val staging = dir.resolveSibling(
        dir.getFileName.toString + ".staging-" +
          java.util.UUID.randomUUID().toString.take(8))
      var renamed = false
      try {
        build(staging)
        try {
          Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
          renamed = true
        } catch {
          case _: java.nio.file.FileSystemException if Files.isDirectory(dir) =>
            // a concurrent builder won; its equivalent index is in place
        }
      } finally {
        if (!renamed && Files.isDirectory(staging))
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
      }
    }
    dir
  }
}
