package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-JVM parquet schema cache's invalidation contract (round 17):
  * the key is a RECURSIVE Hadoop-FileSystem fingerprint — (path, mtime,
  * len) of every file under the path — so an in-place rewrite of a
  * NESTED part file (same file name, new bytes) misses the cache. The
  * round-16 shape keyed only the top-level listing via java.io.File,
  * which (a) could serve a stale schema for partitioned/nested dirs and
  * (b) degenerated to path-only keys on non-`file:` URIs; the Hadoop
  * API path works on any storage the session can read. */
class SchemaCacheSpec extends AnyFunSuite {
  import TestSession._

  private def writeOnePart(df: org.apache.spark.sql.DataFrame,
      dest: java.nio.file.Path): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-scs")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("w").toString)
      val part = {
        val l = java.nio.file.Files.list(tmp.resolve("w"))
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
        } finally l.close()
      }
      java.nio.file.Files.copy(part, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("nested in-place part-file rewrite invalidates the cached schema") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-scs-root")
    try {
      val sub = root.resolve("bucket=1")
      java.nio.file.Files.createDirectories(sub)
      val part = sub.resolve("part-00000.parquet")
      writeOnePart(Seq((1L, "a")).toDF("id", "v_one"), part)
      val s1 = Tables.cachedParquet(spark, root.toString).schema
      assert(s1.fieldNames.contains("v_one"))
      // in-place rewrite: SAME file name, different schema — the nested
      // file's (mtime, len) change is the only signal; the subdir entry
      // the old one-level key looked at may not change at all
      writeOnePart(Seq((1L, "a", true)).toDF("id", "v_two", "flag"), part)
      val s2 = Tables.cachedParquet(spark, root.toString).schema
      assert(s2.fieldNames.contains("v_two") && !s2.fieldNames.contains("v_one"),
        s"stale schema served after nested rewrite: $s2")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("scheme-qualified URIs key through the Hadoop FileSystem API") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-scs-uri")
    try {
      val f = root.resolve("t.parquet")
      writeOnePart(Seq((7L, 1.5)).toDF("id", "x"), f)
      // file:-scheme URI — java.io.File keying would have returned
      // mtime/len 0 here and collapsed the key to the path string
      val uri = f.toUri.toString
      val s1 = Tables.cachedParquet(spark, uri).schema
      assert(s1.fieldNames.sorted.sameElements(Array("id", "x")))
      writeOnePart(Seq((7L, "s")).toDF("id", "y"), f)
      val s2 = Tables.cachedParquet(spark, uri).schema
      assert(s2.fieldNames.contains("y"),
        s"stale schema served for scheme-qualified URI: $s2")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }
}
