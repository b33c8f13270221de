package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotLog
import scala.jdk.CollectionConverters._

/** Structural contract of the snapshot-manifest log behind e24:
  * append-only immutability (time travel's precondition), overwrite as a
  * logical-not-physical replace, and orphan detection. Value-level
  * visibility is gated by e24's DuckDB oracle. */
class SnapshotLogSpec extends AnyFunSuite {
  import TestSession._

  private def sha(p: java.nio.file.Path): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString

  test("commits never rewrite existing data files; every old version stays readable") {
    val dir = Files.createTempDirectory("graft-snap")
    val nation = Tables.nation(spark, sf)
    SnapshotLog.commit(nation.filter(col("n_nationkey") < 10), dir)
    val dataDir = dir.resolve("data")
    val before = Files.list(dataDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> sha(p)).toMap
    SnapshotLog.commit(nation.filter(col("n_nationkey") >= 10), dir)
    val after = Files.list(dataDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> sha(p)).toMap
    assert(SnapshotLog.versions(dir) == Seq(1, 2))
    before.foreach { case (name, digest) =>
      assert(after.get(name).contains(digest),
        s"commit 2 rewrote or removed $name — time travel broken")
    }
    assert(SnapshotLog.read(spark, dir, Some(1)).count() == 10)
    assert(SnapshotLog.read(spark, dir).count() == 25)
    assert(SnapshotLog.orphans(dir).isEmpty)
  }

  test("overwrite starts a new lineage logically; old versions keep their files physically") {
    val dir = Files.createTempDirectory("graft-snap")
    val nation = Tables.nation(spark, sf)
    SnapshotLog.commit(nation, dir)
    SnapshotLog.commit(nation.filter(col("n_nationkey") < 5), dir, overwrite = true)
    assert(SnapshotLog.versions(dir) == Seq(1, 2))
    assert(SnapshotLog.read(spark, dir).count() == 5, "latest sees only the overwrite")
    assert(SnapshotLog.read(spark, dir, Some(1)).count() == 25, "v1 still reads the full table")
  }

  test("missing versions and stray files are surfaced, not silently absorbed") {
    val dir = Files.createTempDirectory("graft-snap")
    intercept[IllegalArgumentException](SnapshotLog.read(spark, dir))
    SnapshotLog.commit(Tables.region(spark, sf), dir)
    intercept[IllegalArgumentException](SnapshotLog.read(spark, dir, Some(7)))
    // a crashed commit's debris: data file no manifest references
    Files.writeString(dir.resolve("data").resolve("c99999-00000.parquet"), "junk")
    assert(SnapshotLog.orphans(dir).map(_.getFileName.toString) ==
      Seq("c99999-00000.parquet"))
    // ...and it is invisible to every read
    assert(SnapshotLog.read(spark, dir).count() == Tables.region(spark, sf).count())
  }
}
