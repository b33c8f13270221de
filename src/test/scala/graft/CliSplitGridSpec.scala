package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Cli
import scala.jdk.CollectionConverters._

/** The reference's file-splitting grid, end-to-end at the CLI surface
  * (integration.rs:1352-1698): every cell of
  * {no rows, rows} × {--no-empty-file, default} × {no split,
  * --row-groups-per-file, --file-size-threshold} drives `Cli.parse` +
  * `Cli.runQuery` and asserts the reference's observable contract —
  * file presence/absence, `_NN` zero-padded extension-preserving
  * numbering from 1, per-file row caps, and schema-only files for empty
  * results. The file-COUNT deviation is deliberate and documented in
  * `ParquetSink`: parallel task writers may split a batch across more
  * files than the reference's single-process writer, so the pinned
  * invariants are per-file caps + contiguous numbering + exact union,
  * not an exact file count. */
class CliSplitGridSpec extends AnyFunSuite {
  import TestSession._

  private def tmp(): Path = Files.createTempDirectory("graft-grid")

  private val emptySql = "SELECT n_nationkey FROM nation WHERE n_nationkey < 0"
  private val rowsSql = "SELECT n_nationkey FROM nation ORDER BY n_nationkey"

  private def run(out: Path, sql: String, extra: String*): Seq[Path] = {
    val (cmd, conf) = Cli.parse(
      Seq("query", "--tables-dir", sf) ++ extra ++ Seq(out.toString, sql))
    assert(cmd == "query")
    Cli.runQuery(conf, Some(spark))
  }

  private def filesIn(dir: Path): Seq[String] =
    Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith(".")).toSeq.sorted

  test("no rows + --no-empty-file: no file at all, with and without splitting") {
    // integration.rs:1352 (plain) and :1396 (the split-files regression:
    // --no-empty-file must suppress the SUFFIXED names too)
    for (split <- Seq(Seq.empty[String],
        Seq("--row-groups-per-file", "1", "--batch-size-row", "10"),
        Seq("--file-size-threshold", "1B", "--batch-size-row", "10"))) {
      val dir = tmp()
      val out = dir.resolve("out.par")
      val written = run(out, emptySql, "--no-empty-file" +: split: _*)
      assert(written.isEmpty, s"split=$split must write nothing")
      assert(filesIn(dir).isEmpty,
        s"split=$split left files behind: ${filesIn(dir)}")
    }
  }

  test("no rows without the flag: schema-only file at the exact path") {
    for (split <- Seq(Seq.empty[String],
        Seq("--row-groups-per-file", "1", "--batch-size-row", "10"))) {
      val dir = tmp()
      val out = dir.resolve("out.par")
      val written = run(out, emptySql, split: _*)
      assert(written == Seq(out), s"split=$split: expected exactly $out")
      val back = spark.read.parquet(out.toString)
      assert(back.count() == 0)
      assert(back.schema.fieldNames.toSeq == Seq("n_nationkey"),
        "schema-only file must carry the result schema (parquet_writer.rs:117-121)")
    }
  }

  test("rows despite --no-empty-file: the file is written (integration.rs:1438)") {
    val dir = tmp()
    val out = dir.resolve("out.par")
    val written = run(out, rowsSql, "--no-empty-file")
    assert(written == Seq(out))
    assert(spark.read.parquet(out.toString).count() == 25)
  }

  test("row-group splitting: contiguous _NN numbering from 1, per-file cap, exact union") {
    // integration.rs:1513 + 1567 (numbering must start at 1); our cap is
    // rows-per-file = row-groups-per-file × batch-size-row
    val dir = tmp()
    val out = dir.resolve("out.par")
    val written = run(out, rowsSql,
      "--batch-size-row", "3", "--row-groups-per-file", "2", "--no-empty-file")
    assert(written.size >= 4, s"25 rows / cap 6 → ≥4 files (≥⌈25/6⌉ with parallel writers), got ${written.size}")
    val expectedNames = (1 to written.size).map(i => f"out_$i%02d.par")
    assert(written.map(_.getFileName.toString) == expectedNames,
      s"naming must be contiguous from _01: ${written.map(_.getFileName)}")
    val perFile = written.map(p => spark.read.parquet(p.toString).count())
    assert(perFile.forall(_ <= 6), s"per-file cap exceeded: $perFile")
    val union = spark.read.parquet(written.map(_.toString): _*)
    assert(union.count() == 25)
    assert(union.agg(countDistinct(col("n_nationkey"))).head.getLong(0) == 25)
  }

  test("size-threshold splitting: every file numbered, threshold reached → new file") {
    // integration.rs:1612 — 1B threshold means every batch starts a new file
    val dir = tmp()
    val out = dir.resolve("out.par")
    val written = run(out, rowsSql,
      "--batch-size-row", "10", "--file-size-threshold", "1B")
    assert(written.size >= 2)
    assert(written.map(_.getFileName.toString) ==
      (1 to written.size).map(i => f"out_$i%02d.par"))
    assert(spark.read.parquet(written.map(_.toString): _*).count() == 25)
  }

  test("configurable suffix length (integration.rs:1656)") {
    val dir = tmp()
    val out = dir.resolve("out.par")
    val written = run(out, rowsSql,
      "--batch-size-row", "10", "--file-size-threshold", "1B",
      "--suffix-length", "4")
    assert(written.head.getFileName.toString == "out_0001.par")
  }
}
