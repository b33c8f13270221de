package graft

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ParquetSink
import scala.jdk.CollectionConverters._

/** Parquet footer parity: row-group statistics (integration.rs:3990-4025),
  * per-column encoding control (main.rs:188-196), writer version, and
  * compression codec — verified by reading the written file's footer with
  * parquet-mr directly, the same way the reference tests shell out to
  * parquet-schema/parquet-read. */
class FooterSpec extends AnyFunSuite {
  import TestSession._

  private def footer(path: java.nio.file.Path) =
    ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path.toString), new Configuration())).getFooter

  test("row-group statistics carry min/max (stats parity)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-footer").resolve("stats.par")
    ParquetSink.write(Seq("aaa", "zzz", "mmm").toDF("a"), out.toString, ParquetSink.Options())
    val cols = footer(out).getBlocks.asScala.head.getColumns.asScala
    val st = cols.head.getStatistics
    assert(new String(st.getMinBytes) == "aaa")
    assert(new String(st.getMaxBytes) == "zzz")
  }

  test("default compression is zstd; level is configurable") {
    val out = Files.createTempDirectory("graft-footer").resolve("z.par")
    ParquetSink.write(Tables.region(spark, sf), out.toString,
      ParquetSink.Options(compressionLevel = Some(3)))
    val codecs = footer(out).getBlocks.asScala.head.getColumns.asScala
      .map(_.getCodec.toString).toSet
    assert(codecs == Set("ZSTD"))
  }

  private def encodings(p: java.nio.file.Path, col: String) =
    footer(p).getBlocks.asScala.head.getColumns.asScala
      .find(_.getPath.toDotString == col).get.getEncodings.asScala.map(_.toString).toSet

  test("v2 writer (reference default): delta for plain columns, dictionary where it wins") {
    val out = Files.createTempDirectory("graft-footer").resolve("v2.par")
    ParquetSink.write(Tables.part(spark, sf), out.toString, ParquetSink.Options())
    assert(encodings(out, "p_partkey").contains("DELTA_BINARY_PACKED"))
    assert(encodings(out, "p_type").contains("RLE_DICTIONARY"))
  }

  test("per-column dictionary encoding can be disabled (column-encoding parity)") {
    val out1 = Files.createTempDirectory("graft-footer").resolve("dict.par")
    ParquetSink.write(Tables.part(spark, sf), out1.toString, ParquetSink.Options())
    val out2 = Files.createTempDirectory("graft-footer").resolve("nodict.par")
    ParquetSink.write(Tables.part(spark, sf), out2.toString,
      ParquetSink.Options(columnDictionary = Map("p_type" -> false)))
    assert(encodings(out1, "p_type").exists(_.contains("DICTIONARY")))
    assert(!encodings(out2, "p_type").exists(_.contains("DICTIONARY")))
    // the untouched column keeps its dictionary
    assert(encodings(out2, "p_brand").exists(_.contains("DICTIONARY")))
  }
}
