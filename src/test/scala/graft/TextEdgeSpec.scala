package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TypeKernels
import graft.sources.{JdbcSink, ParquetSink}

/** Text edge-case goldens mirroring the reference's interior-NUL and
  * non-ASCII integration tests (integration.rs:1930-1968 `"a\0b"`,
  * :2019-2207 U+00DC across every encoding path): literal values asserted
  * through the parquet sink, the UTF-16 round-trip kernel, and the Derby
  * insert/exec reverse path. Strings are built from explicit code points
  * so the goldens are independent of source-file encoding. */
class TextEdgeSpec extends AnyFunSuite {
  import TestSession._

  // the reference's two goldens plus the harder Unicode classes: CJK,
  // an astral-plane emoji (surrogate pair in UTF-16), combining marks
  private val interiorNul = "a" + 0.toChar + "b"       // integration.rs:1938
  private val uUmlaut = 0xdc.toChar.toString           // integration.rs:1982
  private val cjk = "" + 0x65e5.toChar + 0x672c.toChar + 0x8a9e.toChar // CJK
  private val emoji = new String(Character.toChars(0x1f980)) +
    new String(Character.toChars(0x1f680))             // crab + rocket
  private val combining = "e" + 0x301.toChar + "clair" // e + combining acute
  private val goldens = Seq(interiorNul, uUmlaut, cjk, emoji, combining,
    s"mixed $uUmlaut $cjk $emoji $combining ${interiorNul} end")

  test("interior NUL and non-ASCII text survive the parquet sink byte-exactly") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-text").resolve("text.par")
    ParquetSink.write(
      goldens.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s"),
      out.toString, ParquetSink.Options())
    val back = spark.read.parquet(out.toString)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(back == goldens, "every golden must round-trip unchanged")
    // byte-level check: the NUL is IN the stored bytes, not dropped/replaced
    val nul = spark.read.parquet(out.toString)
      .filter(col("id") === 0)
      .select(hex(encode(col("s"), "UTF-8"))).collect().head.getString(0)
    assert(nul == "610062", s"expected UTF-8 bytes 61 00 62, got $nul")
  }

  test("utf16 kernel round-trips surrogate pairs and combining marks (A13/k8)") {
    import spark.implicits._
    val df = goldens.toDF("s")
    val diffs = df.select(col("s"), TypeKernels.utf16Roundtrip(col("s")).as("r"))
      .filter(col("s") =!= col("r")).count()
    assert(diffs == 0)
    // combining mark stays decomposed: no silent normalization to U+00E9
    val dec = df.filter(col("s") === combining)
      .select(length(col("s"))).collect().head.getInt(0)
    assert(dec == 7, "combining sequence must not be normalized to precomposed")
  }

  test("interior NUL and non-ASCII survive the Derby insert + exec round trip") {
    import spark.implicits._
    val url = s"jdbc:derby:memory:textedge${System.nanoTime()};create=true"
    val df = goldens.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    JdbcSink.insert(df, url, "texts", batchRows = 2)
    JdbcSink.exec(df,
      """INSERT INTO texts ("id", "s") VALUES (?id?, ?s?)""", url, batchRows = 2)
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "texts").load()
      .orderBy("id").collect()
    assert(back.length == goldens.size * 2)
    back.foreach { r =>
      assert(r.getString(1) == goldens(r.getLong(0).toInt),
        s"row ${r.getLong(0)}: both binding paths must preserve the golden exactly")
    }
  }
}
