package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, RelationalExt}

/** Exact-twin specs for q58 LOCF gap-filling and m6 chunk-digest overlap
  * (the NoveltyGraphSpec pattern: independent pure-Scala recomputation on
  * sf0.001, bit-identical compare). */
class GapFillChunkSpec extends AnyFunSuite {
  import TestSession._

  test("q58: pure-Scala forward-fill twin reproduces every row exactly") {
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts_ns div 1000 as us",
        "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var carry: Option[Double] = None
      es.sortBy(e => (e._3, e._2)).map { case (u, id, us, t, v) =>
        if (t == "purchase") carry = Some(v)
        (u, id, us, t, carry)
      }
    }.sortBy(e => (e._1, e._3, e._2))
    val got = RelationalExt.q58GapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == expected, "gap-fill rows must equal the pure-Scala twin")
    // the fill must be exercised in both states
    assert(got.exists(_._5.isEmpty), "rows before a first purchase stay NULL")
    assert(got.exists(r => r._5.nonEmpty && r._4 != "purchase"),
      "non-purchase rows after a purchase must carry the filled value")
  }

  test("m6: pure-Scala chunk-digest twin reproduces every overlap pair") {
    val chunk = 16
    def digests(text: String): Set[String] = {
      // code-POINT chunking (Spark/DuckDB substring semantics); raw chunk
      // identity — collision-equivalent to the operator's 64-bit interning
      val cps = text.codePoints().toArray
      cps.grouped(chunk).map(g => new String(g, 0, g.length)).toSet
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), digests(r.getString(2))))
      .filter(_._3.nonEmpty)
    val expected = (for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1
      common = (a._3 & b._3).size.toLong if common > 0
      union = a._3.size + b._3.size - common
    } yield (a._1, b._1, common, union, 1000000L * common / union))
      .sortBy(p => (p._1, p._2)).toSeq
    val got = Multimodal.m6ChunkOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, "overlap pairs must equal the pure-Scala twin")
    assert(got.nonEmpty, "the near-dup corpus must share some chunks")
  }
}
