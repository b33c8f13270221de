package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EtlQueries, TextAnalysis}

/** Exact-twin specs for the round-8 third-session additions: e21
  * declarative expectations audit and t29 Zipf vocabulary coverage. Each
  * twin recomputes the full answer with an independent pure-Scala
  * implementation on sf0.001 and demands bit-identical results (the
  * NoveltyGraphSpec pattern). */
class AuditZipfSpec extends AnyFunSuite {
  import TestSession._

  test("e21: pure-Scala expectations twin reproduces every verdict row") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val custkeys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val lqty = Tables.lineitem(spark, sf).select("l_quantity").collect()
      .map(_.getDouble(0))
    val docs = Tables.documents(spark, sf)
      .select("text", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val oN = orders.length.toLong
    def row(name: String, good: Long, total: Long, thr: Long) = {
      val ppm = good * 1000000L / total
      (name, good, total, ppm, thr, ppm >= thr)
    }
    val expected = Seq(
      row("orders_custkey_complete", oN, oN, 1000000L),
      row("orders_orderkey_unique", orders.map(_._1).distinct.length.toLong,
        oN, 1000000L),
      row("orders_status_domain",
        orders.count(o => Set("O", "F", "P")(o._3)).toLong, oN, 1000000L),
      row("orders_custkey_ri",
        orders.count(o => custkeys(o._2)).toLong, oN, 1000000L),
      row("lineitem_qty_range",
        lqty.count(q => q >= 1 && q <= 50).toLong, lqty.length.toLong, 1000000L),
      row("docs_len_consistent",
        docs.count(d => d._3 == d._1.codePointCount(0, d._1.length)).toLong,
        docs.length.toLong, 1000000L),
      row("docs_en_share", docs.count(_._2 == "en").toLong,
        docs.length.toLong, 500000L)
    ).sortBy(_._1)

    val got = EtlQueries.e21Expectations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected, "verdict rows must equal the pure-Scala twin")
    // the suite must exercise BOTH verdicts: an all-green audit would not
    // prove the failing path, an all-red one not the passing path
    assert(got.exists(_._6), "some check should pass")
    assert(got.exists(!_._6), "docs_en_share is designed to fail its 50% bar")
  }

  test("e21: referential check is a broadcast anti-join; t29 top-50 is a TakeOrdered") {
    val pe = EtlQueries.e21Expectations(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pe.contains("BroadcastHashJoin") && pe.contains("LeftAnti"),
      s"the RI check must broadcast the dimension into an anti-join — " +
        s"never shuffle the fact side:\n$pe")
    val pt = TextAnalysis.t29ZipfCoverage(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pt.contains("TakeOrderedAndProject"),
      s"the top-50 must be a distributed TakeOrdered heap, not a global " +
        s"vocabulary sort:\n$pt")
  }

  test("t29: pure-Scala Zipf twin reproduces rank, freq, and coverage") {
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val total = words.length.toLong
    val top = words.groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(50)
    var cum = 0L
    val expected = top.zipWithIndex.map { case ((w, f), i) =>
      cum += f
      (i + 1, w, f, cum * 1000000L / total)
    }
    val got = TextAnalysis.t29ZipfCoverage(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "coverage rows must equal the pure-Scala twin")
    // Zipf shape sanity: the head must dominate — the top-ranked terms
    // cover a disproportionate share of the corpus
    assert(got.last._4 > got.length * 1000000L / total,
      "top terms must cover more than a uniform-share baseline")
  }
}
