package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationExt, EtlQueries}

/** Round-4 curation specs: decontamination exclusivity, fuzzy-link
  * distance bounds, repetition-signal invariants, packing bookkeeping,
  * chunk reassembly, and bucketed-join co-location. */
class CurationSpec extends AnyFunSuite {
  import TestSession._

  test("d8: only corpus docs are flagged, every flag has a real shared gram") {
    val rows = CurationExt.d8Decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 0, "eval docs must never be flagged")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }

  test("t16: fractions in [0,1], shared <= total, positives equal d8's flag set") {
    val t16 = CurationExt.t16ContaminationFrac(spark, sf).collect()
    assert(t16.nonEmpty)
    t16.foreach { r =>
      assert(r.getLong(0) % 50 != 0, "eval docs are never scored")
      assert(r.getLong(2) <= r.getLong(1), "shared grams cannot exceed total")
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(frac == r.getLong(2).toDouble / r.getLong(1), "ratio is the exact long division")
    }
    // graded scoring must agree with the boolean flagger on WHO overlaps
    val positives = t16.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    val d8docs = CurationExt.d8Decontaminate(spark, sf).collect().map(_.getLong(0)).toSet
    assert(positives == d8docs, "t16's positive-overlap docs must equal d8's flagged set")
  }

  test("d9: links stay inside the nation block with distance <= 1") {
    val df = CurationExt.d9FuzzyLink(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= 1 && r.getLong(2) >= 0))
    // exact-suffix self matches (same numeric suffix, same nation) have dist 0
    val c = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("sfx")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    val s = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey"),
        regexp_extract(col("s_name"), "([0-9]+)$", 1).as("sfx")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    val exact = for {
      (ck, (cn, csfx)) <- c; (sk, (sn, ssfx)) <- s
      if cn == sn && csfx == ssfx
    } yield (ck, sk)
    val zeroPairs = rows.filter(_.getLong(2) == 0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.foreach(p => assert(zeroPairs.contains(p), s"missing exact pair $p"))
  }

  test("t9: repetition fractions are bounded and consistent") {
    val rows = CurationExt.t9Repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (topN, nWords, nDistinct) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (twf, df_, tbf) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(topN >= 1 && topN <= nWords && nDistinct <= nWords)
      assert(twf > 0 && twf <= 1.0 && df_ > 0 && df_ <= 1.0)
      assert(tbf >= 0 && tbf <= 1.0)
      // top word appears at least avg times: top_n >= n_words / n_distinct
      assert(topN * nDistinct >= nWords)
    }
  }

  test("t10: offsets are contiguous per source and packs cover each doc") {
    val rows = CurationExt.t10Pack(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var expected = 0L
      rs.sortBy(_.getLong(1)).foreach { r =>
        val (n, off) = (r.getLong(2), r.getLong(3))
        assert(off == expected, "token offsets must be contiguous")
        val (first, last, nPacks) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(first == off / 512 && last == (off + n - 1) / 512)
        assert(nPacks == last - first + 1)
        expected = off + n
      }
    }
  }

  test("m4: chunks reassemble to the payload byte count, all full but last") {
    val rows = CurationExt.m4Chunk(spark, sf).collect()
    val nBytes = graft.operators.Multimodal.payloads(spark, sf)
      .select(col("doc_id"), octet_length(col("payload")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(3)).sum == nBytes(id))
      sorted.init.foreach(r => assert(r.getLong(3) == 64))
      assert(sorted.last.getLong(3) <= 64 && sorted.last.getLong(3) >= 1)
      // chunk indexes are dense from 0
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong))
    }
  }

  test("e7: bucketed join runs without any shuffle exchange") {
    val out = EtlQueries.e7Bucketed(spark, sf).collect()
    assert(out.length == 1)
    assert(out(0).getBoolean(3), "join over bucketed tables must not shuffle")
    assert(out(0).getLong(0) > 0)
  }
}
