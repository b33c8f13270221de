package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** Exact-twin and plan specs for the round-7 span-level additions:
  * d17 substring dedup and t22 distributed BPE merge training. Both twins
  * recompute the full answer with independent pure-Scala implementations
  * on the sf0.001 corpus and demand bit-identical results — the same
  * "two algorithms, one answer" pattern d7/d12 use. */
class SpanBpeSpec extends AnyFunSuite {
  import TestSession._

  private val K = 8

  private def docs: Array[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("d17: pure-Scala suffix-scan twin reproduces every span exactly") {
    // independent reference implementation: brute-force K-gram index
    val grams = docs.flatMap { case (id, text) =>
      val w = text.trim.split("\\s+")
      if (w.length < K) Array.empty[(String, Long, Int)]
      else (0 to w.length - K).map(i => (w.slice(i, i + K).mkString(" "), id, i)).toArray
    }
    val dup = grams.groupBy(_._1).collect {
      case (g, occ) if occ.map(_._2).distinct.length >= 2 => g
    }.toSet
    val expected = grams.filter(g => dup(g._1)).map(g => (g._2, g._3))
      .groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        // split sorted duplicated starts into consecutive runs
        val runs = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc @ (run :: rest), p) if p == run.head + 1 => (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }.map(_.reverse).reverse
        runs.map(r => (id, r.head.toLong, (r.last + K - 1).toLong,
          (r.last - r.head + K).toLong))
      }.sortBy(x => (x._1, x._2))
    val got = Dedup.d17SubstringDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty, "sf0.001 corpus must contain duplicated spans")
    assert(got == expected, "operator spans must equal the brute-force twin")
  }

  test("d17: spans are maximal, disjoint per doc, and >= K words long") {
    val rows = Dedup.d17SubstringDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, s0, e0, l0) =>
        assert(l0 == e0 - s0 + 1, "span_len must be the inclusive width")
        assert(l0 >= K, "no span shorter than the gram size")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e0, _), (_, s1, _, _)) =>
          // maximality: adjacent spans would have merged into one island
          // unless separated by at least one non-duplicated gram start
          assert(s1 > e0 - K + 1 + 1, "spans must not come from adjacent starts")
        case _ =>
      }
    }
  }

  test("t22: pure-Scala BPE twin reproduces the 6-round merge table exactly") {
    val words = docs.flatMap(_._2.trim.split("\\s+")).filter(_.matches("[a-z]+"))
    var seqs: Seq[(List[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, o) => (w.map(_.toString).toList, o.length.toLong) }
    val expected = (1 to 6).map { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sm, c) <- seqs; i <- 0 until sm.length - 1)
        pc((sm(i), sm(i + 1))) = pc.getOrElse((sm(i), sm(i + 1)), 0L) + c
      val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      def merge(sm: List[String]): List[String] = {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < sm.length) {
          if (i + 1 < sm.length && sm(i) == a && sm(i + 1) == b) { out += (a + b); i += 2 }
          else { out += sm(i); i += 1 }
        }
        out.toList
      }
      seqs = seqs.map { case (sm, c) => (merge(sm), c) }
      (r, a, b, a + b, cnt)
    }
    val got = TextAnalysis.t22BpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == expected, "merge table must equal the reference BPE twin")
  }

  test("d17 plan: no cartesian product, dup test combines map-side, one semi join") {
    val p = Dedup.d17SubstringDedup(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("HashAggregate").length >= 3,
      "min!=max dup test must run partial+final (it is why it beats countDistinct)")
    assert(p.contains("LeftSemi"), "marking duplicated starts must stay a semi join")
  }

  test("t22 plan: merge rounds iterate on the checkpointed vocabulary, not the corpus") {
    // after training, the vocabulary lineage must be a checkpoint scan —
    // re-deriving round N from parquet would recompute all prior rounds
    val vocab = TextAnalysis.t22VocabAfterTraining(spark, sf)
    val p = vocab.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("parquet"),
      "post-training vocabulary must not re-derive from the corpus scan")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "vocabulary must read the localCheckpoint")
  }
}
