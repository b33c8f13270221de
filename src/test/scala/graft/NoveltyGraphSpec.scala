package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineExt, TextAnalysis}

/** Exact-twin specs for the round-8 session additions: t26 n-gram novelty
  * scoring and d18 link-graph PageRank. Each twin recomputes the full
  * answer with an independent pure-Scala implementation on sf0.001 and
  * demands bit-identical results (the SpanBpeSpec pattern). */
class NoveltyGraphSpec extends AnyFunSuite {
  import TestSession._

  test("t26: pure-Scala first-occurrence twin reproduces every row exactly") {
    val K = 3
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, text) =>
      val w = text.trim.split("\\s+")
      val grams =
        if (w.length < K) Set.empty[String]
        else (0 to w.length - K).map(i => w.slice(i, i + K).mkString(" ")).toSet
      (id, grams)
    }.filter(_._2.nonEmpty)
    val firstDoc = perDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, occ) => g -> occ.map(_._2).min }
    val expected = perDoc.map { case (id, gs) =>
      val n = gs.size.toLong
      val novel = gs.count(g => firstDoc(g) == id).toLong
      (id, n, novel, 1000000L * novel / n)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.t26Novelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty, "sf0.001 corpus must produce novelty rows")
    assert(got == expected, "operator rows must equal the brute-force twin")
    // the signal must actually discriminate: near-dup corpora contain both
    // fully-novel docs and docs dominated by repeated content
    assert(got.exists(_._4 == 1000000L), "some doc should be fully novel")
    assert(got.exists(_._4 < 500000L), "some doc should be mostly repeated")
  }

  test("d18: pure-Scala integer PageRank twin reproduces every rank exactly") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => o.get(r.getLong(0)).map(c => (s"c$c", s"s${r.getLong(1)}")))
      .distinct
    val outdeg = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.length.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / outdeg(src) }.sum
      }
      pr = nodes.map(n => n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    val expected = nodes.map(n => (n, pr(n))).toSeq
    val got = PipelineExt.d18Pagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, "operator ranks must equal the integer twin")
    // authority must concentrate: suppliers receive all customer mass, so
    // the max-ranked node is a supplier well above the 150000 floor
    val top = got.maxBy(_._2)
    assert(top._1.startsWith("s") && top._2 > 1000000L,
      s"expected a high-authority supplier at the top, got $top")
  }

  test("d18: a round broadcasts ranks and combines contributions map-side") {
    val (ew, nodes) = PipelineExt.d18Setup(spark, sf)
    val ranks = nodes.withColumn("pr", org.apache.spark.sql.functions.lit(1000000L))
    val p = PipelineExt.d18Round(ew, nodes, ranks)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"ranks must broadcast — the edge side never shuffles for the join:\n$p")
    assert(p.contains("partial_sum"),
      s"contributions must partial-aggregate before the exchange — the " +
        s"per-round shuffle is O(|V|·partitions), never |E|:\n$p")
  }

  test("d18/d19: beyond-broadcast twins are identical; edges never re-exchange") {
    // budget 0 flips the measured node-broadcast switch; threshold -1
    // stops the planner broadcasting anything on its own, so the round
    // plan below is the genuine web-graph shape
    val big = spark.newSession()
    big.conf.set("graft.graph.nodeBroadcastBytes", "0")
    big.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    big.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val expected18 = PipelineExt.d18Pagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    val got18 = PipelineExt.d18Pagerank(big, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(got18 == expected18,
      "co-partitioned PageRank must be bit-identical to the broadcast path")
    val expected19 = PipelineExt.d19LpaCommunities(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    val got19 = PipelineExt.d19LpaCommunities(big, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    assert(got19 == expected19,
      "co-partitioned LPA must be bit-identical to the broadcast path")

    // round-plan shape: the persisted co-partitioned edge table means the
    // sort-merge join exchanges ONLY the node-sized side — no broadcast
    // join anywhere, and no exchange keyed on src (the edge side's
    // partitioning comes from the cache, not a per-round shuffle)
    val (ew0, nodes) = PipelineExt.d18Setup(big, sf)
    val ewCo = PipelineExt.graphServingEdges(big, ew0)
    val ranks = nodes.withColumn("pr", org.apache.spark.sql.functions.lit(1000000L))
    val round = PipelineExt.d18Round(ewCo, nodes, ranks, bcastRanks = false)
    round.queryExecution.toRdd.count()
    val p = round.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"budget=0 must leave zero broadcast joins in the round:\n$p")
    // InMemoryRelation embeds its one-time cache-BUILD plan (which holds
    // the setup repartition on src) in the plan string; the ACTIVE round
    // plan is everything printed before it — any per-round re-exchange of
    // the edge side would sit above the cache scan, i.e. in this prefix
    val active = p.split("InMemoryRelation", 2)(0)
    assert(active.contains("InMemoryTableScan"),
      s"the edge side must serve from the persisted cache:\n$p")
    assert(!active.contains("Exchange hashpartitioning(src"),
      s"the |E| side must serve from its cached partitioning, never " +
        s"re-exchange on src:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"the rank join must be a shuffled join in beyond-broadcast mode:\n$p")
  }

  test("t27: pure-Scala split-leakage twin reproduces every row exactly") {
    val K = 3
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, text) =>
      val w = text.trim.split("\\s+")
      val grams =
        if (w.length < K) Set.empty[String]
        else (0 to w.length - K).map(i => w.slice(i, i + K).mkString(" ")).toSet
      (id, bucket(id), grams)
    }.filter(_._3.nonEmpty)
    val trainGrams = perDoc.filter(_._2 < 90).flatMap(_._3).toSet
    val expected = perDoc.filter(_._2 >= 90).map { case (id, b, gs) =>
      val leaked = gs.count(trainGrams).toLong
      (id, if (b < 95) "validation" else "test",
        gs.size.toLong, leaked, 1000000L * leaked / gs.size)
    }.sortBy(_._1).toSeq
    val got = PipelineExt.t27SplitLeakage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty, "the 10% eval slice must be non-empty at sf0.001")
    assert(got == expected, "operator rows must equal the brute-force twin")
  }

  test("d19: a round broadcasts labels and combines votes map-side") {
    val (ed, labels0) = PipelineExt.d19Setup(spark, sf)
    val p = PipelineExt.d19Round(ed, labels0)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"labels must broadcast — the edge side never shuffles for the join:\n$p")
    assert(p.contains("partial_count"),
      s"votes must partial-aggregate on (node, label) before the exchange:\n$p")
  }

  test("d19: pure-Scala synchronous-LPA twin reproduces every community exactly") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val base = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => o.get(r.getLong(0)).map(c => (s"c$c", s"s${r.getLong(1)}")))
      .distinct
    val nodes = (base.map(_._1) ++ base.map(_._2)).distinct.sorted
    // symmetrized + self-vote, the operator's exact edge multiset
    val ed = base ++ base.map(e => (e._2, e._1)) ++ nodes.map(n => (n, n))
    var label = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val votes = ed.groupBy(_._2).map { case (dst, es) =>
        val counts = es.groupBy(e => label(e._1))
          .map { case (l, v) => (l, v.size) }
        // max count, then lexicographically LARGEST label — the struct max
        dst -> counts.maxBy { case (l, c) => (c, l) }._1
      }
      label = nodes.map(n => n -> votes(n)).toMap
    }
    val expected = nodes.map(n => (n, label(n))).toSeq
    val got = PipelineExt.d19LpaCommunities(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == expected, "communities must equal the synchronous twin")
    // the propagation must actually coarsen: fewer communities than nodes
    val nComm = got.map(_._2).distinct.length
    assert(nComm < nodes.length,
      s"LPA should merge some nodes ($nComm communities / ${nodes.length} nodes)")
  }

  test("d20: capstone composes clusters and survivor pick consistently") {
    val clusters = PipelineExt.d7DupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nchars = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = PipelineExt.d20DedupFull(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // every document appears exactly once
    assert(got.map(_._1).toSet == nchars.keySet, "verdict must cover the corpus")
    // cluster assignment = d7's on paired docs, self for singletons
    got.foreach { case (id, cid, _) =>
      assert(cid == clusters.getOrElse(id, id), s"doc $id cluster $cid") }
    // exactly one survivor per cluster, and it is the largest (tie: min id)
    got.groupBy(_._2).foreach { case (cid, members) =>
      val kept = members.filter(_._3)
      assert(kept.size == 1, s"cluster $cid has ${kept.size} survivors")
      val best = members.map(_._1).minBy(id => (-nchars(id), id))
      assert(kept.head._1 == best,
        s"cluster $cid kept ${kept.head._1}, expected $best")
    }
    // the corpus actually contains near-dup clusters to collapse
    assert(got.exists(!_._3), "some document must be dropped at sf0.001")
  }
}
