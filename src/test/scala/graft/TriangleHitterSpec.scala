package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineExt, RelationalExt, TextAnalysis}

/** Exact-twin specs for the round-8 tail additions: t30 two-pass heavy
  * hitters, d21 degree-oriented triangle counting, q60 distribution
  * windows and q59 chained streaming window aggregation. Each twin
  * recomputes the full answer with an independent pure-Scala (or
  * batch-Spark, for the streaming gate) implementation on sf0.001 and
  * demands bit-identical results (the NoveltyGraphSpec pattern). */
class TriangleHitterSpec extends AnyFunSuite {
  import TestSession._

  test("t30: pure-Scala exact-count twin reproduces the heavy-hitter set") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val n = toks.length.toLong
    val expected = toks.groupBy(identity).view
      .mapValues(_.length.toLong).toSeq
      .filter { case (_, c) => c * 100L > n }
      .sortBy(_._1)
    val got = TextAnalysis.t30HeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty, "sf0.001 must have tokens above the 1% threshold")
    assert(got == expected, "two-pass result must equal the exact twin")
  }

  test("t30: the Misra-Gries candidate pass is a superset of true heavy " +
    "hitters under an adversarial partition layout") {
    // pigeonhole guarantee must hold however rows are partitioned: force
    // a layout that clusters each token's occurrences into one partition
    // (the layout most likely to hide a globally-heavy token from other
    // partitions' summaries) and still demand the exact final answer
    val docs = Tables.documents(spark, sf)
    val byToken = docs.select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .repartition(7, col("token"))
    // the operator reads from the table itself, so emulate pass 1+2 inline
    import spark.implicits._
    val k = 100
    val cands = byToken.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None =>
            val dead = List.newBuilder[String]
            m.foreachEntry((key, c) => if (c == 1L) dead += key else m.update(key, c - 1))
            dead.result().foreach(m.remove)
        }
      }
      m.keysIterator
    }.collect().toSet
    val toks = docs.select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val n = toks.length.toLong
    val trueHH = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .collect { case (t, c) if c * 100L > n => t }.toSet
    assert(trueHH.subsetOf(cands),
      s"candidates must contain every true heavy hitter; missing ${trueHH -- cands}")
  }

  test("d21: pure-Scala adjacency-intersection twin reproduces every row") {
    val o2p = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairs = o2p.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = scala.collection.mutable.HashMap.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    // per-node participation: for each edge, common neighbors close a
    // triangle; each triangle is seen once per edge (3×), so count per
    // node via canonical triples
    val triples = pairs.iterator.flatMap { case (u, v) =>
      (adj(u) & adj(v)).iterator.map { w =>
        val t = Seq(u, v, w).sorted; (t(0), t(1), t(2))
      }
    }.toSet
    val expected = triples.toSeq.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val got = PipelineExt.d21TriangleCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty, "co-purchase graph must contain triangles at sf0.001")
    assert(got == expected, "oriented enumeration must equal the twin")
  }

  test("d21: both orientation joins broadcast the rank table") {
    val p = PipelineExt.d21TriangleCount(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the |V|-sized rank table must broadcast into the orientation joins:\n$p")
  }

  test("q60: pure-Scala window twin reproduces ratios bit-for-bit") {
    val rows = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995 && month(col("o_orderdate")) === 3)
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (prio, g) =>
      val sorted = g.sortBy(t => (t._3, t._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case ((key, _, price), i) =>
        val pct = if (n == 1) 0.0 else i.toDouble / (n - 1).toDouble
        val cd = (i + 1).toDouble / n.toDouble
        val second: Any = if (i >= 1) sorted(1)._1 else null
        (key, prio, price, pct, cd, second)
      }
    }.sortBy(t => (t._2, t._3, t._1))
    val got = RelationalExt.q60DistWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), if (r.isNullAt(5)) null else r.getLong(5))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "distribution windows must equal the twin")
  }

  test("q59: chained streaming windows equal the batch two-level rollup") {
    val us = Tables.events(spark, sf)
      .select(expr("ts_ns div 1000").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val l1 = us.map { case (u, t) => (u / 900000000L * 900000000L, t) }
      .groupBy(identity).view.mapValues(_.length.toLong)
    val expected = l1.toSeq
      .groupBy { case ((b15, t), _) => (b15 / 3600000000L * 3600000000L, t) }
      .map { case ((h, t), g) =>
        val ns = g.map(_._2)
        (h, t, ns.sum, ns.max, ns.length.toLong)
      }.toSeq.sortBy(t => (t._1, t._2))
    val got = streaming.StreamingOps.q59StreamChainedAgg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty, "chained aggregation must emit finalized hours")
    assert(got == expected, "streaming chained rollup must equal the twin")
    // the chaining must be real: some hour aggregates >1 fifteen-minute
    // bucket, otherwise level 2 degenerates to a rename of level 1
    assert(got.exists(_._5 > 1L), "some hour must contain multiple buckets")
  }
}
