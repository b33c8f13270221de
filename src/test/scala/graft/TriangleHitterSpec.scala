package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineExt, RelationalExt, Similarity, TextAnalysis}

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

  test("IntersectSorted kernel: members, empty, disjoint, and type safety") {
    import org.apache.spark.sql.functions.{col => c, expr}
    import org.apache.spark.sql.GraftBridge
    val df = spark.createDataFrame(Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L, 6L), Seq(5L, 7L))
    )).toDF("a", "b")
    val inter = GraftBridge.column(graft.functions.IntersectSorted(
      GraftBridge.expression(c("a")), GraftBridge.expression(c("b"))))
    val got = df.select(inter.as("i")).collect().map(_.getSeq[Long](0).toList)
    assert(got.toList == List(List(3L, 9L), Nil, Nil))
    // the kernel reads LONG lanes: an int array input MUST be rejected at
    // analysis (ExpectsInputTypes), never silently read as garbage lanes
    val ints = spark.createDataFrame(Seq((Seq(1, 2), Seq(2, 3)))).toDF("a", "b")
    val r = scala.util.Try {
      ints.select(GraftBridge.column(graft.functions.IntersectSorted(
        GraftBridge.expression(c("a")), GraftBridge.expression(c("b")))).as("i"))
        .collect()
    }
    assert(r.isFailure,
      s"array<int> input must fail analysis under ExpectsInputTypes, got $r")
    // the SQL surface is equally strict (ANSI coercion does not widen
    // array elements): int-literal arrays fail analysis with the typed
    // mismatch, and explicit long literals work
    GraftBridge.applyFunctionExtensions(spark, new GraftExtensions)
    val sqlBad = scala.util.Try(spark
      .sql("SELECT intersect_sorted(array(1, 3), array(3, 4)) AS i").collect())
    assert(sqlBad.isFailure &&
      sqlBad.failed.get.getMessage.contains("DATATYPE_MISMATCH"),
      s"SQL int arrays must fail with the typed mismatch, got $sqlBad")
    val sqlOk = spark
      .sql("SELECT intersect_sorted(array(1L, 3L), array(3L, 4L)) AS i")
      .collect().head.getSeq[Long](0).toList
    assert(sqlOk == List(3L))
  }

  test("d21: small-graph plan broadcasts; beyond-broadcast twin is identical") {
    // no hints in the operator — the planner must still pick broadcast
    // joins at this scale from the checkpoint cache's exact sizes (AQE
    // may finish the conversion at runtime, so execute before reading)
    val df = PipelineExt.d21TriangleCount(spark, sf)
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val p = df.queryExecution.executedPlan.toString
    // both orientation joins + both adjacency joins must broadcast at
    // this scale (the final credits⋈rank join may too) — a single stray
    // BroadcastHashJoin elsewhere must not mask a flipped join
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      s"rank/adjacency tables must broadcast while they fit:\n$p")
    // beyond-broadcast posture: with the broadcast threshold off (the
    // situation of an adjacency that outgrows executor memory), the SAME
    // declarative plan must flip to shuffle joins and produce
    // bit-identical triangle counts — the scale path is this plan, not a
    // documented variant
    val big = spark.newSession()
    // budget 0 flips the measured adjacency switch; threshold -1 stops
    // the planner broadcasting the |V|-sized rank table too, so the
    // zero-broadcast assertion covers every join in the plan
    big.conf.set("graft.d21.adjacencyBroadcastBytes", "0")
    big.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    big.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val dfBig = PipelineExt.d21TriangleCount(big, sf)
    val got = dfBig.collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val pBig = dfBig.queryExecution.executedPlan.toString
    assert(!pBig.contains("BroadcastHashJoin"),
      s"threshold=-1 must leave zero broadcast joins:\n$pBig")
    assert(got == expected,
      "shuffle-join path must be bit-identical to the broadcast path")
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

  test("s9: pure-Scala sign-threshold popcount twin reproduces every row") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def code(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (v(i) > 0f) lo += 1L << i
      for (i <- 32 until 64) if (v(i) > 0f) hi += 1L << (i - 32)
      (lo, hi)
    }
    val codes = vecs.map { case (id, v) => (id, code(v)) }
    val qs = codes.filter(_._1 % 50 == 0).sortBy(_._1).take(64)
    val expected = qs.flatMap { case (qid, (ql, qh)) =>
      codes.filter(_._1 != qid).map { case (id, (lo, hi)) =>
        (qid, id, (java.lang.Long.bitCount(lo ^ ql) +
          java.lang.Long.bitCount(hi ^ qh)).toLong)
      }.sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((q, id, ham), i) => (q, (i + 1).toLong, id, ham) }
    }.toSeq
    val got = Similarity.s9AnnHamming(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "hamming top-k must equal the popcount twin")
  }

  test("t31: pure-Scala integer TV-distance twin reproduces every row") {
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").map((r.getString(0), _)))
    val sw = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tS = sw.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = sw.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val wt = sw.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val t = wt.values.sum
    val pw = wt.view.mapValues(c => c * 1000000L / t).toMap
    val totalP = pw.values.sum
    val expected = tS.keys.toSeq.sorted.map { src =>
      val present = sw.collect { case ((s0, w), c) if s0 == src => (w, c) }
      val sumAbs = present.map { case (w, c) =>
        math.abs(c * 1000000L / tS(src) - pw(w))
      }.sum
      val sumPresent = present.map { case (w, _) => pw(w) }.sum
      (src, tS(src), vocab(src), (sumAbs + (totalP - sumPresent)) / 2)
    }
    val got = TextAnalysis.t31SourceDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "TV drift must equal the integer twin")
    // drift must discriminate: sources are not all identical distributions
    assert(got.map(_._4).distinct.size > 1, "sources should differ in drift")
  }

  test("q61: NAAJ complement equals the anti-join twin; a real NULL " +
    "empties the result under 3VL") {
    val urgent = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filterNot(t => urgent(t._1)).sortBy(_._1).toSeq
    val got = RelationalExt.q61NotInNulls(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "the null-free run must equal the plain complement")
    // the plan must be the single-column null-aware anti join, not a
    // nested-loop fallback
    val plan = RelationalExt.q61NotInNulls(spark, sf)
      .queryExecution.executedPlan.toString
    // BroadcastHashJoinExec prints the isNullAwareAntiJoin flag as a bare
    // trailing `true` after the build side; a nested-loop fallback would
    // print BroadcastNestedLoopJoin instead
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"expected the single-column null-aware anti join in the plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"NOT IN must not fall back to the nested-loop join:\n$plan")
    // 3VL: one NULL in the subquery collapses the complement to zero rows
    val withNull = operators.TempViews.withViews(spark,
      "cust_naaj" -> Tables.customer(spark, sf),
      "ord_naaj" -> Tables.orders(spark, sf)) { v =>
      spark.sql(
        s"""SELECT c_custkey FROM ${v("cust_naaj")}
           |WHERE c_custkey NOT IN (
           |  SELECT CASE WHEN o_totalprice > 1e18 THEN o_custkey END
           |  FROM ${v("ord_naaj")})""".stripMargin)
    }
    assert(withNull.count() == 0L,
      "NOT IN over a null-bearing subquery must be empty under ANSI 3VL")
  }

  test("q63: pure-Scala 4-window sliding assignment twin reproduces rows") {
    val evs = Tables.events(spark, sf)
      .selectExpr("ts_ns div 1000 as us", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val contrib = evs.flatMap { case (us, ty, v) =>
      val base = us / 900000000L * 900000000L
      (0 to 3).map(i => ((base - i * 900000000L, ty),
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    }
    val expected = contrib.groupBy(_._1).map { case ((start, ty), g) =>
      (start, ty, g.length.toLong, g.map(_._2).sum.toDouble)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = RelationalExt.q63SlidingWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "sliding windows must equal the ×4 twin")
    // every event must appear in exactly 4 windows
    assert(got.map(_._3).sum == 4L * evs.length)
  }

  test("q64: null group, count(*) vs count(k), and the null-safe self-join") {
    val ks = Tables.events(spark, sf).select("event_id", "user_id").collect()
      .map(r => if (r.getLong(0) % 7 == 0) None else Some(r.getLong(1)))
    val expected = ks.groupBy(identity).map { case (k, g) =>
      (k.getOrElse(-1L), g.length.toLong,
        if (k.isEmpty) 0L else g.length.toLong, g.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = RelationalExt.q64NullSemantics(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(t => t._1 == -1L && t._3 == 0L),
      "the NULL group must exist, counted by * and skipped by count(k)")
    // the null-safe join must be an equi hash join, not a nested loop
    val plan = RelationalExt.q64NullSemantics(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"<=> must plan as an equi-join key:\n$plan")
  }

  test("e23: observed metrics equal the direct aggregate twin") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._2 > 10)
    val expected = (rows.length.toLong,
      rows.map(t => BigDecimal(t._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble,
      rows.map(_._1).min, rows.map(_._1).max)
    val got = operators.EtlQueries.e23Observe(spark, sf).collect().toSeq
    assert(got.size == 1)
    val r = got.head
    assert((r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)) == expected,
      "observe() metrics must equal the real aggregation")
  }

  test("q65: pure-Scala multiset twin reproduces EXCEPT ALL / INTERSECT ALL") {
    val od = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(o_orderdate AS STRING) AS d").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = od.filter(t => t._2 >= "1995-01-01" && t._2 < "1995-07-01").map(_._1)
    val b = od.filter(t => t._2 >= "1995-07-01" && t._2 < "1996-01-01").map(_._1)
    val ca = a.groupBy(identity).view.mapValues(_.length).toMap
    val cb = b.groupBy(identity).view.mapValues(_.length).toMap
      .withDefaultValue(0)
    val exceptAll = ca.toSeq.flatMap { case (k, n) =>
      Seq.fill(math.max(0, n - cb(k)))((k, "except_all")) }
    val intersectAll = ca.toSeq.flatMap { case (k, n) =>
      Seq.fill(math.min(n, cb(k)))((k, "intersect_all")) }
    val expected = (exceptAll ++ intersectAll).sortBy(t => (t._2, t._1))
    val got = RelationalExt.q65SetopsAll(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "bag set-ops must preserve multiplicity exactly")
    // multiplicity must be real: some key must appear twice in one op
    assert(got.groupBy(identity).values.exists(_.size > 1),
      "some customer should carry multiplicity > 1")
  }

  test("m7: pure-Scala sequential-fill twin reproduces the shard manifest") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).getBytes("UTF-8").length.toLong))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      var cum = 0L
      g.sortBy(_._1).map { case (id, _, n) =>
        val prev = cum; cum += n
        (id, src, n, prev / 16384L, prev % 16384L)
      }
    }.sortBy(t => (t._2, t._1))
    val got = operators.Multimodal.m7ShardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "manifest must equal the sequential-fill twin")
  }

  test("q66: the typed Aggregator path equals the DataFrame dec2 aggregate") {
    import org.apache.spark.sql.functions.{col => c, count, lit, sum}
    val untyped = Tables.lineitem(spark, sf)
      .groupBy(c("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(operators.Relational.dec2(c("l_quantity")))
          .cast("double").as("sum_qty"))
      .orderBy(c("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val typed = operators.RelationalExt.q66TypedAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(typed.nonEmpty)
    assert(typed == untyped,
      "Dataset[T] Aggregator must be bit-identical to the DataFrame path")
  }

  test("q67: streaming sliding windows equal the batch q63 result") {
    val batch = RelationalExt.q63SlidingWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val streamed = streaming.StreamingOps.q67StreamSliding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "the engine-executed hopping aggregation must equal the batch twin")
  }

  test("d22: pure-Scala containment twin reproduces the Jaccard-missed set") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").distinct.toSet))
    val expected = (for {
      (aId, src, wa) <- docs
      (bId, srcB, wb) <- docs
      if src == srcB && aId < bId
      na = wa.size.toLong; nb = wb.size.toLong
      inter = (wa & wb).size.toLong
      mn = math.min(na, nb)
      if mn > 0 && inter * 10 >= mn * 9 && inter * 10 < (na + nb - inter) * 8
    } yield (aId, bId, na, nb, inter, 1000000L * inter / mn))
      .sortBy(t => (t._1, t._2)).toSeq
    val got = operators.Dedup.d22Containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty, "the corpus must contain containment-only dups")
    assert(got == expected, "containment pairs must equal the set twin")
    // every reported pair is one Jaccard (d3) would MISS by construction
    // (jac < 0.8 in-filter) while being ≥90% contained
    assert(got.forall(_._6 >= 900000L))
  }

  test("q68: correlated scalar subqueries decorrelate and match the twin") {
    val custs = Tables.customer(spark, sf).select("c_nationkey", "c_acctbal")
      .collect().map(r => (r.getInt(0).toLong, r.getDouble(1)))
    val byNation = custs.groupBy(_._1)
    val got = RelationalExt.q68CorrelatedScalar(spark, sf).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (nk, _, n, mx) =>
      val g = byNation.getOrElse(nk, Array.empty[(Long, Double)])
      assert(n == g.length.toLong, s"nation $nk count")
      assert(mx == (if (g.isEmpty) None else Some(g.map(_._2).max)),
        s"nation $nk max")
    }
    // decorrelated: the per-row subqueries must have become joins — no
    // cartesian/nested-loop execution of the inner query per outer row
    val plan = RelationalExt.q68CorrelatedScalar(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Join"), s"expected decorrelated joins:\n$plan")
  }

  test("q69: the native pivot API equals the manual CASE twin exactly") {
    val evs = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val expected = evs.groupBy(_._1).toSeq.map { case (u, g) =>
      val c = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
        .withDefaultValue(0L)
      (u, types.map(c))
    }.sortBy(_._1)
    val got = RelationalExt.q69PivotNative(spark, sf).collect()
      .map(r => (r.getLong(0), (1 to 5).map(r.getLong).toSeq)).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "pivot cells must equal the per-type counts")
    // the NULL→0 coalesce path: a sparse frame (one type per user) must
    // yield 0 — not null — in every other cell (sf0.001 is dense, so the
    // empty-cell convention needs a synthetic probe)
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, count, lit, col => cc}
    val sparse = Seq((1L, "click"), (2L, "view")).toDF("user_id", "event_type")
      .groupBy(cc("user_id")).pivot("event_type", types).agg(count(lit(1)))
    val cells = sparse.select(cc("user_id") +:
        types.map(t => coalesce(cc(s"`$t`"), lit(0L)).as(t)): _*)
      .orderBy(cc("user_id")).collect()
      .map(r => (1 to 5).map(r.getLong).toList).toList
    assert(cells == List(List(1L, 0L, 0L, 0L, 0L), List(0L, 0L, 0L, 0L, 1L)))
  }

  test("m8: pure-Scala CDC boundary twin reproduces every row; edit " +
    "locality holds") {
    def boundaries(text: String): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (1 to text.length - 7).filter { i =>
        val win = text.substring(i - 1, i - 1 + 8)
        val hex = md.digest(win.getBytes("UTF-8")).take(2)
          .map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16) % 16 == 0
      }.map(_.toLong)
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val b = if (text.length >= 8) boundaries(text) else Seq.empty[Long]
      (id, text.length.toLong, b.size.toLong, b.size + 1L, b.sum)
    }.sortBy(_._1).toSeq
    val got = operators.Multimodal.m8CdcChunking(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "CDC boundaries must equal the rolling twin")
    // the CDC property: appending a suffix must not move EXISTING
    // boundaries (only add new ones near the end) — fixed-size chunking
    // (m4) has no such guarantee
    val t = docs.maxBy(_._2.length)._2
    val before = boundaries(t)
    val after = boundaries(t + " appended tail content")
    assert(before == after.take(before.length) &&
      before.forall(after.contains),
      "existing boundaries must be stable under an append-only edit")
    // non-BMP: windows count CODEPOINTS (the oracle substr rule), so a
    // surrogate pair occupies ONE slot — UTF-16 indexing would shift every
    // boundary after the first astral char
    def cpBoundaries(text: String): Seq[Long] = {
      val cps = text.codePoints().toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      (1 to cps.length - 7).filter { i =>
        val d = md.digest(new String(cps, i - 1, 8).getBytes("UTF-8"))
        (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 16 == 0
      }.map(_.toLong)
    }
    val astral = (0 until 40).map(i => s"chunk$i😀data$i ").mkString
    assert(cpBoundaries(astral) != boundaries(astral),
      "discriminator: the UTF-16 twin must disagree on this input")
    import org.apache.spark.sql.GraftBridge
    val kernel = spark.createDataFrame(Seq(Tuple1(astral))).toDF("t")
      .select(GraftBridge.column(graft.functions.CdcBoundaries(
        GraftBridge.expression(col("t")))).as("b"))
      .collect().head.getSeq[Long](0).toList
    assert(kernel == cpBoundaries(astral).toList,
      "cdc_boundaries must window by codepoint, not UTF-16 unit")
  }

  test("q70: outer generator preserves empty-array parents; inner drops them") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split("\\s+").filter(_.length >= 8).toSeq))
    val expected = docs.flatMap { case (id, ts) =>
      if (ts.isEmpty) Seq((id, Option.empty[Long], Option.empty[String]))
      else ts.zipWithIndex.map { case (t, i) => (id, Some(i.toLong), Some(t)) }
    }.sortBy(t => (t._1, t._2.getOrElse(-1L))).toSeq
    val got = RelationalExt.q70OuterGenerators(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSeq
    assert(got == expected)
    // the semantics this gate exists for: empty parents survive (and would
    // be LOST by the inner explode)
    assert(got.exists(_._2.isEmpty), "some document must have zero long tokens")
    assert(got.map(_._1).distinct.length == docs.length,
      "every document must survive the outer generator")
  }

  test("q71: typed joinWith equals the untyped join row-for-row") {
    import org.apache.spark.sql.functions.{col => c}
    val untyped = Tables.orders(spark, sf).filter(c("o_totalprice") > 400000.0)
      .join(Tables.customer(spark, sf), c("o_custkey") === c("c_custkey"))
      .select(c("o_orderkey"), c("o_custkey"), c("c_name"), c("o_totalprice"))
      .orderBy(c("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    val typed = RelationalExt.q71TypedJoinWith(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    assert(typed.nonEmpty)
    assert(typed == untyped)
  }

  test("q73: salted join equals the plain join; exchange carries the salt") {
    import org.apache.spark.sql.functions.{col => c, count, lit, sum}
    val plain = Tables.lineitem(spark, sf)
      .select((org.apache.spark.sql.functions.when(c("l_orderkey") % 2 === 0,
        lit(1L)).otherwise(c("l_suppkey") % 10)).as("k"), c("l_quantity"))
      .join(Tables.supplier(spark, sf).filter(c("s_suppkey") < 10)
        .select(c("s_suppkey").as("dk"), c("s_name")), c("k") === c("dk"))
      .groupBy(c("k"), c("s_name"))
      .agg(count(lit(1)).as("n"),
        sum(operators.Relational.dec2(c("l_quantity")))
          .cast("double").as("sum_qty"))
      .orderBy(c("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val salted = RelationalExt.q73SaltedJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(salted.nonEmpty)
    assert(salted == plain, "salting must be result-invisible")
    // the hot key (1) must carry the skewed half of lineitem — the r8
    // version collapsed onto key 0, which no supplier has, so the inner
    // join silently dropped every skewed row and the gate proved nothing
    val total = Tables.lineitem(spark, sf).count()
    val hot = salted.filter(_._1 == 1L).map(_._3).sum
    assert(hot >= total / 2,
      s"hot key 1 must carry at least the skewed half ($hot of $total)")
    // the join must be a SHUFFLED join whose exchange is keyed on
    // (k, salt) — the whole point: the hot key's rows spread over R
    // salted partitions. A broadcast join would have no shuffle and make
    // the salt dead weight, so its absence is asserted too.
    val plan = RelationalExt.q73SaltedJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffled (non-broadcast) join:\n$plan")
    val saltedExchange =
      "hashpartitioning\\((?:k|dk)#\\d+L?, salt#\\d+".r
        .findFirstIn(plan).isDefined
    assert(saltedExchange,
      s"expected an exchange hash-partitioned by (k, salt):\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"the replicated dimension must not broadcast in this gate:\n$plan")
  }

  test("q72: try_cast NULL-on-failure semantics match the hand count") {
    val prios = Tables.orders(spark, sf).select("o_orderpriority").collect()
      .map(_.getString(0))
    val expected = prios.groupBy(identity).toSeq.map { case (p, g) =>
      (p, g.length.toLong, 0L, p.substring(0, 1).toInt.toLong, 0L, 0L)
    }.sortBy(_._1)
    val got = RelationalExt.q72TryCast(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong,
        r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty)
    // whole-string and double parses must ALL fail (NULL), leading digit
    // must all succeed, out-of-bounds element is always NULL
    assert(got == expected,
      "try_cast battery must split values/NULLs exactly as the twin")
  }

  test("q62: pure-Scala running-distinct twin reproduces every row") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts_ns div 1000 as us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(t => (t._3, t._2))
      val seen = scala.collection.mutable.Set.empty[String]
      sorted.map { case (u, id, us, ty) =>
        seen += ty; (u, id, us, ty, seen.size.toLong)
      }
    }.sortBy(t => (t._1, t._3, t._2))
    val got = RelationalExt.q62RunningDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, "running distinct must equal the set twin")
    assert(got.exists(_._5 > 1L), "some user must reach >1 distinct type")
  }
}
