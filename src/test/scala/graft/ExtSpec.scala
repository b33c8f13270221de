package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, PipelineExt, RelationalExt}

/** Round-3 extension specs: dup clustering invariants, interval-join
  * binning equivalence, exact-sum statistics vs built-ins, redaction
  * goldens, token-budget invariants. */
class ExtSpec extends AnyFunSuite {
  import TestSession._

  test("SQL-expressed queries run concurrently in one session without view collisions") {
    // round-6: constant temp-view names made concurrent same-session calls
    // race (one call's createOrReplace could swap the table under another's
    // analysis). TempViews nonces the names; 8 interleaved calls across the
    // view-registering queries must all agree with their serial results.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val serial = Map(
      "q42" -> RelationalExt.q42Exists(spark, sf).count(),
      "q29" -> operators.Relational.q29Lateral(spark, sf).count(),
      "q36" -> operators.Relational.q36GroupingSets(spark, sf).count())
    val runs = Future.sequence((1 to 8).map { i =>
      Future {
        i % 3 match {
          case 0 => "q42" -> RelationalExt.q42Exists(spark, sf).count()
          case 1 => "q29" -> operators.Relational.q29Lateral(spark, sf).count()
          case _ => "q36" -> operators.Relational.q36GroupingSets(spark, sf).count()
        }
      }
    })
    Await.result(runs, 5.minutes).foreach { case (k, n) =>
      assert(n == serial(k), s"$k returned $n concurrently vs ${serial(k)} serially")
    }
  }

  test("d14 snapshot diff: categories reconcile with snapshot cardinalities") {
    val rows = PipelineExt.d14SnapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def total(status: String) =
      rows.collect { case ((_, s), n) if s == status => n }.sum
    // recompute the two snapshot sizes straight from the raw table
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val oldN = docs.count(_ % 5 != 0).toLong
    val newN = docs.count(_ % 7 != 0).toLong
    // every old row is removed/changed/unchanged; every new row is
    // added/changed/unchanged — the diff must tile both snapshots exactly
    assert(total("removed") + total("changed") + total("unchanged") == oldN)
    assert(total("added") + total("changed") + total("unchanged") == newN)
    // changed = rows in both snapshots whose doc_id % 3 == 0 (the +10 rescore)
    val changedTruth = docs.count(d => d % 5 != 0 && d % 7 != 0 && d % 3 == 0).toLong
    assert(total("changed") == changedTruth)
  }

  test("q55 funnel: stages are monotone and match an in-memory replay") {
    val rows = RelationalExt.q55Funnel(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val Seq(v, c, p) = Seq("1_view", "2_click", "3_purchase").map(rows(_)._1)
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    // replay the stage logic per user from the raw events
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts_ns div 1000 as us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val truth = ev.values.flatMap { es =>
      def minAfter(tpe: String, after: Long) = {
        val ts = es.filter(e => e._2 == tpe && e._3 > after).map(_._3)
        if (ts.isEmpty) None else Some(ts.min)
      }
      for (tv <- minAfter("view", Long.MinValue))
        yield (tv, minAfter("click", tv).map(tc => (tc, minAfter("purchase", tc))))
    }.toSeq
    assert(v == truth.size)
    val clicks = truth.flatMap(_._2)
    assert(c == clicks.size)
    val purchases = clicks.flatMap(_._2)
    assert(p == purchases.size)
    assert(rows("2_click")._2 ==
      truth.flatMap(t => t._2.map(_._1 - t._1)).sum)
  }

  test("q56 retention: week-0 actives per cohort sum to the user population") {
    val rows = RelationalExt.q56Retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every user is active in week 0 of their own cohort, exactly once
    val week0 = rows.filter(_._2 == 0L).map(_._3).sum
    val users = graft.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(week0 == users, s"week-0 total $week0 != $users users")
    rows.foreach { case (_, w, n) => assert(w >= 0 && n > 0) }
  }

  test("d12 star contraction and d7 label propagation agree exactly") {
    val d7 = PipelineExt.d7DupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d12 = PipelineExt.d12DupClustersStar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d7.nonEmpty)
    assert(d12 == d7,
      s"algorithms disagree: only-d7=${(d7 -- d12).take(5)}, only-d12=${(d12 -- d7).take(5)}")
  }

  test("d7: clusters are consistent with their pair graph") {
    val pairs = Dedup.d3NgramJaccard(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = PipelineExt.d7DupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    // every paired doc is labeled; both endpoints share a label
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // labels are canonical: the cluster id is the minimum member id
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.keys.min)
    byCluster.foreach { case (cid, minMember) =>
      assert(cid == minMember, s"cluster $cid not labeled by its min member")
    }
    // cluster count < doc count iff at least one multi-doc cluster exists
    assert(clusters.values.toSet.size <= clusters.size)
  }

  test("q41: bucketed interval join equals the naive range join") {
    val bucketed = RelationalExt.q41IntervalJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("t_us"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("t_us").as("t_err"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u_p"), col("t_us").as("t_pur"))
    val naive = err.join(pur,
        col("user_id") === col("u_p") &&
          abs(col("t_err") - col("t_pur")) <= 600L * 1000000L, "left_outer")
      .groupBy(col("err_id")).agg(count(col("t_pur")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
  }

  test("q39: exact-sum stddev/corr agree with Spark's streaming builtins") {
    val ref = graft.Tables.part(spark, sf)
      .groupBy(col("p_brand"))
      .agg(stddev_samp(col("p_size")).as("sd"),
        corr(col("p_size"), col("p_retailprice")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // columns: p_brand, n, median_size, stddev_size, stddev_price, corr
    val battery = RelationalExt.q39StatsBattery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(5))).toMap
    battery.foreach { case (brand, (sd, c)) =>
      val (rsd, rc) = ref(brand)
      assert(math.abs(sd - rsd) < 1e-9 * math.max(1.0, rsd), s"stddev drift $brand")
      assert(math.abs(c - rc) < 1e-9, s"corr drift $brand")
    }
  }

  test("t7: redaction goldens — email, ip, phone, mixed, negative") {
    import spark.implicits._
    val rows = Seq(
      "contact me at jane.doe+x@example.org today",
      "server 10.0.255.3 rebooted",
      "call 555-867-5309 now",
      "a@b.io via 1.2.3.4 at 800 555 1212",
      "no pii here, just 3.14 and v1.2").toDF("text")
    val out = rows.select(PipelineExt.redact(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == "contact me at <EMAIL> today")
    assert(out(1) == "server <IP> rebooted")
    assert(out(2) == "call <PHONE> now")
    assert(out(3) == "<EMAIL> via <IP> at <PHONE>")
    assert(out(4) == "no pii here, just 3.14 and v1.2")
  }

  test("t8: per-source cumulative tokens never exceed the budget and are monotone") {
    val rows = PipelineExt.t8TokenMix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) <= 5000L))
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val cums = rs.map(_.getLong(3)).toSeq
      assert(cums == cums.sorted, "cumulative sums not monotone within source")
    }
  }

  test("e5 merge semantics: upsert replaces, delete drops, insert appends, untouched passes") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "v", "x")
    val changes = Seq(
      (2L, "b2", 25.0, false), // upsert
      (3L, "c", 30.0, true),   // delete
      (4L, "d", 40.0, false)   // insert
    ).toDF("k", "v", "x", "_deleted")
    val out = graft.sources.Merge.merge(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
  }

  test("e5 merge: NULL _deleted is an upsert, not a silent delete") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((2L, "b2", Option.empty[Boolean]))
      .toDF("k", "v", "_deleted")
    val out = graft.sources.Merge.merge(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2")))
  }

  test("e5 merge: duplicate changeset keys fail without seqCol, resolve with it") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val dup = Seq((1L, "x", false, 10L), (1L, "y", false, 20L))
      .toDF("k", "v", "_deleted", "seq")
    val err = intercept[Exception] {
      graft.sources.Merge.merge(base, dup.drop("seq"), "k").collect()
    }
    assert(err.getMessage.contains("duplicate changeset rows"), err.getMessage)
    val resolved = graft.sources.Merge.merge(base, dup, "k", Some("seq"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(resolved.toSeq == Seq((1L, "y")), "highest seq must win")
  }

  test("e6: year filter prunes to a single hive partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-e6-spec")
    try {
      graft.Tables.orders(spark, sf)
        .withColumn("year", year(col("o_orderdate")))
        .write.partitionBy("year").parquet(dir.resolve("t").toString)
      val read = spark.read.parquet(dir.resolve("t").toString)
        .filter(col("year") === 1997)
      val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
      // FileSourceScan reports the partition filter and a pruned count
      assert(scan.contains("PartitionFilters") && scan.contains("1997"), scan)
      val years = read.select(col("year")).distinct().collect().map(_.getInt(0)).toSeq
      assert(years == Seq(1997))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q43: top-1-per-group plans with a window group limit, not full rank") {
    val p = RelationalExt.q43LatestPerKey(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q40: unpivot emits one row per (id, metric) with matching values") {
    val n = graft.Tables.part(spark, sf).count()
    val up = RelationalExt.q40Unpivot(spark, sf)
    assert(up.count() == 2 * n)
    assert(up.groupBy(col("metric")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("p_size" -> n, "p_retailprice" -> n))
  }
}
