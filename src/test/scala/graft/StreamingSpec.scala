package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Streaming operators validated against their batch twins: the same data
  * through the streaming path must produce the same aggregates. */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

  test("q48 native session_window equals q21's lag-islands modulo the end convention") {
    // the two session definitions agree everywhere — session_window
    // merges events at exactly gap distance just like the lag idiom's
    // `diff > gap` test (verified empirically on an exact-gap pair) —
    // and differ only in the end column (q48: last + gap, q21: last), so
    // shifting q48's end back by the gap must reproduce q21 bit-for-bit:
    // the native operator and the window idiom cross-validate each other
    val gapUs = 30L * 60 * 1000000
    val nat = StreamingOps.q48SessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) - gapUs, r.getLong(3))).toSet
    val isl = StreamingOps.sessionizeBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(nat == isl)
  }

  test("file-sink streaming survives stop/restart on one checkpoint exactly-once") {
    // the core streaming guarantee: a query stopped mid-stream and
    // restarted on the SAME checkpoint neither loses nor duplicates rows.
    // Feed the events table in two file drops with a full stop between.
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft-restart-src")
    val outDir = Files.createTempDirectory("graft-restart-out").resolve("out")
    val cpDir = Files.createTempDirectory("graft-restart-cp")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

    // column named "ts" to match eventSchema (raw nanos long on disk)
    val all = Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val half1 = all.filter(col("event_id") % 2 === 0)
    val half2 = all.filter(col("event_id") % 2 === 1)
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-restart-tmp")
      df.coalesce(1).write.parquet(tmp.resolve("p").toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp.resolve("p")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, srcDir.resolve(name))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.schema(StreamingOps.eventSchema)
        .parquet(srcDir.toString)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", cpDir.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    drop(half1, "h1.parquet")
    runOnce()                      // phase 1: first half only
    drop(half2, "h2.parquet")
    runOnce()                      // phase 2: restart on same checkpoint
    // a third restart with no new data must add nothing (idempotent resume)
    runOnce()

    val out = spark.read.parquet(outDir.toString)
    val expected = all.count()
    assert(out.count() == expected,
      s"rows after restart: ${out.count()} vs $expected (lost or duplicated)")
    assert(out.select(col("event_id")).distinct().count() == expected,
      "duplicate event_ids after checkpoint resume")
  }

  test("file-source stream hourly aggregation equals the batch tumbling window") {
    // file-source streams need a directory: stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = StreamingOps.readEventStream(spark, dir.toString)
    val q = StreamingOps.hourlyByType(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hourly_out")
      .select("bucket_us", "event_type", "n", "total_value")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val batch = operators.Relational.q20WindowTumbling(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // append mode withholds windows still inside the watermark; everything
    // emitted must match the batch result exactly, and most windows close
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"window $k: streamed $v vs batch ${batch.get(k)}")
    }
    assert(streamed.size >= batch.size - 10,
      s"only ${streamed.size} of ${batch.size} windows emitted")
  }

  test("q44 gate query (complete-mode streaming execution) equals the batch twin exactly") {
    val streamed = StreamingOps.q44StreamHourly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    val batch = operators.Relational.q20WindowTumbling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    // complete mode emits ALL windows, so unlike the append-mode test this
    // is exact set equality — the streaming engine must land on the same
    // counts and decimal-exact sums as the batch plan
    assert(streamed.nonEmpty)
    assert(streamed.sorted.sameElements(batch.sorted),
      s"streamed ${streamed.length} windows, batch ${batch.length}")
  }

  test("q46 gate query (kill-resume on one checkpoint) equals the batch twin exactly") {
    val streamed = StreamingOps.q46StreamRestart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    val batch = operators.Relational.q20WindowTumbling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    // exactly-once across the restart: set equality with the batch plan —
    // lost state would drop windows, double-emission would duplicate them
    assert(streamed.nonEmpty)
    assert(streamed.sorted.sameElements(batch.sorted),
      s"streamed ${streamed.length} windows, batch ${batch.length}")
  }

  test("q47 foreachBatch CDC upsert converges to the one-shot batch merge") {
    val streamed = StreamingOps.q47StreamUpsert(spark, sf).collect()
    val batch = operators.EtlQueries.e5Merge(spark, sf).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed.head.getLong(0) == batch.head.getLong(0), "row counts differ")
    assert(streamed.head.getLong(1) == batch.head.getLong(1), "key counts differ")
    assert(streamed.head.getDouble(2) == batch.head.getDouble(2), "balances differ")
  }

  test("multi-batch streaming sessionization emits every closed session (MemoryStream)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // checkpoint checksums add nothing here and slow the many tiny
    // state-store commits this test performs
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val all = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.Event]
      .collect().sortBy(_.ts_us)
    val mid = all(all.length / 2).ts_us
    val (batch1, batch2) = all.partition(_.ts_us <= mid)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingOps.Event]
    // event-time watermark drives both state timeouts and quiescence
    val withWm = source.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 minute")
      .as[StreamingOps.Event]
    val q = StreamingOps.sessionize(withWm)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      source.addData(batch1.toSeq); q.processAllAvailable()
      source.addData(batch2.toSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchAll = StreamingOps.sessionizeBatch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every emitted session must be a true session, and every session closed
    // by a later event must have emitted (the user's final session emits
    // only if the watermark passed its gap — don't require it)
    val lastPerUser = batchAll.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    val mustEmit = batchAll.toSet -- lastPerUser
    assert(streamed.subsetOf(batchAll.toSet),
      s"phantom sessions: ${(streamed -- batchAll.toSet).take(3)}")
    assert(mustEmit.subsetOf(streamed),
      s"missing closed sessions: ${(mustEmit -- streamed).take(3)}")
  }

  test("mapGroupsWithState per-user totals converge to the batch group-by") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.Event].collect().sortBy(_.ts_us)
    val source = MemoryStream[StreamingOps.Event]
    val withWm = source.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 minute")
      .as[StreamingOps.Event]
    // update mode: each batch emits the refreshed per-user record
    val q = StreamingOps.userTotals(withWm)
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_out").start()
    try {
      source.addData(all.toSeq); q.processAllAvailable()
    } finally q.stop()
    // keep the LAST emitted record per user; must equal the batch group-by
    val streamed = spark.table("totals_out")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("last_us")).as("l"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(expr("ts_ns div 1000")).as("l"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch,
      s"diff: ${(streamed.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff streamed.toSet).take(3)}")
  }

  test("transformWithState per-user totals converge to the batch group-by (next-gen state API)") {
    import org.apache.spark.sql.functions._
    // transformWithState requires the RocksDB state store; isolate the
    // provider override in a child session (same pattern as the gate
    // streams) so other tests keep the default HDFS-backed store
    val ns = spark.newSession()
    ns.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ns.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    import ns.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = ns.sqlContext
    val all = Tables.events(ns, sf)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.Event].collect().sortBy(_.ts_us)
    val mid = all(all.length / 2).ts_us
    val source = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.userTotalsTws(source.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("tws_out").start()
    try {
      // two batches: state must persist and accumulate across them
      source.addData(all.filter(_.ts_us <= mid).toSeq); q.processAllAvailable()
      source.addData(all.filter(_.ts_us > mid).toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = ns.table("tws_out")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("last_us")).as("l"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Tables.events(ns, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(expr("ts_ns div 1000")).as("l"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch,
      s"diff: ${(streamed.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff streamed.toSet).take(3)}")
  }

  test("stream-static enrichment joins every event against the broadcast dim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = StreamingOps.readEventStream(spark, dir.toString)
    val q = StreamingOps.enrichWithCustomers(stream, Tables.customer(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_out")
    val batch = Tables.events(spark, sf).join(
        Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"), "left_outer")
    assert(streamed.count() == Tables.events(spark, sf).count(),
      "left join must preserve every event")
    assert(streamed.filter(col("segment").isNotNull).count() ==
      batch.filter(col("c_mktsegment").isNotNull).count(),
      "streamed enrichment must match the batch join hit count")
  }

  test("streaming dedup keeps one row per key and evicts state past the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    // (key, event-time seconds): key "a" arrives 3x inside the watermark
    // window (dedup to 1), then once far past it (state evicted → re-emitted)
    val source = MemoryStream[(String, Long)]
    val stream = source.toDF().toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = StreamingOps.dedupStream(stream, "k", watermark = "10 seconds")
      .select("k", "sec")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      source.addData(("a", 100L), ("a", 101L), ("b", 102L))
      q.processAllAvailable()
      source.addData(("a", 103L), ("c", 120L)) // "a" still within watermark
      q.processAllAvailable()
      source.addData(("a", 500L)) // far past the watermark: state evicted
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("dedup_out")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.count(_._1 == "a") == 2,
      s"one 'a' within the window, one after eviction: $rows")
    assert(rows.contains(("b", 102L)) && rows.contains(("c", 120L)))
    assert(!rows.contains(("a", 101L)) && !rows.contains(("a", 103L)),
      s"in-window duplicates must drop: $rows")
  }

  test("stream-stream interval join matches the batch twin across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.Event].collect().sortBy(_.ts_us)
    val errs = all.filter(_.event_type == "error")
    val purs = all.filter(_.event_type == "purchase")
    val mid = all(all.length / 2).ts_us

    val srcE = MemoryStream[StreamingOps.Event]
    val srcP = MemoryStream[StreamingOps.Event]
    def ts(ds: org.apache.spark.sql.Dataset[StreamingOps.Event]) =
      ds.withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamingOps.errorPurchaseJoin(ts(srcE.toDS()), ts(srcP.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      srcE.addData(errs.filter(_.ts_us <= mid).toSeq)
      srcP.addData(purs.filter(_.ts_us <= mid).toSeq)
      q.processAllAvailable()
      srcE.addData(errs.filter(_.ts_us > mid).toSeq)
      srcP.addData(purs.filter(_.ts_us > mid).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ssj_out")
      .select(col("err_id"), col("pur_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winUs = 600L * 1000000L
    val batch = (for {
      e <- errs; p <- purs
      if e.user_id == p.user_id && math.abs(e.ts_us - p.ts_us) <= winUs
    } yield (e.event_id, p.event_id)).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming sessionization emits closed sessions matching the batch twin") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.Event]
    // run the stateful function directly over a single batch via groupByKey
    // on the batch Dataset (same code path as flatMapGroupsWithState's
    // per-group logic, driven to completion)
    val batchSessions = StreamingOps.sessionizeBatch(spark, sf).collect()
    assert(batchSessions.nonEmpty)
    // every user's sessions are disjoint and ordered with gaps > 30 min
    batchSessions.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) - a.getLong(2) > 30L * 60 * 1000000,
            "session gap must exceed 30 minutes")
        case _ => ()
      }
    }
    // session event counts cover every event exactly once
    val total = batchSessions.map(_.getLong(3)).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("q75 streaming near-dup output is independent of the micro-batch split") {
    // the band-index state function sorts each group's arrivals by pid,
    // so the pair set must be identical whether the corpus arrives as
    // one batch, the serving two, or three — the executable form of the
    // gate's batching-independence claim
    def run(n: Int): Seq[String] =
      graft.streaming.StreamingOps.q75Feeds(spark, sf, n)
        .collect().map(_.mkString("|")).toSeq
    val two = run(2)
    assert(two.nonEmpty, "twin injection must produce near-dup pairs")
    assert(run(1) == two, "single-batch run diverged from the serving split")
    assert(run(3) == two, "three-batch run diverged from the serving split")
  }

  test("q75's TTL variant bounds state to the horizon and keeps in-horizon pairs exact") {
    // two event-time epochs, 2.5 horizons apart, with a watermark-
    // advancing sentinel between them: epoch-1 buckets must be EVICTED
    // (group timeout) before epoch 2 arrives, cross-epoch pairs must be
    // suppressed (entry-level TTL), and within-horizon pairs must equal
    // d5's oracle-exact answer restricted to same-epoch ends
    val (pairsDf, stateRows) = graft.streaming.StreamingOps.q75Ttl(spark, sf)
    val got = pairsDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pay = graft.operators.Dedup.twinPayload(spark, sf)
    val cutoff = pay.agg(max(expr("doc_id div 2"))).head.getLong(0) / 2
    val d5Full = graft.operators.Dedup.d5SimhashDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.operators.CacheScope.releaseAll(blocking = true)
    val sameEpoch = d5Full.filter { case (a, b, _) =>
      (a / 2 <= cutoff) == (b / 2 <= cutoff) }
    assert(sameEpoch.nonEmpty, "test payload must produce in-horizon pairs")
    assert(got == sameEpoch,
      "in-horizon pairs must hash-match d5's oracle subset exactly " +
        s"(missing=${(sameEpoch -- got).size}, extra=${(got -- sameEpoch).size})")
    // the executable state bound: after the run, the store holds only
    // epoch-2 buckets plus the sentinel's 4 — every epoch-1-only bucket
    // timed out, so state is sized by arrivals-within-horizon, never by
    // the full corpus
    val bandsOf = (filter: org.apache.spark.sql.Column) =>
      graft.operators.Dedup.d5Signatures(spark, sf).filter(filter)
        .select(col("source"), col("doc_id"), col("sh"))
        .withColumn("b", explode(array((0 until 4).map(i =>
          concat(col("sh").bitwiseAND(lit(0xffffL << (16 * i)))
            .cast("string"), lit(s"#$i"))): _*)))
        .select(col("source"), col("b")).distinct().count()
    val groupsE2 = bandsOf(expr("doc_id div 2") > cutoff)
    val groupsAll = bandsOf(lit(true))
    graft.operators.CacheScope.releaseAll(blocking = true)
    assert(stateRows > 0, "state metrics must be observable from progress")
    assert(stateRows <= groupsE2 + 4,
      s"state must be horizon-sized: $stateRows buckets vs epoch-2's $groupsE2 (+4 sentinel)")
    assert(stateRows < groupsAll,
      s"eviction must have happened: $stateRows vs $groupsAll corpus-lifetime buckets")
  }
}
