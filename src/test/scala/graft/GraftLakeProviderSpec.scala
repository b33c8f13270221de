package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotLog

/** Contract of the `graft-lake` batch relation provider
  * ([[graft.sources.GraftLakeProvider]]): `spark.read.format(
  * "graft-lake")` is the standard-reader surface over the snapshot log
  * — head and time-travel reads equal the engine API's, pushed filters
  * prune files from the manifest, bad options fail loudly, and
  * `df.write.format("graft-lake")` commits through the log. */
class GraftLakeProviderSpec extends AnyFunSuite {
  import TestSession._

  private def lake = spark.read.format("graft-lake")

  test("graft-lake: head + versionAsOf + timestampAsOf reads equal the engine API; bad options fail loudly") {
    val root = Files.createTempDirectory("graft-lakeprov")
    val dir = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    val sysClock = SnapshotLog.clock
    try {
      val t0 = 1700000000000L
      @volatile var now = t0
      SnapshotLog.clock = () => now
      now = t0 + 1000
      SnapshotLog.commit(nation.filter(col("n_nationkey") < 10), dir)  // v1
      now = t0 + 2000
      SnapshotLog.commit(nation.filter(col("n_nationkey") >= 10), dir) // v2

      def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select(col("n_nationkey").cast("long"))
          .collect().map(_.getLong(0)).toSet
      // head read = engine head read; shortName resolves via services
      assert(keys(lake.option("path", dir.toString).load()) ==
        keys(SnapshotLog.read(spark, dir)))
      // version time travel
      assert(keys(lake.option("path", dir.toString)
        .option("versionAsOf", "1").load()) == (0L until 10L).toSet)
      // timestamp time travel: epoch millis between the commits reads
      // v1 (Delta's latest-at-or-before rule)...
      assert(keys(lake.option("path", dir.toString)
        .option("timestampAsOf", (t0 + 1500).toString).load()) ==
        (0L until 10L).toSet)
      // ...and the ISO-8601 spelling of the same instant agrees
      assert(keys(lake.option("path", dir.toString)
        .option("timestampAsOf",
          java.time.Instant.ofEpochMilli(t0 + 1500).toString).load()) ==
        (0L until 10L).toSet)

      // schema comes from the manifest (no inference surprises)
      assert(lake.option("path", dir.toString).load().schema ==
        SnapshotLog.read(spark, dir).schema)

      // loud failures: unknown version, pre-first timestamp, both
      // options together, unparsable timestamp, missing path
      def failsWith(msg: String)(body: => Unit): Unit = {
        val e = intercept[Exception](body)
        assert(e.getMessage != null && e.getMessage.contains(msg),
          s"expected failure naming '$msg', got: ${e.getMessage}")
      }
      failsWith("version 9 does not exist")(
        lake.option("path", dir.toString).option("versionAsOf", "9")
          .load())
      failsWith("predates the first commit")(
        lake.option("path", dir.toString)
          .option("timestampAsOf", (t0 + 999).toString).load())
      failsWith("mutually exclusive")(
        lake.option("path", dir.toString).option("versionAsOf", "1")
          .option("timestampAsOf", (t0 + 1500).toString).load())
      failsWith("timestampAsOf accepts")(
        lake.option("path", dir.toString)
          .option("timestampAsOf", "not-a-time").load())
      failsWith("option(\"path\"")(lake.load())
    } finally SnapshotLog.clock = sysClock
  }

  test("graft-lake: pushed filters prune files from the manifest; DVs and column mapping apply through the standard reader") {
    val root = Files.createTempDirectory("graft-lakeprov2")
    val dir = root.resolve("t")
    val orders = Tables.orders(spark, sf)
    // range-clustered slabs so the key envelope actually prunes
    SnapshotLog.commit(orders.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey")), dir,
      statsCols = Seq("o_orderkey"))
    val total = SnapshotLog.files(dir).size
    assert(total >= 3, s"need multiple slabs, got $total")
    val lo = orders.agg(min(col("o_orderkey"))).collect().head.getLong(0)
    val want = orders.filter(col("o_orderkey") <= lit(lo + 5))
      .count()
    val viaLake = lake.option("path", dir.toString).load()
      .filter(col("o_orderkey") <= lit(lo + 5))
    assert(viaLake.count() == want)
    val (kept, manifest) = SnapshotLog.lastLakeScan.get()
    assert(manifest == total && kept < total && kept >= 1,
      s"the pushed range filter must prune slabs: kept $kept of $manifest")

    // DV delete visible through the provider
    SnapshotLog.deleteWhere(spark, dir, col("o_orderkey") % 7 === 0)
    val liveWant = orders.filter(col("o_orderkey") % 7 =!= 0).count()
    assert(lake.option("path", dir.toString).load().count() == liveWant)
    // ...while the pre-delete version still serves the full table
    assert(lake.option("path", dir.toString).option("versionAsOf", "1")
      .load().count() == orders.count())

    // column mapping: a renamed column reads under its new logical
    // name, values intact (physical re-alias inside the plan)
    SnapshotLog.renameColumn(dir, "o_totalprice", "price")
    val mapped = lake.option("path", dir.toString).load()
    assert(mapped.columns.contains("price") &&
      !mapped.columns.contains("o_totalprice"))
    val sumVia = mapped.agg(sum(col("price"))).collect().head.getDouble(0)
    val sumRaw = orders.filter(col("o_orderkey") % 7 =!= 0)
      .agg(sum(col("o_totalprice"))).collect().head.getDouble(0)
    assert(math.abs(sumVia - sumRaw) < 1e-6)
  }

  test("graft-lake: the STREAMING sink commits exactly-once versions (txn key per (checkpoint, batchId); replay adds nothing)") {
    val root = Files.createTempDirectory("graft-lakeprov5")
    val dir = root.resolve("t")
    val feed = root.resolve("feed")
    val cp = root.resolve("cp")
    val nation = Tables.nation(spark, sf)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(nation.schema)
        .parquet(feed.toString)
        .writeStream.format("graft-lake")
        .option("path", dir.toString)
        .option("checkpointLocation", cp.toString)
        .option("statsCols", "n_nationkey")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run must finish")
      q.stop()
    }
    nation.filter(col("n_nationkey") < 10).coalesce(1)
      .write.mode("append").parquet(feed.toString)
    runOnce()
    val v1 = SnapshotLog.versions(dir)
    assert(v1.nonEmpty &&
      SnapshotLog.read(spark, dir).count() == 10)
    // quiescent re-run: the engine schedules nothing, no new version
    runOnce()
    assert(SnapshotLog.versions(dir) == v1,
      "an idle run must not commit")
    // more feed files -> the next batch commits the next version, and
    // the lake reads back the full stream through the batch provider
    nation.filter(col("n_nationkey") >= 10).coalesce(1)
      .write.mode("append").parquet(feed.toString)
    runOnce()
    assert(lake.option("path", dir.toString).load().count() == 25)

    // crash-replay idempotency at the Sink API: the SAME batchId
    // committed twice publishes exactly one version (the txn key)
    val dir2 = root.resolve("t2")
    val prov = new graft.sources.GraftLakeProvider()
    val sink = prov.createSink(spark.sqlContext,
      Map("path" -> dir2.toString, "checkpointLocation" -> "spec-scope"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    val slice = nation.filter(col("n_nationkey") < 5).coalesce(1)
    sink.addBatch(0, slice)
    sink.addBatch(0, slice) // the replayed micro-batch
    assert(SnapshotLog.versions(dir2) == Seq(1),
      "a replayed batchId must find its txn key and write nothing")
    sink.addBatch(1, nation.filter(col("n_nationkey").between(5, 9))
      .coalesce(1))
    assert(SnapshotLog.versions(dir2) == Seq(1, 2) &&
      SnapshotLog.read(spark, dir2).count() == 10)

    // append-only contract + missing-scope failure are loud
    val eMode = intercept[Exception](prov.createSink(spark.sqlContext,
      Map("path" -> dir2.toString, "checkpointLocation" -> "x"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Complete()))
    assert(eMode.getMessage.contains("Append mode only"))
    val eScope = intercept[Exception](prov.createSink(spark.sqlContext,
      Map("path" -> dir2.toString), Seq.empty,
      org.apache.spark.sql.streaming.OutputMode.Append()))
    assert(eScope.getMessage.contains("idempotency scope"))
  }

  test("graft-lake: plain SQL reaches the lake (CREATE TABLE ... USING graft-lake, time-travel via OPTIONS)") {
    val root = Files.createTempDirectory("graft-lakeprov4")
    val dir = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    SnapshotLog.commit(nation.filter(col("n_nationkey") < 10), dir)  // v1
    SnapshotLog.commit(nation.filter(col("n_nationkey") >= 10), dir) // v2
    val head = "graft_lake_sql_head"
    val v1 = "graft_lake_sql_v1"
    // a crashed prior run could leave stale catalog entries pointing at
    // a dead temp dir — clear them before creating
    spark.sql(s"DROP TABLE IF EXISTS $head")
    spark.sql(s"DROP TABLE IF EXISTS $v1")
    spark.sql(s"CREATE TABLE $head USING `graft-lake` " +
      s"OPTIONS (path '$dir')")
    spark.sql(s"CREATE TABLE $v1 USING `graft-lake` " +
      s"OPTIONS (path '$dir', versionAsOf '1')")
    try {
      assert(spark.sql(s"SELECT count(*) AS n FROM $head")
        .collect().head.getLong(0) == 25)
      assert(spark.sql(s"SELECT count(*) AS n FROM $v1")
        .collect().head.getLong(0) == 10)
      // predicates and projection flow through the pushed-scan path
      assert(spark.sql(s"SELECT n_name FROM $head WHERE n_nationkey = 7")
        .collect().map(_.getString(0)).toSeq ==
        nation.filter(col("n_nationkey") === 7)
          .select(col("n_name")).collect().map(_.getString(0)).toSeq)
      // catalog-table freshness contract: the resolved relation pins
      // the head version at (cached) resolution time — after NEW
      // commits, refreshTable drops the cached plan and the next query
      // re-resolves to the new head (the documented V1 contract;
      // `spark.read` always resolves fresh)
      SnapshotLog.commit(nation.limit(0), dir) // v3: schema-only append
      SnapshotLog.deleteWhere(spark, dir, col("n_nationkey") >= 20) // v4
      spark.catalog.refreshTable(head)
      assert(spark.sql(s"SELECT count(*) AS n FROM $head")
        .collect().head.getLong(0) == 20,
        "after refreshTable the catalog table must serve the new head")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $head")
      spark.sql(s"DROP TABLE IF EXISTS $v1")
      ()
    }
  }

  test("round-16 review pins: path-option decoding, NOT-over-partial-AND soundness, sink scope normalization") {
    import graft.sources.{GraftLakeRelation, GraftPaths}
    import org.apache.spark.sql.sources._
    // catalog-encoded URIs decode; literal '#'/'%' paths stay literal
    assert(GraftPaths.fromOption("/tmp/plain").toString == "/tmp/plain")
    assert(GraftPaths.fromOption("file:/tmp/a%20b").toString == "/tmp/a b")
    assert(GraftPaths.fromOption("file:///tmp/x").toString == "/tmp/x")
    assert(GraftPaths.fromOption("file:/tmp/exp#3").toString ==
      "/tmp/exp#3", "a literal '#' path must not drop as a URI fragment")
    assert(GraftPaths.fromOption("file:/tmp/100%done").toString ==
      "/tmp/100%done", "a literal '%' path must not be a malformed escape")
    // NOT over a PARTIALLY convertible AND must yield nothing — the
    // weakened side negated would prune files that hold matching rows
    val partial = And(EqualTo("a", 1), AlwaysTrue)
    assert(GraftLakeRelation.filterToColumn(partial).isDefined,
      "a top-level partial AND may weaken (sound)")
    assert(GraftLakeRelation.filterToColumn(Not(partial)).isEmpty,
      "NOT(partial AND) must not convert")
    assert(GraftLakeRelation.filterToColumn(
      Not(And(EqualTo("a", 1), EqualTo("b", 2)))).isDefined,
      "NOT over a fully-convertible subtree still converts")
    assert(GraftLakeRelation.filterToColumn(
      Or(And(EqualTo("a", 1), AlwaysTrue), EqualTo("b", 2))).isDefined,
      "OR may weaken through a partial AND outside NOT (still implied)")
    // the sink's idempotency scope normalizes checkpoint spellings: a
    // relaunch spelling the same checkpoint differently must land on
    // the SAME txn keys, or a crash-replayed batch double-commits
    val root = Files.createTempDirectory("graft-lakeprov6")
    val dir = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    val prov = new graft.sources.GraftLakeProvider()
    def sinkWith(cp: String) = prov.createSink(spark.sqlContext,
      Map("path" -> dir.toString, "checkpointLocation" -> cp),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    val cpA = root.resolve("cp").toString
    sinkWith(cpA).addBatch(0, nation.filter(col("n_nationkey") < 5)
      .coalesce(1))
    // the relaunch: trailing slash and file: URI spellings of the SAME
    // checkpoint replay batch 0 — no duplicate version may appear
    sinkWith(cpA + "/").addBatch(0,
      nation.filter(col("n_nationkey") < 5).coalesce(1))
    sinkWith("file:" + cpA).addBatch(0,
      nation.filter(col("n_nationkey") < 5).coalesce(1))
    assert(SnapshotLog.versions(dir) == Seq(1),
      "respelled checkpoints must dedup onto the same txn scope")
  }

  test("graft-lake: the write surface commits through the log (Append/Overwrite/ErrorIfExists/Ignore, statsCols, partitionBy)") {
    val root = Files.createTempDirectory("graft-lakeprov3")
    val dir = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    def write(df: org.apache.spark.sql.DataFrame) =
      df.write.format("graft-lake").option("path", dir.toString)
    write(nation.filter(col("n_nationkey") < 10))
      .option("statsCols", "n_nationkey")
      .option("partitionBy", "n_regionkey")
      .mode("append").save()                                        // v1
    assert(SnapshotLog.versions(dir) == Seq(1))
    assert(SnapshotLog.partitionColumns(dir) == Seq("n_regionkey"))
    write(nation.filter(col("n_nationkey") >= 10))
      .option("partitionBy", "n_regionkey").mode("append").save()   // v2
    assert(lake.option("path", dir.toString).load().count() == 25)
    // ErrorIfExists refuses a live lineage; Ignore is a no-op on one
    val e = intercept[Exception](write(nation).mode("errorifexists").save())
    assert(e.getMessage.contains("already has committed snapshots"))
    write(nation).mode("ignore").save()
    assert(SnapshotLog.versions(dir) == Seq(1, 2))
    // Overwrite starts a new lineage at the next version
    write(nation.filter(col("n_nationkey") < 5)).mode("overwrite").save()
    assert(lake.option("path", dir.toString).load().count() == 5)
    // time-travel options on a write fail loudly
    val e2 = intercept[Exception](
      write(nation).option("versionAsOf", "1").mode("append").save())
    assert(e2.getMessage.contains("make no sense on a write"))
  }
}
