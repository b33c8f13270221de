package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotLog

/** Contract of the native streaming CDF source
  * ([[graft.sources.GraftCdfSourceProvider]]): offsets are log
  * versions checkpointed by the ENGINE (no cursor file), the first
  * batch is the starting snapshot as inserts, later batches are the
  * fold-exact CDF slices, and a consumer crash mid-batch replays the
  * SAME version slice on restart — the at-least-once half of the
  * exactly-once-in-effect story q77 executes end to end. */
class CdfStreamSpec extends AnyFunSuite {
  import TestSession._

  private type Tagged = (Long, String, Int)

  test("graft-cdf: engine-checkpointed version offsets, snapshot-first batch, crash replays the identical slice") {
    val root = Files.createTempDirectory("graft-cdfstream")
    val table = root.resolve("t")
    val cp = root.resolve("cp")
    val nation = Tables.nation(spark, sf)
    SnapshotLog.commit(nation.filter(col("n_nationkey") < 10).coalesce(1),
      table, statsCols = Seq("n_nationkey"))                          // v1
    val seen =
      collection.mutable.ArrayBuffer[(Long, Set[Tagged])]()
    def runOnce(crashAtBatch: Option[Long] = None): Boolean = {
      val q = spark.readStream
        .format(classOf[graft.sources.GraftCdfSourceProvider].getName)
        .option("path", table.toString).load()
        .writeStream.option("checkpointLocation", cp.toString)
        .foreachBatch { (b: DataFrame, id: Long) =>
          val rows = b.select(col("n_nationkey").cast("long"),
              col("_change_type"), col("_commit_version"))
            .collect()
            .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
          seen += ((id, rows))
          if (crashAtBatch.contains(id))
            throw new RuntimeException("injected consumer crash")
          ()
        }.start()
      try { q.processAllAvailable(); true }
      catch { case _: Throwable => false }
      finally q.stop()
    }

    // batch 0 on a fresh checkpoint: the v1 snapshot as inserts
    assert(runOnce())
    assert(seen.size == 1 && seen.head._1 == 0L)
    assert(seen.head._2 == (0L until 10L).map((_, "insert", 1)).toSet)
    // nothing new → the engine schedules no batch (offset == committed)
    assert(runOnce())
    assert(seen.size == 1, "an unchanged log must not produce a batch")

    // the log advances: an append (v2) and a DV delete (v3) land
    SnapshotLog.commit(nation.filter(col("n_nationkey") >= 10).coalesce(1),
      table)                                                          // v2
    assert(SnapshotLog.deleteWhere(spark, table,
      col("n_nationkey") % 3 === 0) == 3)                             // v3
    // the consumer CRASHES after its side effect, before the engine
    // commits batch 1 — the checkpoint still points at version 1
    assert(!runOnce(crashAtBatch = Some(1L)))
    assert(seen.size == 2 && seen(1)._1 == 1L)
    val expectBatch1 =
      (10L until 25L).map((_, "insert", 2)).toSet ++
        (0L until 25L).filter(_ % 3 == 0).map((_, "delete", 3)).toSet
    assert(seen(1)._2 == expectBatch1,
      s"batch 1 must be the exact (1, 3] CDF fold, got ${seen(1)._2}")
    // the restart replays the SAME slice — identical rows, same batch id
    assert(runOnce())
    assert(seen.size == 3 && seen(2)._1 == 1L &&
      seen(2)._2 == expectBatch1,
      "the replayed batch must re-read the identical version slice")
    // and the fold reconstructs the live snapshot exactly
    val folded = (seen.head._2 ++ expectBatch1).groupBy(_._1).collect {
      case (k, tags) if !tags.exists(_._2 == "delete") => k
    }.toSet
    val live = SnapshotLog.read(spark, table)
      .select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(folded == live)
    // once committed, the cursor lives in the checkpoint: no new batch
    assert(runOnce())
    assert(seen.size == 3)
  }

  test("graft-cdf: startingVersion opens the feed mid-history; schemaless lineages fail loudly") {
    val root = Files.createTempDirectory("graft-cdfstream2")
    val table = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    SnapshotLog.commit(nation.filter(col("n_nationkey") < 5).coalesce(1),
      table)                                                          // v1
    SnapshotLog.commit(
      nation.filter(col("n_nationkey").between(5, 9)).coalesce(1),
      table)                                                          // v2
    SnapshotLog.commit(nation.filter(col("n_nationkey") >= 10).coalesce(1),
      table)                                                          // v3
    val got = collection.mutable.ArrayBuffer[Set[(Long, String, Int)]]()
    val q = spark.readStream
      .format(classOf[graft.sources.GraftCdfSourceProvider].getName)
      .option("path", table.toString)
      .option("startingVersion", "2")
      .load()
      .writeStream
      .option("checkpointLocation", root.resolve("cp").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        got += b.select(col("n_nationkey").cast("long"),
            col("_change_type"), col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          .toSet
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // first batch = snapshot AT v2 (as inserts @2) + the (2, 3] fold
    assert(got.size == 1)
    assert(got.head == (0L until 10L).map((_, "insert", 2)).toSet ++
      (10L until 25L).map((_, "insert", 3)).toSet)
  }
  test("graft-cdf: maxVersionsPerBatch rate-limits the backfill into checkpointed per-version batches") {
    val root = Files.createTempDirectory("graft-cdfstream3")
    val table = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    (0 until 4).foreach { i =>
      SnapshotLog.commit(nation.filter(col("n_nationkey") % 4 === i)
        .coalesce(1), table)                                    // v1..v4
    }
    SnapshotLog.deleteWhere(spark, table, col("n_nationkey") % 5 === 0) // v5
    val batches =
      collection.mutable.ArrayBuffer[(Long, Set[(Long, String, Int)])]()
    val q = spark.readStream
      .format(classOf[graft.sources.GraftCdfSourceProvider].getName)
      .option("path", table.toString)
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", root.resolve("cp").toString)
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches += ((id, b.select(col("n_nationkey").cast("long"),
            col("_change_type"), col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          .toSet))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // one version per batch: the v1 snapshot, then each step alone —
    // each with its own engine checkpoint commit (a killed backfill
    // resumes mid-history instead of redoing one giant batch)
    assert(batches.map(_._1).toSeq == (0L to 4L),
      s"expected 5 rate-limited batches, got ${batches.map(_._1)}")
    assert(batches.forall { case (id, rows) =>
      rows.nonEmpty && rows.map(_._3).toSet == Set(id.toInt + 1) },
      "each batch must carry exactly its own version's changes")
    // and the bounded fold lands on the live snapshot exactly
    val folded = batches.flatMap(_._2).groupBy(_._1).collect {
      case (k, tags) if !tags.exists(_._2 == "delete") => k
    }.toSet
    val live = SnapshotLog.read(spark, table)
      .select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(folded == live)
  }
  test("graft-cdf: Trigger.AvailableNow with a cap processes the WHOLE available history, then stops") {
    // the silent-truncation hazard: an un-declared rate limiter under
    // AvailableNow would pin the first capped offer as the run's end
    // and report success after one batch — the source declares
    // SupportsTriggerAvailableNow, so the engine keeps scheduling
    // capped batches until the prepare-time pin is reached
    val root = Files.createTempDirectory("graft-cdfstream4")
    val table = root.resolve("t")
    val nation = Tables.nation(spark, sf)
    (0 until 5).foreach { i =>
      SnapshotLog.commit(nation.filter(col("n_nationkey") % 5 === i)
        .coalesce(1), table)                                    // v1..v5
    }
    val batches =
      collection.mutable.ArrayBuffer[(Long, Set[(Long, String, Int)])]()
    val q = spark.readStream
      .format(classOf[graft.sources.GraftCdfSourceProvider].getName)
      .option("path", table.toString)
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", root.resolve("cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches += ((id, b.select(col("n_nationkey").cast("long"),
            col("_change_type"), col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          .toSet))
        ()
      }.start()
    assert(q.awaitTermination(120000), "AvailableNow run must terminate")
    assert(batches.map(_._1).toSeq == (0L to 4L),
      s"capped AvailableNow must cover all 5 versions, got " +
        s"${batches.map(_._1)}")
    val folded = batches.flatMap(_._2).collect {
      case (k, "insert", _) => k }.toSet
    assert(folded == (0L until 25L).toSet,
      "the capped AvailableNow fold must cover the full history")
  }
}
