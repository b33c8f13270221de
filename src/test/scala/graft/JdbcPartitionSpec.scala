package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Cli
import graft.sources.{JdbcPartitioning, JdbcSink}

/** Partitioned JDBC parallel reads (SURVEY §4.2 — the Spark answer to the
  * reference's concurrent fetch, fetch_batch.rs:93-152): partition count
  * pinned in the physical plan, bounds auto-derivation, and the two
  * semantics a user hits first — NULL keys land in the FIRST partition,
  * and bad bounds cost balance, never rows. */
class JdbcPartitionSpec extends AnyFunSuite {
  import TestSession._

  private def freshUrl(tag: String): String =
    s"jdbc:derby:memory:graftjp$tag${System.nanoTime()};create=true"

  private def seed(url: String, table: String, n: Long): Unit = {
    import spark.implicits._
    JdbcSink.insert((1L to n).map(i => (i, s"v$i")).toDF("id", "v"), url, table, 500)
  }

  test("partitioned read opens N range cursors: plan text and partition count pinned") {
    val url = freshUrl("n")
    seed(url, "t1", 1000)
    val back = JdbcPartitioning.read(
      spark, url, """SELECT "id", "v" FROM t1""", "\"id\"", numPartitions = 4)
    // N Spark partitions = N independent result-set cursors
    assert(back.rdd.getNumPartitions == 4)
    // the JDBC relation records its partition count in the plan — a
    // regression to a single-cursor read is visible in plan text
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("numPartitions=4"),
      s"JDBC scan is not partitioned:\n$plan")
    assert(back.count() == 1000)
    // uniform keys + derived exact bounds: every cursor fetched rows
    val perPart = back.select(spark_partition_id().as("p"))
      .groupBy(col("p")).count().collect()
    assert(perPart.length == 4 && perPart.forall(_.getLong(1) > 0),
      s"expected 4 non-empty cursors: ${perPart.mkString(",")}")
  }

  test("auto-derived bounds equal the true min/max of the query result") {
    val url = freshUrl("b")
    seed(url, "t2", 257)
    assert(JdbcPartitioning.deriveBounds(
      url, """SELECT "id" FROM t2""", "\"id\"").contains((1L, 257L)))
    // bounds derive over the QUERY, not the table: a filtered subquery
    // narrows them
    assert(JdbcPartitioning.deriveBounds(
      url, """SELECT "id" FROM t2 WHERE "id" >= 100""", "\"id\"")
      .contains((100L, 257L)))
  }

  test("NULL partition keys land in the first partition and are never lost") {
    val url = freshUrl("0")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("v", StringType, nullable = false)))
    val rows = (1L to 100L).map(i => Row(i, s"v$i")) ++
      (1 to 10).map(i => Row(null, s"n$i"))
    JdbcSink.insert(
      spark.createDataFrame(new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema),
      url, "t3", 500)
    val back = JdbcPartitioning.read(
      spark, url, """SELECT "id", "v" FROM t3""", "\"id\"",
      numPartitions = 4, bounds = Some((1L, 100L)))
    assert(back.count() == 110, "NULL-keyed rows must not be dropped")
    // Spark's first generated predicate is `col < lo+stride OR col IS
    // NULL` — every NULL row is fetched by cursor 0, exactly once
    val nullParts = back.filter(col("id").isNull)
      .select(spark_partition_id()).distinct().collect().map(_.getInt(0)).toSeq
    assert(nullParts == Seq(0), s"NULL rows fetched by cursors $nullParts")
  }

  test("bounds narrower than the data cost balance, not rows (skew semantics)") {
    val url = freshUrl("s")
    seed(url, "t4", 1000)
    val back = JdbcPartitioning.read(
      spark, url, """SELECT "id", "v" FROM t4""", "\"id\"",
      numPartitions = 4, bounds = Some((400L, 600L)))
    // the edge predicates are open (`< lo+stride OR NULL` / `>= hi-stride`)
    // so out-of-range keys skew into the first/last cursor but survive
    assert(back.count() == 1000)
    assert(back.select(sum(col("id"))).head().getLong(0) == 1000L * 1001L / 2)
  }

  test("empty/all-NULL partition column falls back to a single-cursor read") {
    val url = freshUrl("e")
    seed(url, "t5", 10)
    // empty result: no bounds derivable
    assert(JdbcPartitioning.deriveBounds(
      url, """SELECT "id" FROM t5 WHERE "id" < 0""", "\"id\"").isEmpty)
    val back = JdbcPartitioning.read(
      spark, url, """SELECT "id", "v" FROM t5 WHERE "id" < 0""", "\"id\"",
      numPartitions = 4)
    assert(back.count() == 0)
    assert(back.rdd.getNumPartitions <= 1, "fallback must not fabricate cursors")
  }

  test("cli: partitioned-read flags parse, validate, and reach the reader") {
    val (_, c) = Cli.parse(Seq("query",
      "--connection-string", "jdbc:derby:memory:x",
      "--jdbc-partition-column", "id",
      "--jdbc-num-partitions", "8",
      "--jdbc-bounds", "5:500",
      "out.par", "SELECT 1"))
    assert(c.jdbcPartitionColumn.contains("id"))
    assert(c.jdbcNumPartitions.contains(8))
    assert(c.jdbcBounds.contains((5L, 500L)))
    intercept[IllegalArgumentException] {
      Cli.parse(Seq("query", "--jdbc-bounds", "9:1", "o", "s"))
    }
    intercept[IllegalArgumentException] {
      Cli.parse(Seq("query", "--jdbc-bounds", "abc", "o", "s"))
    }
    // tuning flags without the column would silently fall back to a
    // single-cursor read — must refuse instead
    intercept[IllegalArgumentException] {
      Cli.parse(Seq("query", "--jdbc-num-partitions", "8", "o", "s"))
    }
    intercept[IllegalArgumentException] {
      Cli.parse(Seq("query", "--jdbc-bounds", "1:100", "o", "s"))
    }
  }

  test("cli: query end-to-end with a partitioned source writes correct parquet") {
    val url = freshUrl("q")
    seed(url, "t6", 300)
    val out = java.nio.file.Files.createTempDirectory("graft-jp").resolve("out.par")
    try {
      Cli.runQuery(Cli.Conf(
        connectionString = Some(url),
        jdbcPartitionColumn = Some("\"id\""),
        jdbcNumPartitions = Some(3),
        positional = Vector(out.toString, """SELECT "id", "v" FROM t6""")),
        sparkOpt = Some(spark))
      val rt = spark.read.parquet(out.toString)
      assert(rt.count() == 300)
      assert(rt.select(sum(col("id"))).head().getLong(0) == 300L * 301L / 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      out.getParent.toFile)
  }
}
