package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.sources.{JdbcSink, ParquetSink}

/** End-to-end ETL-path queries: these run the actual sink/reverse-path
  * machinery inside the correctness gate, then read the produced artifacts
  * back so DuckDB can independently verify the result. */
object EtlQueries {

  // -------------------------------------------------- e1_sink_roundtrip
  /** lineitem → ParquetSink with row-count splitting (`out_01.par`…) →
    * read the split files back → aggregate. The sums check byte fidelity;
    * `split_ok` checks the split invariant (every file ≤ the 20k-row cap,
    * and at least ⌈rows/20k⌉ files — the exact count depends on source
    * task partitioning, which an engine-independent oracle can't model). */
  def e1SinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft-e1")
    val out = dir.resolve("out.par")
    val files = ParquetSink.write(
      lineitem(s, d), out.toString,
      ParquetSink.Options(rowGroupsPerFile = 1, batchRows = 20000))
    val perFile = s.read.parquet(files.map(_.toString): _*)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("c"),
        sum(Relational.dec2(col("l_extendedprice"))).as("p"))
    perFile.agg(
      sum(col("c")).as("n_rows"),
      sum(col("p")).cast("double").as("total_price"),
      (max(col("c")) <= 20000 &&
        count(lit(1)) >= expr("(sum(c) + 19999) div 20000")).as("split_ok"))
  }

  // -------------------------------------------------- e2_jdbc_roundtrip
  /** region → JDBC insert (auto-generated statement) into an embedded Derby
    * table, then the exec path (`?name?` placeholders) doubles every row,
    * then read back over JDBC and count per key — exercising the full
    * reverse path (insert.rs + execute.rs semantics) against a real
    * database. */
  def e2JdbcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val db = s"graftverify${System.nanoTime()}"
    val url = s"jdbc:derby:memory:$db;create=true"
    val r = region(s, d)
    JdbcSink.insert(r, url, "regions", batchRows = 2)
    // Spark's JDBC writer creates case-sensitive quoted columns on Derby, so
    // the user-authored exec statement quotes them too
    JdbcSink.exec(r,
      """INSERT INTO regions ("r_regionkey", "r_name") VALUES (?r_regionkey?, ?r_name?)""",
      url, batchRows = 2)
    s.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "regions")
      .load()
      .groupBy(col("r_regionkey"), col("r_name"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("r_regionkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_sink_roundtrip" -> e1SinkRoundtrip,
    "e2_jdbc_roundtrip" -> e2JdbcRoundtrip
  )

  val oracleSql: Map[String, String] = Map(
    "e1_sink_roundtrip" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        |  TRUE AS split_ok
        |FROM lineitem""".stripMargin,
    "e2_jdbc_roundtrip" ->
      """SELECT r_regionkey, r_name, CAST(2 AS BIGINT) AS n
        |FROM region ORDER BY r_regionkey""".stripMargin
  )
}
