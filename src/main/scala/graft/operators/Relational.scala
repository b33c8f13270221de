package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator pack.
  *
  * The reference delegates every relational operator to the backing DBMS by
  * shipping the SQL text verbatim (reference `src/query.rs:90-98`); capability
  * parity therefore means answering the same query classes natively. Each
  * query here is a lazy DataFrame plan — Catalyst handles pushdown, join
  * strategy, and partial aggregation; none materializes on the driver.
  *
  * Numeric stabilization pattern for the DuckDB oracle: floating-point SUM is
  * order-dependent, and a 32-way shuffle sums in a different order than
  * DuckDB's single-threaded scan. Per-row values are cast to DECIMAL(18,4)
  * (exact, associative addition), summed exactly, and the final scalar cast
  * back to DOUBLE — bit-identical on both engines regardless of partitioning,
  * at any scale factor.
  */
object Relational {

  /** Exact-decimal views of the clean-2-decimal double source columns.
    * Casting the RAW column (not a computed product) to decimal is safe:
    * stored values sit ~1e-13 from their decimal representation, far from any
    * rounding midpoint, so Spark and DuckDB agree bit-for-bit. All downstream
    * arithmetic stays in decimal (exact, associative) until a final cast. */
  private[operators] def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private[operators] def frac2(c: Column): Column = c.cast("decimal(3,2)")
  private[operators] def one: Column = lit(1).cast("decimal(3,2)")
  /** Exact decimal SUM surfaced as double (same bits on both engines). */
  private[operators] def dsum(e: Column): Column = sum(e).cast("double")

  // ---------------------------------------------------------------- q1_agg
  /** TPC-H Q1 shape: scan-side partial aggregation (map-side combine) means
    * the shuffle carries ≤ (#groups × #partitions) rows — scale-free. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(dec2(col("l_quantity"))).as("sum_qty"),
        dsum(dec2(col("l_extendedprice"))).as("sum_base_price"),
        dsum(dec2(col("l_extendedprice")) * (one - frac2(col("l_discount")))).as("sum_disc_price"),
        dsum(dec2(col("l_extendedprice")) * (one - frac2(col("l_discount"))) * (one + frac2(col("l_tax")))).as("sum_charge"),
        (dsum(dec2(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
