package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Skew-mitigation operators.
  *
  * A hot grouping key turns one reducer into the job's critical path. For
  * algebraic aggregates the fix is salting: aggregate on (key, salt) first —
  * spreading a hot key over N reducers — then combine the partials on the
  * key alone. Exact-decimal partials make the two-phase result identical to
  * the one-phase aggregate, which is what lets the DuckDB oracle verify the
  * operator with a plain GROUP BY.
  *
  * (Joins get skew handling from AQE's skew-join splitting — enabled via
  * `spark.sql.adaptive.*` — so no hand-rolled join salting is needed.)
  */
object Skew {

  /** Two-phase salted aggregation: count + exact-decimal sums per key. */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltBuckets: Int,
      sums: Map[String, Column]): DataFrame = {
    // murmur hash on the native value — no per-row string render like a
    // crc32-over-cast would cost; the salt value itself is result-neutral
    val salted = df.groupBy(key.as("k"), pmod(hash(key), lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("partial_n"),
        sums.map { case (n, c) => sum(c).as(s"partial_$n") }.toSeq: _*)
    salted.groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"),
        sums.keys.map(n => sum(col(s"partial_$n")).as(n)).toSeq: _*)
  }

  // ------------------------------------------------------ q22_salted_agg
  /** Revenue per return flag via the salted two-phase plan. l_returnflag has
    * only 3 values — exactly the pathological low-cardinality/hot-key shape
    * salting exists for. Result is bit-identical to the plain aggregate. */
  def q22SaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedAgg(
      // width-guarded (round 17): the salted partial aggregate pipelines
      // inside the scan task — a few-file table caps it at scan-split
      // width; identity at warehouse file counts (the salt still spreads
      // the REDUCE side, which is the shape the gate exists to pin)
      Scans.wide(s,
        lineitem(s, d).select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        col("l_orderkey")),
      col("l_returnflag"), saltBuckets = 16,
      Map("qty" -> Relational.dec2(col("l_quantity")),
        "revenue" -> (Relational.dec2(col("l_extendedprice")) *
          (Relational.one - Relational.frac2(col("l_discount"))))))
      .select(col("k").as("l_returnflag"), col("n"),
        col("qty").cast("double").as("sum_qty"),
        col("revenue").cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))

  // --------------------------------------------------------- q23_approx
  /** Sketch aggregates: HyperLogLog distinct + approximate quantiles. Sketch
    * outputs are engine-specific (no DuckDB oracle); instead the query
    * carries an in-gate error-bound check ([[GateChecks]]): every group's
    * sketch must land within 10% (HLL) / 20% (median) of the exact
    * aggregates computed in the same job, or the query returns zero rows. */
  def q23Approx(s: SparkSession, d: String): DataFrame = {
    // sketches and the exact-median twin share ONE scan (countDistinct in
    // the same agg would force an Expand that doubles the rows through the
    // aggregate — measured 2x slower); the exact distinct count runs as a
    // two-level aggregation, map-side combined on (flag, partkey), and
    // joins back at 3-row size. The per-group error verdict folds to an
    // all-groups verdict with a 3-row window, not a re-execution.
    // NOT width-guarded (round-17 A/B): the exact-percentile partial state
    // is the full value multiset, so it crosses the network either way —
    // widening measured flat (1.70 → 1.80 s) and was reverted
    val scan = lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median_price"),
        count(lit(1)).as("n_rows"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"))
    val distincts = lineitem(s, d)
      .select(col("l_returnflag").as("rf"), col("l_partkey")).distinct()
      .groupBy(col("rf")).agg(count(lit(1)).as("exact_parts"))
    val both = scan.join(broadcast(distincts), col("l_returnflag") === col("rf"))
    val ok = abs(col("approx_parts") - col("exact_parts")).cast("double") /
        col("exact_parts") < 0.1 &&
      abs(col("approx_median_price") - col("exact_median")) /
        col("exact_median") < 0.2
    both
      .withColumn("gate_ok", min(ok).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("gate_ok"))
      .select(col("l_returnflag"), col("approx_parts"),
        col("approx_median_price"), col("n_rows"),
        // measured per-group sketch error, visible per round against the
        // 10% / 20% bounds (GateChecks.require doc convention)
        (abs(col("approx_parts") - col("exact_parts")) * 1000000L /
          col("exact_parts")).cast("long").as("distinct_err_ppm"),
        (abs(col("approx_median_price") - col("exact_median")) * 1000000L /
          col("exact_median")).cast("long").as("median_err_ppm"))
      .orderBy(col("l_returnflag"))
  }

  // --------------------------------------------------- q24_topk_per_key
  /** Top-3 orders per customer through the custom [[graft.plans.TopKPerGroup]]
    * physical operator (bounded heaps, partial+final stages) instead of a
    * window sort — same semantics as q7 minus the rank column, so the same
    * windowed SQL oracles it. */
  def q24TopKPerKey(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerGroup(
      orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      groupCols = Seq(col("o_custkey")),
      orderCols = Seq(col("o_totalprice") -> false, col("o_orderkey") -> true),
      k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_salted_agg" -> q22SaltedAgg,
    "q23_approx" -> q23Approx,
    "q24_topk_per_key" -> q24TopKPerKey
  )

  val oracleSql: Map[String, String] = Map(
    "q22_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin
  )
}
