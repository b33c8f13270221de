package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational surface extensions (round 3): full outer join, exact-sum
  * statistics, unpivot, bucketed interval join, EXISTS/NOT EXISTS.
  *
  * Same capability-parity rationale as [[Relational]]: the reference ships
  * SQL verbatim to the backing DBMS (reference `src/query.rs:90-98`), so
  * each DBMS-side operator class needs a native Catalyst realization.
  *
  * Oracle float rule used throughout: aggregate in EXACT arithmetic
  * (decimal / bigint sums), cast the exact sums to double, then derive
  * statistics with IDENTICAL double expression trees on both engines —
  * IEEE ops on equal inputs are bit-equal regardless of partitioning.
  */
object RelationalExt {

  import Relational.{dec2, dsum}

  // ------------------------------------------------------- q38_full_outer
  /** FULL OUTER join of two pre-aggregated daily series (orders placed vs
    * lineitems shipped). Both sides reduce map-side before the join, so the
    * shuffled data is one row per (day) per side regardless of fact size;
    * the full-outer sort-merge join on the day key is scale-free. */
  def q38FullOuter(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day_o"))
      .agg(count(lit(1)).as("n_orders"))
    val l = lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day_l"))
      .agg(count(lit(1)).as("n_shipped"))
    o.join(l, col("day_o") === col("day_l"), "full_outer")
      .select(coalesce(col("day_o"), col("day_l")).as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy(col("day"))
  }

  // ------------------------------------------------------ q39_stats_battery
  /** Per-brand descriptive statistics from exact sums: sample stddev and
    * Pearson correlation derived from bigint/decimal sums (never the
    * engine's own streaming variance, whose merge order is partition-
    * dependent), plus the discrete median (an actual element, no
    * interpolation arithmetic). One shuffle total: the group-by carries
    * five partial sums and the percentile state. */
  def q39StatsBattery(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("p_size").cast("long")).cast("double").as("sx"),
        sum((col("p_size") * col("p_size")).cast("long")).cast("double").as("sx2"),
        dsum(dec2(col("p_retailprice"))).as("sy"),
        sum(dec2(col("p_retailprice")) * dec2(col("p_retailprice")))
          .cast("double").as("sy2"),
        sum(dec2(col("p_retailprice")) * col("p_size")).cast("double").as("sxy"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY p_size)").as("median_size"))
      // identical double expression trees to the oracle SQL — bit-equal.
      // percentile_disc returns double in Spark; the element is an int
      // (DuckDB's quantile_disc surface), so cast back — exact either way.
      .selectExpr("p_brand", "n", "CAST(median_size AS INT) AS median_size",
        "sqrt((n * sx2 - sx * sx) / (n * (n - 1))) AS stddev_size",
        "sqrt((n * sy2 - sy * sy) / (n * (n - 1))) AS stddev_price",
        ("(n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx)" +
          " * sqrt(n * sy2 - sy * sy)) AS corr_size_price"))
      .orderBy(col("p_brand"))

  // ---------------------------------------------------------- q40_unpivot
  /** UNPIVOT (wide → long): each metric column becomes (metric, value)
    * rows via Dataset.unpivot — Catalyst's Expand node, one scan, no
    * shuffle, output partitioning inherited from the scan. */
  def q40Unpivot(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  // ----------------------------------------------------- q41_interval_join
  /** Interval join with time-bucket blocking: for each error event, count
    * same-user purchases within ±10 minutes.
    *
    * The scalable shape: equi-join on (user_id, 10-minute bucket), with the
    * probe side exploded to its 3-bucket neighborhood so every true pair
    * meets the join exactly once (the build side keeps its own single
    * bucket) — turning an unbounded range predicate into a bounded
    * equi-join, the standard interval-join binning that survives dense
    * timelines. The exact ±window filter then prunes bucket-boundary false
    * candidates. Timestamps compare in microseconds (`ts_ns div 1000`) —
    * the same truncation DuckDB applies reading TIMESTAMP(NANOS). */
  def q41IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val winUs = 600L * 1000000L // ±10 min in micros
    val ev = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("t_us"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("t_us").as("t_err"))
      .withColumn("bkt",
        explode(sequence(expr(s"t_err div $winUs - 1"), expr(s"t_err div $winUs + 1"))))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u_p"), col("t_us").as("t_pur"),
        expr(s"t_pur div $winUs").as("bkt_p"))
    err.join(pur,
        col("user_id") === col("u_p") && col("bkt") === col("bkt_p") &&
          abs(col("t_err") - col("t_pur")) <= winUs, "left_outer")
      .groupBy(col("err_id"))
      .agg(count(col("t_pur")).as("n_purchases_10m"))
      .orderBy(col("err_id"))
  }

  // ------------------------------------------------------ q42_exists
  /** Correlated EXISTS / NOT EXISTS — customers active in 1996 that churned
    * in 1997. Catalyst decorrelates both subqueries into one semi and one
    * anti join against the same pre-filtered orders scan. */
  def q42Exists(s: SparkSession, d: String): DataFrame =
    TempViews.withViews(s,
      "cust_ex" -> customer(s, d), "ord_ex" -> orders(s, d)) { v =>
      s.sql(existsSql.format(v("cust_ex"), v("ord_ex"), v("ord_ex")))
    }

  private val existsSql =
    """SELECT c_custkey, c_name
      |FROM %s c
      |WHERE EXISTS (SELECT 1 FROM %s o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
      |AND NOT EXISTS (SELECT 1 FROM %s o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------ q43_latest_per_key
  /** Dedup-by-latest: keep each (user, event_type)'s most recent event via
    * ROW_NUMBER() = 1 — the CDC/snapshot idiom. One shuffle on the key;
    * Spark evaluates the rank filter with a WindowGroupLimit push-down
    * (top-1 per group never materializes full partitions). Deterministic
    * tiebreak on event_id for equal timestamps. */
  def q43LatestPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t_us").desc, col("event_id").desc)
    events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("t_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("t_us"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_latest_per_key" -> q43LatestPerKey,
    "q38_full_outer" -> q38FullOuter,
    "q39_stats_battery" -> q39StatsBattery,
    "q40_unpivot" -> q40Unpivot,
    "q41_interval_join" -> q41IntervalJoin,
    "q42_exists" -> q42Exists
  )

  val oracleSql: Map[String, String] = Map(
    "q38_full_outer" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
        |    FROM orders GROUP BY 1),
        |  l AS (SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS n_shipped
        |    FROM lineitem GROUP BY 1)
        |SELECT COALESCE(o.day, l.day) AS day,
        |  CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(n_shipped, 0) AS BIGINT) AS n_shipped
        |FROM o FULL JOIN l ON o.day = l.day
        |ORDER BY day""".stripMargin,
    "q39_stats_battery" ->
      """WITH g AS (SELECT p_brand,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(p_size * p_size AS BIGINT)) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
        |           * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sy2,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * p_size) AS DOUBLE) AS sxy,
        |    quantile_disc(p_size, 0.5) AS median_size
        |  FROM part GROUP BY p_brand)
        |SELECT p_brand, n, median_size,
        |  sqrt((n * sx2 - sx * sx) / (n * (n - 1))) AS stddev_size,
        |  sqrt((n * sy2 - sy * sy) / (n * (n - 1))) AS stddev_price,
        |  (n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx)
        |    * sqrt(n * sy2 - sy * sy)) AS corr_size_price
        |FROM g ORDER BY p_brand""".stripMargin,
    "q40_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "q41_interval_join" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
        |    FROM events)
        |SELECT e.event_id AS err_id, COUNT(p.t_us) AS n_purchases_10m
        |FROM (SELECT * FROM ev WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND abs(e.t_us - p.t_us) <= 600000000
        |GROUP BY e.event_id
        |ORDER BY err_id""".stripMargin,
    "q42_exists" -> existsSql.format("customer", "orders", "orders"),
    "q43_latest_per_key" ->
      """WITH t AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, t_us
        |FROM t WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin
  )
}
