package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * DuckDB's single-threaded scan. Raw double columns (clean 2-decimal values,
  * ~1e-13 from their decimal representation, never near a rounding midpoint)
  * are cast to DECIMAL, all arithmetic stays decimal (exact, associative),
  * and only the final scalar is cast back to DOUBLE — bit-identical on both
  * engines regardless of partitioning, at any scale factor. Never cast a
  * *computed* double to decimal: the engines disagree near midpoints.
  *
  * Scale notes are per-query; the common rules: dimensions are broadcast
  * (no shuffle of the fact table for dim joins), aggregations rely on
  * partial/map-side combine, top-k uses TakeOrderedAndProject (no global
  * sort), and window functions shuffle once on their partition key.
  */
object Relational {

  private[graft] def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private[graft] def frac2(c: Column): Column = c.cast("decimal(3,2)")
  private[graft] def one: Column = lit(1).cast("decimal(3,2)")
  /** Exact decimal SUM surfaced as double (same bits on both engines). */
  private[graft] def dsum(e: Column): Column = sum(e).cast("double")

  private val SqlDec =
    "CAST(SUM(CAST(%s AS DECIMAL(12,2))) AS DOUBLE)" // raw-column decimal sum

  // ---------------------------------------------------------------- q1_agg
  /** TPC-H Q1 shape: scan-side partial aggregation (map-side combine) means
    * the shuffle carries ≤ (#groups × #partitions) rows — scale-free. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    // width-guarded (round 17): four decimal sums per row are compute-dense
    // and pipeline INSIDE the scan task; a few-file table caps them at
    // scan-split width. Identity at warehouse file counts, so the map-side
    // combine property below is unchanged at scale.
    Scans.wide(s,
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
        col("l_orderkey"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(dec2(col("l_quantity"))).as("sum_qty"),
        dsum(dec2(col("l_extendedprice"))).as("sum_base_price"),
        dsum(dec2(col("l_extendedprice")) * (one - frac2(col("l_discount")))).as("sum_disc_price"),
        dsum(dec2(col("l_extendedprice")) * (one - frac2(col("l_discount"))) * (one + frac2(col("l_tax")))).as("sum_charge"),
        (dsum(dec2(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ------------------------------------------------------ q2_filter_project
  /** Narrow projection + selective filter: both reach the parquet scan
    * (PushedFilters + 5-column ReadSchema), so IO scales with selectivity,
    * not table width. */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") >= 48.0 &&
        col("l_shipdate") >= lit("1999-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // ---------------------------------------------------------- q3_join_agg
  /** TPC-H Q3 shape: orders⋈lineitem shuffles on orderkey once; top-10 via
    * TakeOrderedAndProject. Customer joins WITHOUT a broadcast hint: its
    * scan size is statically known, so the planner broadcasts it while it
    * fits (pinned in PlanAuditSpec) — customer grows with the corpus
    * (unlike nation/region, bounded by construction), so a hard hint
    * would force an impossible broadcast at warehouse scale where the
    * honest plan shuffles it. */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val l = lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(dec2(col("l_extendedprice")) * (one - frac2(col("l_discount")))).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // --------------------------------------------------------- q4_semi_join
  /** EXISTS via left-semi join — no row multiplication, shuffle carries only
    * the distinct probe keys after Catalyst pushes aggregation. */
  def q4SemiJoin(s: SparkSession, d: String): DataFrame = {
    val bigQty = lineitem(s, d).filter(col("l_quantity") >= 49.0)
      .select(col("l_orderkey"))
    orders(s, d)
      .join(bigQty, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  // -------------------------------------------------------- q5_multi_join
  /** 5-way join: only lineitem⋈orders shuffles on orderkey; the dims all
    * broadcast (zero fact shuffles for them). nation/region keep explicit
    * hints — bounded by construction (25/5 rows) at any corpus size;
    * supplier is hint-free because it GROWS with the corpus, so the
    * planner broadcasts it from its known scan size while it fits and
    * shuffles it at warehouse scale. */
  def q5MultiJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"))
    lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(dec2(col("l_extendedprice")) * (one - frac2(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --------------------------------------------------------- q6_cond_agg
  /** TPC-H Q6 shape: fully pushed-down filters + single global aggregate —
    * the classic scan-dominated query. */
  def q6CondAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24.0)
      .agg(dsum(dec2(col("l_extendedprice")) * frac2(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  // ------------------------------------------------------ q7_window_rank
  /** Ranking window: one shuffle on the partition key, in-partition sort;
    * rank predicate prunes before any further operator. */
  def q7WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // --------------------------------------------------- q8_window_running
  /** Running total per customer — decimal accumulator so the frame sum is
    * exact under any evaluation strategy (Spark running-frame vs DuckDB
    * segment tree). */
  def q8WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_spend", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("orderdate"), col("running_spend"))
      .orderBy(col("o_custkey"), col("orderdate"), col("o_orderkey"))
  }

  // --------------------------------------------------- q31_window_range
  /** Value-based (RANGE) window frame: per-customer trailing-30-day spend.
    * Unlike ROWS frames, the frame bound is a value predicate on the order
    * date — all ties enter the frame together, so the result is
    * deterministic without a full-order tiebreak. Both engines order on
    * integer epoch days so the frame arithmetic is identical. */
  def q31WindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_date(col("o_orderdate").cast("date")))
      .rangeBetween(-30, 0)
    orders(s, d)
      .withColumn("trailing_30d", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // ------------------------------------------------------ q32_lag_ntile
  /** Offset + distribution window functions: lag/lead against the prior
    * and next order, ntile spend-quartile per customer — the remaining
    * window-function families (q7 covers ranking, q8/q31 frames). */
  def q32LagNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))).as("spend_quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // ------------------------------------------------------ q33_json_struct
  /** Schema-full JSON parsing: from_json into a typed struct (vs q27's
    * per-path get_json_object), then field access + predicate on the
    * parsed columns. */
  def q33JsonStruct(s: SparkSession, d: String): DataFrame = {
    val schema = "k LONG, cat STRING"
    events(s, d)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL(schema)).as("p"))
      .select(col("event_id"), col("p.k").as("k"), col("p.cat").as("cat"))
      .filter(col("k") > 50)
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------------- q9_topk
  /** Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    * heaps + driver merge of k rows, never a global sort. */
  def q9TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  // ----------------------------------------------------------- q10_setops
  /** Set operators: EXCEPT/INTERSECT are distinct-set semantics in both
    * engines; Spark's union is bag semantics, so distinct() restores SQL
    * UNION. */
  def q10SetOps(s: SparkSession, d: String): DataFrame = {
    def custsIn(year: Int): DataFrame =
      orders(s, d)
        .filter(col("o_orderdate") >= lit(f"$year-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit(f"${year + 1}-01-01 00:00:00").cast("timestamp"))
        .select(col("o_custkey"))
    custsIn(1995).except(custsIn(1996))
      .union(custsIn(1997).intersect(custsIn(1998)))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  // ----------------------------------------------------------- q11_rollup
  /** ROLLUP grouping sets — Catalyst expands to a single Expand + one
    * aggregation pass (not one scan per grouping set). */
  def q11Rollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(dec2(col("c_acctbal"))).as("total_bal"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))

  // --------------------------------------------------------- q12_distinct
  /** Exact distinct aggregation: Catalyst rewrites to a two-phase expand +
    * partial distinct, keeping the shuffle keyed on (group, value). */
  def q12Distinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  // ------------------------------------------------------------- q13_anti
  /** NOT EXISTS via left-anti join; build side (order keys) aggregates to
    * distinct keys before the join. */
  def q13Anti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d)
          .filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs_no_orders"))
      .orderBy(col("c_mktsegment"))

  // ----------------------------------------------------------- q14_scalar
  /** Scalar function battery (string/math/modulo) — all codegen'd builtins,
    * no UDFs, so the whole projection stays in one WholeStageCodegen span. */
  def q14Scalar(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_type"), 1, 6).as("type_pfx"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        abs(col("p_size") - lit(25)).as("size_dist"),
        (col("p_partkey") % 7).as("key_mod"),
        (dec2(col("p_retailprice")) * lit(10)).cast("double").as("price_x10"))
      .orderBy(col("p_partkey"))

  // ----------------------------------------------------------- q34_datefns
  /** Date-function battery: truncation, calendar arithmetic with month-end
    * clamping (add_months), day diffs, last-of-month, day-of-week (both
    * engines: 1 = Sunday after adjustment), ISO week/quarter extraction. */
  def q34DateFns(s: SparkSession, d: String): DataFrame =
    // date battery ABOVE the sort (round 16, k1's rationale): the range
    // sampler executes the sort's child twice, and the 7 derived columns
    // would widen the exchange ~4×; sort key o_orderkey is unique, so
    // the post-sort project cannot reorder rows
    orders(s, d)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        date_trunc("month", col("od")).cast("date").as("month_start"),
        add_months(col("od"), 1).as("next_month"),
        datediff(to_date(lit("1998-12-31")), col("od")).as("days_to_end"),
        last_day(col("od")).as("month_end"),
        dayofweek(col("od")).as("dow"),
        quarter(col("od")).as("q"),
        year(col("od")).as("y"))

  // ----------------------------------------------------------- q35_strfns
  /** String-function battery beyond q14: padding, char translation,
    * trimming, case-insensitive containment, edit distance (also the
    * fuzzy-dedup primitive), and split-part extraction. */
  def q35StrFns(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        col("p_type").contains("BRASS").as("has_brass"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("edit_dist"),
        element_at(split(col("p_type"), " "), 1).as("type_word1"))
      .orderBy(col("p_partkey"))

  // ------------------------------------------------------ q36_grouping_sets
  /** Explicit GROUPING SETS with mixed sets + GROUPING() disambiguation —
    * completes the grouping-sets family (q11 ROLLUP, q30 CUBE). Expressed
    * through SQL because the Dataset API exposes only the rollup/cube
    * shorthands. */
  def q36GroupingSets(s: SparkSession, d: String): DataFrame =
    TempViews.withViews(s, "lineitem_gs" -> lineitem(s, d)) { v =>
      s.sql(s"""
        SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) AS INT) AS g_flag,
          CAST(grouping(l_linestatus) AS INT) AS g_status,
          COUNT(*) AS n
        FROM ${v("lineitem_gs")}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    }

  // --------------------------------------------------------- q37_array_fns
  /** Array higher-order functions over the token column: filter (long
    * tokens), transform (lengths), exists (any numeric token), in-order
    * aggregate fold (total chars) — the array-processing surface a
    * document pipeline leans on. */
  def q37ArrayFns(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"),
        size(filter(col("t"), x => length(x) >= 8)).as("n_long"),
        element_at(transform(col("t"), x => length(x)), 1).as("len1"),
        exists(col("t"), x => x.rlike("^[0-9]+$")).as("has_number"),
        aggregate(col("t"), lit(0), (acc, x) => acc + length(x)).as("total_chars"))
      .orderBy(col("doc_id"))

  // ----------------------------------------------------------- q15_having
  /** GROUP BY + HAVING: the having predicate is applied post-aggregation by
    * Catalyst as a plain filter — no second pass. */
  def q15Having(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"), sum(col("p_size")).as("total_size"))
      .filter(col("n_parts") >= 5)
      .orderBy(col("p_brand"))

  // --------------------------------------------------------- q16_subquery
  /** Scalar subquery: the 1-row aggregate is broadcast (literal-like) and the
    * comparison is evaluated scan-side — no shuffle of customer at all. */
  def q16Subquery(s: SparkSession, d: String): DataFrame = {
    val avgBal = customer(s, d)
      .agg((dsum(dec2(col("c_acctbal"))) / count(lit(1))).as("avg_bal"))
    customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  // ------------------------------------------------------------ q17_asof
  /** As-of join (reference lacks it; DuckDB has ASOF JOIN natively): for
    * each 'error' event, the latest 'signup' of the same user at-or-before
    * its timestamp.
    *
    * Scalable realization: instead of the quadratic join+filter, the two
    * event streams are unioned, shuffled ONCE on user_id, sorted within the
    * partition, and matched with a running `last(_, ignoreNulls)` window —
    * O(n log n) per partition, no row multiplication, no skew from users
    * with many signups. Nanosecond longs (`ts_ns`) keep the comparison
    * exact; at equal timestamps the signup sorts first (ASOF `>=` match).
    */
  def q17AsOf(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("error", "signup"))
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), when(col("event_type") === "signup", 0).otherwise(1))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val signupId = when(col("event_type") === "signup", col("event_id"))
    val signupTs = when(col("event_type") === "signup", col("ts_ns"))
    ev
      .withColumn("signup_event_id", last(signupId, ignoreNulls = true).over(w))
      .withColumn("signup_ts_ns", last(signupTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "error" && col("signup_event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("signup_event_id"),
        // per-timestamp µs truncation (not gap-level) to mirror how DuckDB
        // reads parquet TIMESTAMP(NANOS): floor to micros, then subtract
        (expr("ts_ns div 1000") - expr("signup_ts_ns div 1000")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------ q18_in_subquery
  /** IN <subquery> as a left-semi join against a computed top-3 list (3 rows
    * → broadcast). */
  def q18InSubquery(s: SparkSession, d: String): DataFrame = {
    val topBrands = part(s, d)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p_brand"))
      .limit(3)
      .select(col("p_brand").as("tb"))
    part(s, d)
      .join(broadcast(topBrands), col("p_brand") === col("tb"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  // ----------------------------------------------------------- q19_pivot
  /** Conditional aggregation (manual pivot): single scan, single shuffle on
    * the group key; CASE WHEN keeps it codegen-friendly. */
  def q19Pivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", dec2(col("value")))).cast("double").as("purchase_value"),
        sum(when(col("event_type") === "click", dec2(col("value")))).cast("double").as("click_value"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  // ------------------------------------------------- q20_window_tumbling
  /** Tumbling-window aggregation (batch twin of the streaming op): bucket =
    * hour truncation, emitted as epoch micros so both engines agree on the
    * representation regardless of timestamp physical unit. */
  def q20WindowTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(dec2(col("value"))).as("total_value"))
      .orderBy(col("bucket_us"), col("event_type"))

  // ------------------------------------------------- q25_recursive_cte
  /** Recursive CTE (Spark 4 WITH RECURSIVE): a month spine over the order
    * date range, left-joined to per-month order counts — empty months
    * appear with 0. Identical SQL runs on both engines. */
  private val monthSpineSql =
    """WITH RECURSIVE months(m) AS (
      |  SELECT CAST('1995-01-01' AS DATE)
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
      |  WHERE m < CAST('2001-07-01' AS DATE)
      |)
      |SELECT m AS month, COUNT(o_orderkey) AS n_orders
      |FROM months LEFT JOIN %s
      |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      |GROUP BY m ORDER BY m""".stripMargin

  def q25RecursiveCte(s: SparkSession, d: String): DataFrame =
    TempViews.withViews(s, "orders_rcte" -> orders(s, d)) { v =>
      s.sql(monthSpineSql.format(v("orders_rcte")))
    }

  // ------------------------------------------------------ q26_string_agg
  /** Ordered string aggregation: sorted-distinct collect (deterministic on
    * both engines, unlike raw collect order). */
  def q26StringAgg(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))

  // ------------------------------------------------------------ q27_json
  /** JSON extraction over the events props column. */
  def q27Json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .orderBy(col("k_mod"))

  // ----------------------------------------------------------- q28_regex
  /** Regex extraction/replacement (Java regex vs DuckDB RE2 agree on these
    * anchored/char-class basics). */
  def q28Regex(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("type_consonants"))
      .orderBy(col("p_partkey"))

  // --------------------------------------------------------- q29_lateral
  /** Correlated LATERAL subquery — per-customer order stats computed by a
    * dependent subquery, decorrelated by Catalyst into a join. */
  def q29Lateral(s: SparkSession, d: String): DataFrame =
    TempViews.withViews(s,
      "cust_lat" -> customer(s, d), "ord_lat" -> orders(s, d)) { v =>
      s.sql(
        s"""SELECT c_custkey, c_name, t.max_price, t.n
           |FROM ${v("cust_lat")},
           |LATERAL (SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
           |                COUNT(*) AS n
           |         FROM ${v("ord_lat")} WHERE o_custkey = c_custkey) t
           |WHERE t.n > 0
           |ORDER BY c_custkey""".stripMargin)
    }

  // -------------------------------------------------------------- q30_cube
  /** CUBE grouping sets — all 4 combinations in one Expand+aggregate pass
    * (completes the grouping-sets family next to q11's ROLLUP). */
  def q30Cube(s: SparkSession, d: String): DataFrame =
    // width-guarded (round 17): CUBE expands every row ×4 into the partial
    // aggregate — compute-dense enough that a single-split scan serializes
    // it; the guard is identity at warehouse file counts (guide §2.5)
    Scans.wide(s,
        lineitem(s, d).select(col("l_orderkey"), col("l_returnflag"),
          col("l_linestatus"), col("l_quantity")),
        col("l_orderkey"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(dec2(col("l_quantity"))).as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  // --------------------------------------------------- q50_agg_pushdown
  /** Statistics-only aggregation: COUNT(*)/MIN/MAX answered from parquet
    * FOOTER statistics via DataSource-V2 aggregate pushdown — the scan
    * reads row-group metadata, not rows. At 100 TB this is the difference
    * between a metadata operation and a full table scan for the most
    * common monitoring queries. Runs in a child session because the
    * pushdown needs the V2 parquet path (`useV1SourceList=""`) and
    * `parquet.aggregatePushdown=true`, neither of which should leak to
    * the other gates (V1 is the default path everything else is audited
    * on). `pushdown_ok` is computed from the executed plan — the scan
    * must carry `PushedAggregation: [COUNT(*), MIN(..), MAX(..)]` — so a
    * conf or plan regression that silently falls back to a row scan flips
    * the gate red while the values (oracle-checked) stay correct. */
  def q50AggPushdown(s: SparkSession, d: String): DataFrame = {
    val ns = s.newSession()
    ns.conf.set("spark.sql.sources.useV1SourceList", "")
    ns.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val agg = lineitem(ns, d).agg(
      expr("count(*)").as("n_rows"),
      min(col("l_orderkey")).as("min_key"),
      max(col("l_orderkey")).as("max_key"))
    val pushed = {
      val p = agg.queryExecution.executedPlan.toString
      p.contains("PushedAggregation: [COUNT(*), MIN(l_orderkey), MAX(l_orderkey)]")
    }
    agg.withColumn("pushdown_ok", lit(pushed))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_agg_pushdown" -> q50AggPushdown,
    "q25_recursive_cte" -> q25RecursiveCte,
    "q26_string_agg" -> q26StringAgg,
    "q29_lateral" -> q29Lateral,
    "q30_cube" -> q30Cube,
    "q27_json" -> q27Json,
    "q28_regex" -> q28Regex,
    "q1_agg" -> q1Agg,
    "q2_filter_project" -> q2FilterProject,
    "q3_join_agg" -> q3JoinAgg,
    "q4_semi_join" -> q4SemiJoin,
    "q5_multi_join" -> q5MultiJoin,
    "q6_cond_agg" -> q6CondAgg,
    "q7_window_rank" -> q7WindowRank,
    "q8_window_running" -> q8WindowRunning,
    "q31_window_range" -> q31WindowRange,
    "q32_lag_ntile" -> q32LagNtile,
    "q33_json_struct" -> q33JsonStruct,
    "q34_datefns" -> q34DateFns,
    "q35_strfns" -> q35StrFns,
    "q36_grouping_sets" -> q36GroupingSets,
    "q37_array_fns" -> q37ArrayFns,
    "q9_topk" -> q9TopK,
    "q10_setops" -> q10SetOps,
    "q11_rollup" -> q11Rollup,
    "q12_distinct" -> q12Distinct,
    "q13_anti" -> q13Anti,
    "q14_scalar" -> q14Scalar,
    "q15_having" -> q15Having,
    "q16_subquery" -> q16Subquery,
    "q17_asof" -> q17AsOf,
    "q18_in_subquery" -> q18InSubquery,
    "q19_pivot" -> q19Pivot,
    "q20_window_tumbling" -> q20WindowTumbling
  )

  val oracleSql: Map[String, String] = Map(
    "q50_agg_pushdown" ->
      """SELECT COUNT(*) AS n_rows, MIN(l_orderkey) AS min_key,
        |  MAX(l_orderkey) AS max_key, TRUE AS pushdown_ok
        |FROM lineitem""".stripMargin,
    "q25_recursive_cte" -> monthSpineSql.format("orders"),
    "q29_lateral" ->
      """SELECT c_custkey, c_name, t.max_price, t.n
        |FROM customer,
        |LATERAL (SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
        |                COUNT(*) AS n
        |         FROM orders WHERE o_custkey = c_custkey) t
        |WHERE t.n > 0
        |ORDER BY c_custkey""".stripMargin,
    "q30_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q26_string_agg" ->
      """SELECT n_name,
        |  array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
        |  COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q27_json" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod,
        |  COUNT(*) AS n, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin,
    "q28_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_consonants
        |FROM part ORDER BY p_partkey""".stripMargin,
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 48.0
        |  AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_multi_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_cond_agg" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.06
        |  AND l_quantity < 24.0""".stripMargin,
    "q7_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, orderdate, o_orderkey""".stripMargin,
    "q31_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q32_lag_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_orderkey, 1) OVER w AS prev_order,
        |  LEAD(o_orderkey, 1) OVER w AS next_order,
        |  CAST(NTILE(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey) AS INT) AS spend_quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q33_json_struct" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k,
        |  props->>'$.cat' AS cat
        |FROM events
        |WHERE CAST(props->>'$.k' AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    "q34_datefns" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_end,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q35_strfns" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '#') AS brand_pad,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
        |  trim('  ' || p_brand || '  ') AS brand_trim,
        |  contains(p_type, 'BRASS') AS has_brass,
        |  CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS edit_dist,
        |  string_split(p_type, ' ')[1] AS type_word1
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q36_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q37_array_fns" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(t, x -> length(x) >= 8)) AS INT) AS n_long,
        |  CAST(list_transform(t, x -> length(x))[1] AS INT) AS len1,
        |  len(list_filter(t, x -> regexp_matches(x, '^[0-9]+$'))) > 0 AS has_number,
        |  CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS INT) AS total_chars
        |FROM t ORDER BY doc_id""".stripMargin,
    "q9_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,
    "q10_setops" ->
      """SELECT o_custkey FROM (
        |  (SELECT DISTINCT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |   EXCEPT
        |   SELECT DISTINCT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |  UNION
        |  (SELECT DISTINCT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |   INTERSECT
        |   SELECT DISTINCT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
        |) ORDER BY o_custkey""".stripMargin,
    "q11_rollup" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q12_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q13_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS n_custs_no_orders
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q14_scalar" ->
      """SELECT p_partkey,
        |  UPPER(p_brand) AS brand_u,
        |  SUBSTRING(p_type, 1, 6) AS type_pfx,
        |  LENGTH(p_name) AS name_len,
        |  p_brand || '/' || p_type AS brand_type,
        |  ABS(p_size - 25) AS size_dist,
        |  p_partkey % 7 AS key_mod,
        |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 10 AS DOUBLE) AS price_x10
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q15_having" ->
      """SELECT p_brand, COUNT(*) AS n_parts, CAST(SUM(p_size) AS BIGINT) AS total_size
        |FROM part
        |GROUP BY p_brand
        |HAVING COUNT(*) >= 5
        |ORDER BY p_brand""".stripMargin,
    "q16_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q17_asof" ->
      """SELECT e.event_id, e.user_id, s.event_id AS signup_event_id,
        |  epoch_us(e.ts) - epoch_us(s.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin,
    "q18_in_subquery" ->
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE p_brand IN (SELECT p_brand FROM part GROUP BY p_brand
        |                  ORDER BY COUNT(*) DESC, p_brand LIMIT 3)
        |ORDER BY p_partkey""".stripMargin,
    "q19_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click_value,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |  COUNT(*) AS n_events
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q20_window_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_us, event_type""".stripMargin
  )
}
