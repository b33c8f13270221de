package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 q72 adjudication probe (VERDICT #9): attribute q72's per-row
  * kernel cost. Hypothesis: the two always-failing TRY casts (the
  * priority label "1-URGENT" parses as neither INT nor DOUBLE) pay a
  * constructed-and-caught SparkNumberFormatException PER ROW inside
  * Spark's own Cast(EvalMode.TRY) codegen — an engine-level floor, not
  * missing codegen or a closure in our query. The A/B isolates it:
  * identical shapes with failing vs succeeding casts. */
object CastProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val o = spark.read.parquet(s"$sf/orders.parquet").select(col("o_orderpriority"))
    o.persist()
    println("rows=" + o.count())
    def time(label: String)(df: => DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        System.gc(); val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-30s min=${ts.min}%.3fs runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("A full q72 project") { o.select(
      expr("try_cast(o_orderpriority AS INT)"),
      expr("try_cast(substr(o_orderpriority,1,1) AS INT)"),
      expr("try_cast(o_orderpriority AS DOUBLE)"),
      expr("try_element_at(split(o_orderpriority,'-'), 9)")) }
    time("B succeed-only subset") { o.select(
      expr("try_cast(substr(o_orderpriority,1,1) AS INT)"),
      expr("try_element_at(split(o_orderpriority,'-'), 9)")) }
    time("C failing TRY casts only") { o.select(
      expr("try_cast(o_orderpriority AS INT)"),
      expr("try_cast(o_orderpriority AS DOUBLE)")) }
    time("D same casts, input parses") { o.select(
      expr("try_cast(substr(o_orderpriority,1,1) AS INT)"),
      expr("try_cast(substr(o_orderpriority,1,1) AS DOUBLE)")) }
    println("=== executedPlan (codegen spans) of the q72 project ===")
    val q = o.select(expr("try_cast(o_orderpriority AS INT)").as("w"),
      expr("try_cast(substr(o_orderpriority,1,1) AS INT)").as("l"),
      expr("try_cast(o_orderpriority AS DOUBLE)").as("d"),
      expr("try_element_at(split(o_orderpriority,'-'), 9)").as("e"))
    q.queryExecution.toRdd.count()
    println(q.queryExecution.executedPlan.toString.take(1200))
    spark.stop()
  }
}
