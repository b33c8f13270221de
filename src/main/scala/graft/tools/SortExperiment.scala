package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid (round 16): measure the range-sort double-execution cost —
  * a global orderBy's RangePartitioner SAMPLES its child (executing the
  * full upstream pipeline once) before the real shuffle executes it
  * again, so expensive derived columns computed BELOW the sort are paid
  * twice. Compares k1's shape (cast below sort) against the
  * cast-above-sort twin and checks bit-identical output. */
object SortExperiment {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = graft.Tables.lineitem(spark, sf)
    def below = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(9,2)").cast("string").as("price_i32"),
        col("l_extendedprice").cast("decimal(18,4)").cast("string").as("price_i64"),
        col("l_extendedprice").cast("decimal(38,6)").cast("string").as("price_i128"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    def above = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(9,2)").cast("string").as("price_i32"),
        col("l_extendedprice").cast("decimal(18,4)").cast("string").as("price_i64"),
        col("l_extendedprice").cast("decimal(38,6)").cast("string").as("price_i128"))
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("cast-below")(below.queryExecution.toRdd.count())
    time("cast-above")(above.queryExecution.toRdd.count())
    // identical output? compare ordered md5 of all columns
    val h1 = below.select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("price_i32"), col("price_i64"), col("price_i128"))).as("h"))
      .agg(md5(concat_ws(",", collect_list(col("h")))).as("all")).head.getString(0)
    val h2 = above.select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("price_i32"), col("price_i64"), col("price_i128"))).as("h"))
      .agg(md5(concat_ws(",", collect_list(col("h")))).as("all")).head.getString(0)
    println(s"hash below=$h1 above=$h2 equal=${h1 == h2}")
    println("== cast-above plan (is the Project above the Sort?)")
    println(above.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
