package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: print the executed plan of named gate queries —
  * `sbt "runMain graft.tools.PlanDump q55_funnel d15_source_overlap"`.
  * The audit loop is: dump the plan here, decide what property makes it
  * scale, pin that property in PlanAuditSpec. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // parquet reader policy pinned at session build so timestamp
      // dtypes never depend on whether an events load ran first
      // (Tables.events also sets these lazily for ad-hoc sessions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"===== $n")
      println(graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
