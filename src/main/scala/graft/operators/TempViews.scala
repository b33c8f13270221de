package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Collision-free temp views for SQL-expressed queries (GROUPING SETS,
  * LATERAL, EXISTS, parameter binding — surfaces the Dataset API doesn't
  * cover). Round-5 verdict: constant view names (`graft_cust_ex`, ...)
  * collide when two queries run concurrently in one session — harmless
  * under the serial Verify/Bench runners, a footgun for library consumers.
  *
  * [[withViews]] registers each frame under a per-call nonce name, hands
  * the generated names to the SQL builder, and drops the views before
  * returning: `spark.sql` resolves the plan eagerly, so the returned
  * DataFrame stays valid after the views are gone and ZERO named state
  * outlives the call. */
private[graft] object TempViews {

  def withViews(s: SparkSession, dfs: (String, DataFrame)*)(
      body: Map[String, String] => DataFrame): DataFrame = {
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "")
    val names = dfs.map { case (base, df) =>
      val n = s"${base}_$nonce"
      df.createOrReplaceTempView(n)
      base -> n
    }.toMap
    try body(names)
    finally names.values.foreach(s.catalog.dropTempView(_))
  }
}
