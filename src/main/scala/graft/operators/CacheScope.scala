package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for intra-query persist() calls so gate runners can release
  * them after each query materializes.
  *
  * Query builders (d4/d5's shared signature stages, [[GateChecks
  * .requireCached]]) persist intermediate frames that two branches of ONE
  * query share. The builders return lazy DataFrames, so they cannot
  * unpersist themselves — the cache must outlive the builder and die with
  * the query's action. Without a release seam, MEMORY_AND_DISK blocks from
  * every cached query accumulate across a 69-query Verify/Bench session.
  *
  * Contract: builders call [[persist]]; runners call [[releaseAll]] after
  * each query's materialization (Verify: after the parquet write; Bench:
  * after each timed run, so the measured run pays its own cache build —
  * Spark's CacheManager matches by plan equality, so a warm-run cache
  * would otherwise silently serve the timed run).
  */
object CacheScope {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    live.add(cached)
    cached
  }

  /** Unpersist every registered frame (non-blocking). Safe to call when
    * nothing is registered, or twice. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      df = live.poll()
    }
  }
}
