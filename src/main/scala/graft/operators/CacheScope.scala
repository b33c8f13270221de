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

  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[Boolean => Unit]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    live.add(b => { cached.unpersist(b); () })
    cached
  }

  /** Eager local checkpoint with managed block lifetime: truncates lineage
    * (iterative algorithms keep a constant plan shape round over round, so
    * codegen caches hit), while the checkpoint blocks — which Spark frees
    * only on RDD garbage collection — are released by the runner's next
    * [[releaseAll]] instead of lingering across queries.
    *
    * CONTRACT — single materialization: a locally-checkpointed frame cannot
    * be recomputed after its blocks are unpersisted (the lineage is gone by
    * design). Frames built through this seam are therefore valid until the
    * runner's next [[releaseAll]] and must not be re-executed afterwards;
    * a consumer that needs the result again rebuilds it via the query
    * function (Verify/Bench both do — each run calls the builder afresh). */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    val rdds = org.apache.spark.sql.GraftBridge.backingRdds(cp)
    live.add(b => rdds.foreach(_.unpersist(b)))
    cp
  }

  /** As [[localCheckpoint]], but also returns an idempotent early-release
    * handle so a builder can free blocks needed only to materialize a
    * derived checkpoint (d7 frees the directed pair blocks once the
    * undirected edge set is checkpointed — otherwise ~3× the pair data
    * sits in block storage for the whole query). The frame stays
    * registered for [[releaseAll]] as the safety net on abnormal exit. */
  def localCheckpointReleasable(df: DataFrame): (DataFrame, () => Unit) = {
    val cp = df.localCheckpoint(eager = true)
    val rdds = org.apache.spark.sql.GraftBridge.backingRdds(cp)
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    val free: Boolean => Unit = b =>
      if (released.compareAndSet(false, true)) rdds.foreach(_.unpersist(b))
    live.add(free)
    (cp, () => free(false))
  }

  /** Release every registered cache/checkpoint. Safe to call when nothing
    * is registered, or twice. `blocking = true` waits for block removal —
    * use between benchmark timing windows so async cleanup can't bleed
    * into the next query's measurement. */
  def releaseAll(blocking: Boolean = false): Unit = {
    var f = live.poll()
    while (f != null) {
      try f(blocking)
      catch {
        case _: InterruptedException => Thread.currentThread().interrupt()
        case scala.util.control.NonFatal(_) => ()
      }
      f = live.poll()
    }
  }
}
