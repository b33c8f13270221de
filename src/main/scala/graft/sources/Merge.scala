package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-based merge (CDC upsert/delete) into parquet — the maintenance
  * primitive a lake pipeline runs between full rewrites: apply a changeset
  * (upserts + deletes) to a base table and produce the merged snapshot.
  *
  * Semantics (one changeset row per key wins over base):
  *   - changeset row with `_deleted = false` REPLACES the base row (or
  *     inserts if absent)
  *   - changeset row with `_deleted = true` DROPS the base row
  *   - base rows with no changeset entry pass through
  *
  * Scale posture: one shuffle on the merge key for the left-anti
  * (base minus changed keys) plus the changeset's own scan — both sides
  * aggregate/join on the key only, no row multiplication. When the
  * changeset is small (the common CDC case) Catalyst broadcasts it and
  * the base table never shuffles at all. The snapshot write is a plain
  * parallel parquet write; pair with [[Compact]] for file sizing.
  */
object Merge {

  /** Returns the merged snapshot (lazy; caller writes/sinks it). */
  def merge(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val dataCols = base.columns.filter(_ != key)
    require(changes.columns.contains("_deleted"),
      "changeset must carry a boolean _deleted column")
    val changedKeys = changes.select(col(key))
    val survivors = base.join(changedKeys, Seq(key), "left_anti")
    val upserts = changes.filter(!col("_deleted"))
      .select(col(key) +: dataCols.map(col): _*)
    survivors.unionByName(upserts)
  }

  /** Merge and materialize to parquet, returning the snapshot reader. */
  def mergeToParquet(
      s: SparkSession, base: DataFrame, changes: DataFrame,
      key: String, outPath: String): DataFrame = {
    merge(base, changes, key).write.mode("overwrite").parquet(outPath)
    s.read.parquet(outPath)
  }
}
