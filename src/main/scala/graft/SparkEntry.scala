package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories. Every key in [[queries]]
  * with a DuckDB-expressible semantic also appears in [[oracleSql]]; the
  * driver's DuckDB compare is the correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.RelationalExt.queries ++
      operators.PipelineExt.queries ++
      operators.CurationExt.queries ++
      operators.TypeKernelQueries.queries ++
      operators.EtlQueries.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Skew.queries ++
      streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++
      operators.RelationalExt.oracleSql ++
      operators.PipelineExt.oracleSql ++
      operators.CurationExt.oracleSql ++
      operators.TypeKernelQueries.oracleSql ++
      operators.EtlQueries.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.Multimodal.oracleSql ++
      operators.Skew.oracleSql ++
      streaming.StreamingOps.oracleSql
}
