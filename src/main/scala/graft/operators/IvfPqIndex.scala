package graft.operators

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Persistent IVF-PQ index: the composite of [[IvfIndex]] (coarse
  * pruning) and [[PqIndex]] (code compression) — the IVFADC shape of
  * Jégou et al. (PAPERS.md) that production ANN serves at corpus scale,
  * where BOTH claims must hold at once: a probe reads only its nProbe
  * inverted lists (partition pruning cuts I/O to lists/K of the corpus)
  * AND those lists store 16-byte PQ codes, not float vectors (16× less
  * scan I/O per list).
  *
  * BUILD reuses both trained models — the IVF coarse quantizer and the
  * PQ codebooks come from their own persisted indexes, so the three
  * artifacts stay mutually consistent per corpus — and materializes
  *
  *   lists/   (vec_id, n2, code array<tinyint>) PARTITIONED BY c
  *
  * in one corpus pass. PROBE mirrors s3's: rank the K-row centroid
  * model per query, prune to nProbe list partitions, score the listed
  * CODES with the per-query ADC lookup table (a cluster-KEYED join —
  * each query scores only its probed lists, no nested-loop), rescore
  * the top window exactly. */
object IvfPqIndex {

  /** Probes per query: higher than s3's 6 because PQ scoring inside the
    * probed lists adds its own (rescored) approximation on top of the
    * pruning loss — measured recall with 8 of 16 lists + window 64 is
    * 0.86/0.69 at sf0.01/sf0.1 (NOTES.md trend table), the same margin
    * over the 0.60 floor as s3 itself. */
  val NProbe = 8
  private val FormatVersion = "v1"

  /** The composite key embeds BOTH sub-indexes' format versions and
    * shape knobs: a recipe bump in either (IvfIndex centroid training,
    * PqIndex codebooks, K/M/Ks changes) must miss this directory too, or
    * fresh models would silently score stale coded lists — the exact
    * generation mix the header rules out. */
  def indexDir(d: String): Path = IndexLifecycle.keyedDir(
    "SPARK_GRAFT_IVFPQ_DIR", "graft-ivfpq",
    Paths.get(d).resolve("embeddings.parquet"),
    s"$FormatVersion-ivf${IvfIndex.FormatVersion}k${IvfIndex.K}" +
      s"-pq${PqIndex.FormatVersion}m${PqIndex.M}ks${PqIndex.Ks}")

  def ensure(s: SparkSession, d: String): Path =
    IndexLifecycle.ensureBuilt(indexDir(d)) { staging =>
      val ivfModel = IvfIndex.loadModel(s, IvfIndex.ensure(s, d))
      val books = PqIndex.loadBooks(s, PqIndex.ensure(s, d))
      embeddings(s, d)
        .select(col("vec_id"),
          graft.functions.VectorOps.norm2(col("embedding")).as("n2"),
          IvfIndex.cluster(ivfModel).as("c"),
          PqIndex.codeCol(books).as("code"))
        .write.mode("overwrite").partitionBy("c")
        .parquet(staging.resolve("lists").toString)
    }

  /** The PQ-coded inverted lists for the given cluster ids only — `c` is
    * a partition column, so the IN-filter prunes at planning time. */
  def lists(s: SparkSession, dir: Path, clusters: Seq[Int]): DataFrame =
    s.read.parquet(dir.resolve("lists").toString)
      .filter(col("c").isin(clusters: _*))
}
