package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineExt

/** Invariants behind the deterministic split/sample operators: the whole
  * point of hash-bucketed assignment is independence from physical layout
  * and corpus composition — pin both. */
class SplitSampleSpec extends AnyFunSuite {
  import TestSession._

  test("t11: split assignment is a pure function of doc_id (layout-independent)") {
    val base = PipelineExt.t11Split(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // same corpus read at a different parallelism must assign identically
    val reparted = documents()
    assert(base.nonEmpty)
    reparted.foreach { case (id, split) =>
      assert(base(id) == split, s"doc $id flipped split under repartition")
    }
    // every bucket maps to the documented 90/5/5 band
    val buckets = PipelineExt.t11Split(spark, sf).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    buckets.foreach { case (b, s0) =>
      val expected = if (b < 90) "train" else if (b < 95) "validation" else "test"
      assert(b >= 0 && b < 100 && s0 == expected, s"bucket $b labeled $s0")
    }
  }

  private def documents(): Map[Long, String] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(7)
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    docs.select(col("doc_id"), bucket.as("b"))
      .withColumn("split",
        when(col("b") < 90, "train")
          .when(col("b") < 95, "validation").otherwise("test"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
  }

  test("t17: weighted sample decisions are per-row pure and weights are exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = PipelineExt.t17WeightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length < docs.size,
      "sample should keep some but not all documents")
    // recompute every decision locally: u = first 32 md5 bits of
    // "id:ws1" as a uniform, p = min(1, n_chars/400), keep iff u < p —
    // and the emitted weight must be exactly 1/p (Horvitz-Thompson)
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"$id:ws1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expected = docs.collect { case (id, nc)
      if u(id) < math.min(1.0, nc.toDouble / 400.0) => id }.toSet
    assert(got.map(_._1).toSet == expected,
      "sample membership must equal the locally recomputed hash decisions")
    got.foreach { case (id, p, w) =>
      assert(p == math.min(1.0, docs(id).toDouble / 400.0), s"doc $id p drift")
      assert(w == 1.0 / p, s"doc $id weight != 1/p")
    }
    // membership is a pure function of the row: restricting the corpus to
    // one source must not change which of its documents survive
    val keep = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source")).head.getString(0)
    val dir = java.nio.file.Files.createTempDirectory("graft-t17")
    try {
      spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("source") === keep)
        .write.parquet(dir.resolve("documents.parquet").toString)
      val restricted = PipelineExt.t17WeightedSample(spark, dir.toString)
        .collect().map(_.getLong(0)).toSet
      val fullKeep = PipelineExt.t17WeightedSample(spark, sf)
        .filter(col("source") === keep).collect().map(_.getLong(0)).toSet
      assert(restricted == fullKeep,
        "a document's sampling decision must not depend on the rest of the corpus")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("t13: sample membership survives corpus growth (only k-boundary churn)") {
    // removing documents from OTHER strata must not change a stratum's
    // sample; within a stratum, dropping a non-sampled doc keeps the
    // sample identical — hash-order selection has no global coupling
    val full = PipelineExt.t13StratifiedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val sources = full.map(_._1)
    assert(sources.size > 1, "need multiple strata for the invariant to bite")
    val keep = sources.head
    // rerun over a corpus restricted to one source: its sample is unchanged
    val dir = java.nio.file.Files.createTempDirectory("graft-t13")
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === keep)
      .write.parquet(dir.resolve("documents.parquet").toString)
    val restricted = PipelineExt.t13StratifiedSample(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(restricted == full.filter(_._1 == keep),
      "a stratum's sample must not depend on other strata")
  }
}
