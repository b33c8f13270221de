package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIndex, Similarity}

/** Product-quantization kernels and lifecycle (s5): LUT/score kernel
  * exactness against a hand-computed twin, code-table shape (M bytes per
  * vector — 16× smaller than float32), deterministic rebuild, probe-plan
  * pinning, and the end-to-end gated query. Recall floors are justified
  * by measurement (graft.tools.Measure → NOTES.md), not here. */
class PqSpec extends AnyFunSuite {
  import TestSession._

  test("pq LUT + score kernels equal the reconstructed-centroid dot exactly") {
    import spark.implicits._
    import graft.functions.QuantizeFunctions._
    // toy model: 2 subspaces × 2 dims, 4 centroids each (flat [m][c][dim])
    val books: Seq[Double] = Seq(
      0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0, 1.0, // m=0: c0..c3
      2.0, 0.0, 0.0, 2.0, 2.0, 2.0, -1.0, -1.0 // m=1: c0..c3
    )
    val ks = 4
    val subDim = 2
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType while
    // the code table stores array<tinyint>
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 2.0f, 1.0f), Seq(1.toByte, 2.toByte)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f), Seq(3.toByte, 0.toByte))
    ).toDF("id", "q", "code")
    val rows = df.select(col("id"),
      pqLutScore(pqLut(col("q"), books, ks, subDim), col("code"), ks).as("adot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // id=1: q_sub0 · c1 = 0.5·1 + (−0.25)·0 = 0.5 ; q_sub1 · c2 = 2·2 + 1·2 = 6
    assert(rows(1L) == 0.5 + 6.0)
    // id=2: q_sub0 · c3 = 1 + 1 = 2 ; q_sub1 · c0 = 1·2 + 1·0 = 2
    assert(rows(2L) == 2.0 + 2.0)
  }

  test("pq codes are M bytes per vector and rebuild deterministically") {
    def deleteIndex(): Unit = {
      val dir = PqIndex.indexDir(sf)
      if (java.nio.file.Files.isDirectory(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    val codes = PqIndex.codes(spark, PqIndex.ensure(spark, sf))
    assert(codes.schema("code").dataType.asInstanceOf[ArrayType].elementType == ByteType)
    val c1 = codes.collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(c1.values.forall(_.length == PqIndex.M), s"codes must be M=${PqIndex.M} bytes")
    assert(c1.values.forall(_.forall(b => b >= 0 && b < PqIndex.Ks)),
      "every code must be a valid centroid id")
    deleteIndex()
    val dir = PqIndex.ensure(spark, sf)
    spark.catalog.refreshByPath(dir.toString)
    val c2 = PqIndex.codes(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    // cluster assignments are argmins over means whose merge order may
    // produce ~1e-12 centroid jitter; near-tie flips are possible in
    // principle but not observed — integer equality is the claim that
    // catches a recipe change (the Sq8Spec standard)
    assert(c1 == c2, "code table must rebuild identically")
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(c1.size.toLong == corpus)
  }

  test("probe plan reads only the code table: no training scan, no encode") {
    PqIndex.ensure(spark, sf)
    // no 'pq' substring fallback: the scoring kernel's own name would
    // match it even after a regression to inline re-encoding (the s4
    // no-vacuous-contains rule) — the persisted dir name is the claim
    val plan = Similarity.s5ApproxRanked(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("graft-pq"),
      s"ranking must read the persisted code table:\n$plan")
    assert(!plan.contains("posexplode"),
      s"Lloyd mean derivation must not appear on the probe path:\n$plan")
    val embedScans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(embedScans <= 1,
      s"only the bounded query side may read raw embeddings (found $embedScans):\n$plan")
  }

  test("s7 IVF-PQ probe: partition-pruned coded lists, keyed candidate join, no full-corpus scan") {
    import graft.operators.IvfPqIndex
    IvfPqIndex.ensure(spark, sf)
    val probe = Similarity.s7Probe(spark, sf)
    val plan = probe.queryExecution.executedPlan.toString
    // probe I/O: the coded-lists scan must carry the static cluster-id
    // partition filter — I/O is O(probed lists), never O(corpus)
    assert(plan.contains("graft-ivfpq"), s"probe must read the coded lists:\n$plan")
    assert("PartitionFilters: \\[[^]]*c#".r.findFirstIn(plan).isDefined,
      s"cluster-id partition pruning missing from the lists scan:\n$plan")
    // candidate generation is KEYED on cluster id (each query scores only
    // its probed lists) — never a nested-loop over the corpus
    assert(!plan.contains("CartesianProduct"),
      s"IVF-PQ candidates must never be a cross product:\n$plan")
    // the ADC kernel scores codes natively
    assert(plan.contains("pqlutscore") || plan.contains("PqLutScore"),
      s"PQ scoring kernel missing:\n$plan")
    // results: exact top-5 per query after rescoring
    val rows = probe.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
  }

  test("s5 gated query passes its recall gate and matches the s1 output schema") {
    val s5 = Similarity.s5AnnPq(spark, sf)
    val rows = s5.collect()
    assert(rows.nonEmpty, "recall gate must pass at test SF")
    // trailing recall_ppm: the no-oracle gates report their measured
    // margin as a constant column (GateChecks.require doc)
    assert(s5.columns.toSeq == Seq("q_id", "rank", "vec_id", "cos", "recall_ppm"))
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
  }
}
