package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** SQ8 quantization kernel (s4): representation size, dequantization error
  * bound, degenerate-dimension exactness, and the end-to-end gated query.
  * Recall floors are justified by measurement (graft.tools.Measure →
  * NOTES.md), not here — the spec pins the kernel's contracts. */
class Sq8Spec extends AnyFunSuite {
  import TestSession._

  test("sq8 codes are byte arrays (4x smaller than float32) and ADC dot is error-bounded") {
    import spark.implicits._
    import graft.functions.QuantizeFunctions._
    val lo = Seq(0.0, -0.75, -1.0, 5.0)
    val hi = Seq(1.0, 1.0, 1.0, 5.0) // last dim degenerate (lo == hi)
    val step = lo.zip(hi).map { case (l, h) => (h - l) / 255.0 }
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f, -1.0f, 5.0f)),
      (2L, Array(0.25f, -0.75f, 0.1f, 5.0f)),
      (3L, Array(1.0f, 0.0f, 1.0f, 5.0f))
    ).toDF("id", "v")
    val q = Seq(0.3f, -0.2f, 0.8f, 0.5f)

    val enc = vecs.select(col("id"), col("v"),
      sq8Encode(col("v"), lo, step).as("code"))
    assert(enc.schema("code").dataType.asInstanceOf[ArrayType].elementType == ByteType,
      "codes must be 1 byte per dimension")

    val rows = enc
      .select(col("id"), col("v"), sq8AdcDot(typedLit(q), col("code"), lo, step).as("adot"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val exact = q.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
      // per-dim dequantization error ≤ step/2 (round-to-nearest), so the
      // dot error is bounded by Σ |q_i| · step_i / 2 — plus float slack
      val bound = q.zip(step).map { case (a, st) => math.abs(a.toDouble) * st / 2 }.sum + 1e-9
      assert(math.abs(r.getDouble(2) - exact) <= bound,
        s"id=${r.getLong(0)}: |${r.getDouble(2)} - $exact| > $bound")
    }

    // degenerate dimension decodes exactly: code 0 → lo, contributing
    // q_3 * 5.0 with zero error — verified implicitly by the bound above
    // (step_4 = 0 adds nothing to it), asserted explicitly here
    val code = enc.filter(col("id") === 1L).select(col("code")).head.getSeq[Byte](0)
    assert(code(3) == -128.toByte, "degenerate dim encodes to shifted zero")
  }

  test("probe plan reads only the code table: no bounds pass, no encode, deterministic rebuild") {
    import graft.operators.Sq8Index
    def deleteIndex(): Unit = {
      val dir = Sq8Index.indexDir(sf)
      if (java.nio.file.Files.isDirectory(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    val c1 = Sq8Index.codes(spark, Sq8Index.ensure(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    deleteIndex()
    val dir = Sq8Index.ensure(spark, sf)
    // the rebuild lands at the SAME keyed path (unchanged corpus) with new
    // part-file names — drop the session's cached file listing or later
    // reads serve the deleted files (production rebuilds only happen when
    // the fingerprint, and hence the path, changes)
    spark.catalog.refreshByPath(dir.toString)
    val c2 = Sq8Index.codes(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    // codes are clamped integer rounds of exact per-dim bounds: integer
    // equality is the right claim (a flipped code is a ranking change)
    assert(c1 == c2, "code table must rebuild identically")
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(c1.size.toLong == corpus)

    // probe plan: the quantized ranking must scan codes/, never re-derive
    // them — no posexplode bounds pass, no encode transform, and the one
    // embeddings scan is the bounded query side
    val plan = Similarity.s4ApproxRanked(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("graft-sq8") || plan.toLowerCase.contains("sq8"),
      s"ranking must read the persisted code table:\n$plan")
    assert(!plan.contains("posexplode"),
      s"bounds derivation must not appear on the probe path:\n$plan")
    val embedScans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(embedScans <= 1,
      s"only the bounded query side may read raw embeddings (found $embedScans):\n$plan")
  }

  test("s4 gated query passes its recall gate and matches the s1 output schema") {
    val s4 = Similarity.s4AnnSq8(spark, sf)
    val rows = s4.collect()
    assert(rows.nonEmpty, "recall gate must pass at test SF")
    assert(s4.columns.toSeq == Seq("q_id", "rank", "vec_id", "cos"))
    // exact rescoring: every returned cos is a true cosine in [-1, 1]
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
  }

  test("logged index survives an UPDATE slice and a replayed bootstrap") {
    import java.nio.file.Files
    import graft.sources.SnapshotLog
    import graft.operators.Sq8Index
    val root = Files.createTempDirectory("graft-sq8log")
    val dir = root.resolve("corpus")
    val idx = root.resolve("index")
    val emb = Tables.embeddings(spark, sf)
    SnapshotLog.commit(emb.repartitionByRange(4, col("vec_id")), dir,
      statsCols = Seq("vec_id"))
    Sq8Index.createLogged(spark, SnapshotLog.read(spark, dir), idx)
    val n1 = Sq8Index.loggedCodes(spark, idx).count()
    // bootstrap REPLAY (the crash-before-cursor-write story): a second
    // create must land on ONE copy, not append a duplicate table
    Sq8Index.createLogged(spark, SnapshotLog.read(spark, dir), idx)
    assert(Sq8Index.loggedCodes(spark, idx).count() == n1,
      "replayed bootstrap must be idempotent in effect")
    // an UPDATE re-embeds some vectors: the CDF slice carries a delete
    // preimage AND an insert postimage for the same id at one version —
    // last-version-wins must keep the vector with its NEW code
    val v = SnapshotLog.updateWhere(spark, dir,
      col("vec_id") % 17 === 3,
      Map("embedding" -> reverse(col("embedding"))))
    Sq8Index.applyCdfLogged(spark, idx,
      SnapshotLog.readChangesCdf(spark, dir, 1, v))
    val codes = Sq8Index.loggedCodes(spark, idx)
    val live = SnapshotLog.read(spark, dir)
    assert(codes.select("vec_id").collect().map(_.getLong(0)).toSet ==
      live.select("vec_id").collect().map(_.getLong(0)).toSet,
      "updated vectors must stay IN the index (delete-wins would drop them)")
    // and the updated ids carry the NEW embedding's code, not the stale one
    val (lo, step) = Sq8Index.loggedBounds(spark, idx)
    import graft.functions.QuantizeFunctions
    val fresh = live.filter(col("vec_id") % 17 === 3)
      .select(col("vec_id"), QuantizeFunctions
        .sq8Encode(col("embedding"), lo, step).as("want"))
    val mismatches = codes.join(fresh, Seq("vec_id"))
      .filter(col("code") =!= col("want")).count()
    assert(mismatches == 0, "updated ids must serve the postimage's code")
  }
}
