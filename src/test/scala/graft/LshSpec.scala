package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LshIndex, Similarity}

/** Sign-once/probe-many audit for the persisted LSH signature table (s2),
  * mirroring IvfSpec: deterministic rebuild, and — the round-7 contract —
  * no full-corpus signature computation anywhere in the probe plan:
  * hyperplane products are paid once at build, probes read the table. */
class LshSpec extends AnyFunSuite {
  import TestSession._

  private def deleteIndex(): Unit = {
    val dir = LshIndex.indexDir(sf)
    if (Files.isDirectory(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("signature table rebuild is deterministic and covers the corpus once") {
    val d1 = LshIndex.signatures(spark, LshIndex.ensure(spark, sf))
      .select("vec_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    deleteIndex()
    val dir = LshIndex.ensure(spark, sf)
    // rebuild lands at the SAME keyed path with new part-file names — drop
    // the session's cached file listing (the Sq8Spec lesson; production
    // rebuilds change the fingerprint and hence the path)
    spark.catalog.refreshByPath(dir.toString)
    val d2 = LshIndex.signatures(spark, dir)
      .select("vec_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // signatures are sign-bits of dot products: exact integer equality is
    // the right claim (a flipped bit means a different bucket, not noise)
    assert(d1 == d2, "signatures must rebuild identically (fixed-seed planes)")
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(d1.size.toLong == corpus, s"table holds ${d1.size}, corpus $corpus")
  }

  test("probe plan reads only the index: no raw-embeddings scan, no signature recompute") {
    LshIndex.ensure(spark, sf)
    val plan = Similarity.s2Found(spark, sf).queryExecution.executedPlan.toString

    // signatures can only be computed from raw vectors, so zero scans of
    // embeddings.parquet ⟹ zero per-execution hyperplane products — the
    // whole point of persisting the table
    assert(!plan.contains("embeddings.parquet"),
      s"probe plan still scans the raw corpus:\n$plan")
    // and it must actually read the persisted artifact
    assert(plan.contains("graft-lsh") || plan.contains(
        sys.env.getOrElse("SPARK_GRAFT_LSH_DIR", "graft-lsh")),
      s"probe plan does not read the LSH index:\n$plan")
  }

  test("s2 SERVING path: candidate join over the persisted bucketed table, zero exchanges") {
    // round-8 promotion of what was previously only a demonstration: the
    // index build itself writes banded/ bucketed on (i, v), the probe
    // re-registers it as an external CLUSTERED BY table, and the ACTUAL
    // s2 candidate stage must plan with no shuffle on either side — the
    // e7 layout investment applied to ANN serving.
    LshIndex.ensure(spark, sf)
    // static plan (AQE wraps everything in an adaptive leaf, hiding
    // exchanges from collect — same rationale as e7)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Similarity.s2Candidates(spark, sf)
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty,
        s"bucketed candidate join still shuffles:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0, "candidate join must produce candidates")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("gate query stays green on the persisted path (recall floor unchanged)") {
    val rows = Similarity.s2AnnLsh(spark, sf).collect()
    assert(rows.nonEmpty, "recall gate must hold at test SF")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.head == 1 && ranks.sameElements(1 to ranks.length))
    }
  }
}
