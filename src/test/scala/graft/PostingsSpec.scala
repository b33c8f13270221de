package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PostingsIndex, TextAnalysis}

/** Build-once/probe-many audit for the persisted postings index (t24),
  * mirroring IvfSpec/LshSpec: the probe must be partition-pruned to the
  * query terms' buckets and never rescan the raw corpus, and its result
  * must be bit-identical to the batch twin t18 (the shared-oracle claim). */
class PostingsSpec extends AnyFunSuite {
  import TestSession._

  private val terms = Seq("join", "spark", "dup")

  test("driver-side bucket function matches the build-side crc32 expression") {
    // the pruning contract: the bucket the build WROTE a term into must be
    // the bucket the probe COMPUTES for it, or pruning silently reads the
    // wrong directories and lists come back empty
    val fromExpr = spark.range(1).select(
      explode(lit(terms.toArray)).as("tok"))
      .select(col("tok"), pmod(crc32(col("tok")), lit(PostingsIndex.Buckets.toLong)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      assert(PostingsIndex.bucketOf(t) == fromExpr(t),
        s"bucketOf('$t') diverges from the crc32 expression")
    }
  }

  test("probe plan is partition-pruned to the query terms' buckets; no corpus scan") {
    val dir = PostingsIndex.ensure(spark, sf)
    val p = PostingsIndex.lists(spark, dir, terms)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("b#"),
      s"posting-list scan must prune on the bucket partition column:\n$p")
    assert(!p.contains("documents.parquet"),
      s"probe must never rescan the raw corpus:\n$p")
    // full probe too: scoring adds docmeta/stats (index reads), still no corpus
    val full = PostingsIndex.topK(spark, sf, terms, 10)
      .queryExecution.executedPlan.toString
    assert(!full.contains("documents.parquet"),
      s"scoring path must read only index artifacts:\n$full")
  }

  test("t24 is result-identical to its batch twin t18 (the shared-oracle claim)") {
    val fromIndex = PostingsIndex.topK(spark, sf, terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = TextAnalysis.t18Bm25(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fromIndex == batch,
      "postings-served BM25 must reproduce the batch computation exactly")
    assert(fromIndex.nonEmpty)
  }

  test("build is a no-op when the index exists; rebuild serves same results") {
    val dir = PostingsIndex.ensure(spark, sf)
    val before = PostingsIndex.topK(spark, sf, terms, 10).collect().toSeq
    // second ensure must not rebuild (same dir, files untouched)
    val fp = org.apache.commons.io.FileUtils.listFiles(
      dir.toFile, null, true).size
    PostingsIndex.ensure(spark, sf)
    val fp2 = org.apache.commons.io.FileUtils.listFiles(
      dir.toFile, null, true).size
    assert(fp == fp2, "ensure on an existing index must be a no-op")
    // delete + rebuild lands identical results (deterministic build)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    val dir2 = PostingsIndex.ensure(spark, sf)
    spark.catalog.refreshByPath(dir2.toString)
    val after = PostingsIndex.topK(spark, sf, terms, 10).collect().toSeq
    assert(before == after, "rebuilt index must serve identical rankings")
  }

  test("t23 encode: lossless (symbols concatenate back to the word) and complete") {
    // every encoded word's symbols must concatenate to the original word —
    // the invariant that makes BPE a TOKENIZATION and not a hash; checked
    // on the trained vocab the encode path joins against
    val vocab = TextAnalysis.t22VocabAfterTraining(spark, sf)
    val broken = vocab.filter(expr("array_join(s, '') <> word")).count()
    assert(broken == 0, s"$broken vocab words do not round-trip through their symbols")
    // and encoding strictly compresses: symbols never exceed characters
    val grew = vocab.filter(expr("size(s) > length(word)")).count()
    assert(grew == 0, "merges can only shrink the symbol sequence")
    val out = TextAnalysis.t23BpeEncode(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("n_syms") < col("n_words")).count() == 0,
      "a word encodes to at least one symbol")
  }
}
