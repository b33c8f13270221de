package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Relational, Similarity}

/** Physical-plan audits: these lock in the properties that make the
  * operators scale — pushdown reaching the parquet scan, dimension joins
  * broadcasting, top-k avoiding global sorts, aggregates combining map-side.
  * A regression here won't flip correctness but would be a 10-100× cliff at
  * 100 TB, so it fails the build. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSession._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: filter and projection are pushed to the parquet scan") {
    val p = plan(Relational.q2FilterProject(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), "quantity filter must reach the scan")
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(!p.contains("l_returnflag"), "unreferenced columns must be pruned")
  }

  test("q3/q5: dimension joins broadcast (no fact-table shuffle for dims)") {
    assert(plan(Relational.q3JoinAgg(spark, sf)).contains("BroadcastHashJoin"))
    val p5 = plan(Relational.q5MultiJoin(spark, sf))
    assert(p5.split("BroadcastHashJoin").length >= 4,
      "supplier/nation/region should all broadcast")
  }

  test("q1: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan(Relational.q1Agg(spark, sf))
    assert(p.split("HashAggregate").length >= 3,
      "expect partial + final HashAggregate")
  }

  test("q9: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q9TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q4: EXISTS stays a semi join (no row multiplication)") {
    assert(plan(Relational.q4SemiJoin(spark, sf)).contains("LeftSemi"))
  }

  test("custom expressions run inside WholeStageCodegen") {
    // AQE defers physical planning, so codegen subtrees only materialize with
    // it off — the audit needs the concrete plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val codegen = try {
      operators.TypeKernelQueries.k4TimeText(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = operators.TypeKernelQueries.k4TimeText(spark, sf)
    assert(codegen.contains("WholeStageCodegen subtree"))
    // the kernel calls appear in generated code, not as interpreted fallbacks
    assert(codegen.contains("parseTimeMicros"), "kernel must be compiled into codegen")
    assert(!plan(df).toLowerCase.contains("codegenfallback"))
  }

  test("q74: the high-cardinality running-distinct idiom pays exactly its two keyed exchanges") {
    // the documented cost of the O(1)-state switch: one exchange keyed
    // (user, item) for the first-occurrence ranking, one keyed (user) for
    // the running sum — a third hash exchange would mean the idiom
    // regressed into extra shuffles; AQE off for the concrete plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan(operators.RelationalExt.q74RunningDistinctHicard(spark, sf))
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges == 2,
        s"expected exactly 2 keyed exchanges (got $hashExchanges):\n$p")
      // and no per-row set state: collect_set must not appear anywhere
      assert(!p.contains("collect_set"), "the hicard path must not hold set state")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("d4 minhash: candidate join is keyed on band buckets (hash join, not nested loop)") {
    val p = plan(Dedup.d4MinhashLsh(spark, sf))
    assert(!p.contains("CartesianProduct"), "LSH join must never be a cross product")
    // the only nested-loop join allowed is the 1-row gate-check broadcast
    val bnlj = p.split("BroadcastNestedLoopJoin").length - 1
    assert(bnlj <= 1 && (bnlj == 0 || p.contains("gate_ok")),
      s"only the 1-row GateChecks cross join may be a BNLJ:\n${p.take(2000)}")
  }

  test("d3 jaccard: blocked self-join is an equi-join on the blocking key") {
    val p = plan(Dedup.d3NgramJaccard(spark, sf))
    assert(!p.contains("CartesianProduct"))
  }

  test("DV-aware snapshot reads broadcast the vector and keep column pruning") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-dvplan")
    val cust = Tables.customer(spark, sf)
    graft.sources.SnapshotLog.commit(
      cust.repartitionByRange(2, col("c_custkey")), dir)
    graft.sources.SnapshotLog.deleteWhere(spark, dir, col("c_custkey") % 3 === 0)
    val p = plan(graft.sources.SnapshotLog.read(spark, dir)
      .select(col("c_mktsegment"), col("c_acctbal")))
    // the dead-position side must build a broadcast anti join — a
    // shuffled anti join would exchange the whole table to remove a
    // handful of rows
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV anti-join must broadcast: $p")
    // the metadata identity columns must not break projection pruning:
    // unreferenced data columns stay out of the scan's read schema
    assert(!p.contains("c_name"),
      "unreferenced columns must stay pruned through the DV join")
  }

  test("q33: json parsing reads only the referenced columns") {
    val p = plan(Relational.q33JsonStruct(spark, sf))
    assert(p.contains("event_id") && p.contains("props"))
    assert(!p.contains("user_id"), "unreferenced event columns must be pruned")
  }

  test("q32: both window specs share ONE partition exchange") {
    // lag/lead and ntile partition on the same key with different
    // orderings — the plan must shuffle once and sort twice, not
    // shuffle per window spec
    val p = plan(Relational.q32LagNtile(spark, sf))
    val exchanges = p.split("Exchange hashpartitioning\\(o_custkey").length - 1
    assert(exchanges == 1, s"expected a single window exchange:\n$p")
  }

  test("d14 snapshot diff: ONE full-outer join, text column never read") {
    val p = plan(operators.PipelineExt.d14SnapshotDiff(spark, sf))
    assert(p.split("FullOuter").length - 1 == 1,
      s"diff must be a single full-outer join, not anti+anti+inner:\n$p")
    assert(!p.contains("text"), "snapshot diff reads 3 slim columns, never the payload")
  }

  test("t21 chunking: pure per-row work — no shuffle before the output sort") {
    val p = plan(operators.TextAnalysis.t21ChunkSliding(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle (explode+slice are row-local):\n$p")
    assert(p.contains("Generate explode"), "the chunk-index fan-out is a Generate")
  }

  test("d15 source overlap: self-join keys on the 64-bit hash, not document text") {
    val p = plan(Dedup.d15SourceOverlap(spark, sf))
    assert("""Join \[k1#\d""".r.findFirstIn(p).isDefined,
      s"join must be keyed on the hashed key pair:\n${p.take(1500)}")
    // the distinct collapses each (source, key) BEFORE the join: no raw
    // text column crosses an exchange
    assert(!"(?s)Exchange [^\\n]*text#".r.findFirstIn(p).isDefined,
      "document text must never be a shuffle column")
  }

  test("q55 funnel: per-stage type filters reach the scan; shuffles key on user_id") {
    val p = plan(operators.RelationalExt.q55Funnel(spark, sf))
    Seq("view", "click", "purchase").foreach(t =>
      assert(p.contains(s"EqualTo(event_type,$t)"),
        s"stage filter for '$t' must be pushed to the parquet scan"))
    // every wide shuffle is the per-user aggregate; the only others are
    // the three 1-row SinglePartition stage rollups
    val hashEx = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(hashEx == Set("user_id"), s"unexpected shuffle keys $hashEx:\n${p.take(1200)}")
  }

  test("q56 retention: scan pruned to (ts, user_id); cohort anchor aggregates map-side") {
    val p = plan(operators.RelationalExt.q56Retention(spark, sf))
    // ts is bigint (legacy nanos encoding) or timestamp (micros encoding);
    // either way the scan reads exactly these two columns
    assert(p.contains("ReadSchema: struct<ts:bigint,user_id:bigint>") ||
      p.contains("ReadSchema: struct<ts:timestamp,user_id:bigint>"),
      s"retention reads two columns of the event log:\n${p.take(1200)}")
    assert(p.contains("partial_min"), "the cohort anchor must combine map-side")
  }

  test("NO gate query plans a cartesian product; nested-loop joins only where bounded") {
    // BNLJ is acceptable only with a provably bounded build side: the
    // 1-row GateChecks verdict, q16's 1-row scalar-subquery broadcast,
    // and s1/s3's MaxQueries-limited query set
    // t18's BNLJ build side is a single-row corpus-statistics aggregate
    // d16's two BNLJs are the 64-probe truth-slice broadcast (s1's bound)
    // and the 1-row GateChecks verdict
    // t24's two BNLJs are the 1-row stats×pruned-term-list fold and the
    // 1-row statsWide broadcast — both model-sized by construction
    // e21's BNLJs chain 1-row per-table audit aggregates; t29's is the
    // 1-row corpus-total broadcast under the 50-row top list; t30's and
    // t31's are the same 1-row corpus-total ride-along (t18's shape)
    val boundedBnlj = Set("q16_subquery", "s1_ann_brute", "s3_ann_ivf",
      "d4_minhash_lsh", "d5_simhash_dup", "s2_ann_lsh", "s4_ann_sq8",
      "s5_ann_pq", "s7_ann_ivfpq", "q23_approx", "t4_fingerprint", "t18_bm25",
      "d16_semantic_dedup", "t24_postings_topk", "e21_expectations",
      "s10_hybrid_rrf", // t18's 1-row corpus-statistics broadcast, inherited
      "t29_zipf_coverage", "s8_maxsim", "t30_heavy_hitters",
      "t31_source_drift", "s9_ann_hamming", // s9 = s1's bounded query cross
      "s11_range_search") // s1's bounded query cross, filter instead of top-k
    // ETL queries do eager side work (sink writes, Derby DDL) at plan
    // construction — auditing their read-back plan adds nothing
    val skip = Set("e1_sink_roundtrip", "e2_jdbc_roundtrip", "e3_jdbc_types")
    SparkEntry.queries.filterNot(q => skip(q._1)).foreach { case (name, fn) =>
      val p = plan(fn(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      val bnlj = p.split("BroadcastNestedLoopJoin").length - 1
      assert(bnlj == 0 || boundedBnlj(name),
        s"$name plans an unvetted BroadcastNestedLoopJoin")
    }
  }

  test("multimodal decode parallelism scales with the cluster, not a constant") {
    val n = Multimodal.decodeAll(spark, sf).rdd.getNumPartitions
    val expected = spark.sparkContext.defaultParallelism * 4
    assert(n == expected, s"decode partitions $n != 4×defaultParallelism $expected")
  }

  test("s1 brute-force ANN broadcasts a bounded query set") {
    val p = plan(Similarity.s1AnnBrute(spark, sf))
    // the query side must carry its limit below the broadcast exchange, so
    // the broadcast is ≤ MaxQueries vectors no matter the corpus size
    assert(p.contains(s"limit=${Similarity.MaxQueries}"),
      s"query-side limit must bound the broadcast:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("s4 SQ8 ANN: bounded broadcast, codes scanned as bytes, kernel in codegen") {
    val p = plan(Similarity.s4ApproxRanked(spark, sf))
    // same bounded-broadcast contract as s1 — the quantized pass scans the
    // corpus once against a ≤ MaxQueries broadcast side
    assert(p.contains(s"limit=${Similarity.MaxQueries}"),
      s"query-side limit must bound the broadcast:\n$p")
    // the ADC kernel must appear in the scan-side projection (native
    // expression, not a UDF) — no directory-name fallback here: the plan
    // always contains the 'graft-sq8' scan path, which would make a
    // loose contains("sq8") vacuously true even after a UDF regression
    assert(p.contains("sq8adcdot") || p.contains("Sq8AdcDot"),
      s"quantized scoring kernel missing from the plan:\n$p")
  }

  test("s5 PQ ANN: bounded broadcast, LUT on the query side, score kernel in codegen") {
    val p = plan(Similarity.s5ApproxRanked(spark, sf))
    assert(p.contains(s"limit=${Similarity.MaxQueries}"),
      s"query-side limit must bound the broadcast:\n$p")
    // the M-lookup scoring kernel must be a native expression in the
    // scan-side projection (same no-vacuous-contains rule as s4)
    assert(p.contains("pqlutscore") || p.contains("PqLutScore"),
      s"PQ scoring kernel missing from the plan:\n$p")
    // the LUT builds ONCE per query row on the broadcast side, never per
    // candidate pair: it must not appear above the join
    val afterJoin = p.split("BroadcastNestedLoopJoin").head
    assert(!afterJoin.toLowerCase.contains("pqlut("),
      s"LUT must be computed below the broadcast, not per pair:\n$p")
  }

  test("s6 filtered ANN is a label-KEYED join, never a cross join") {
    val p = plan(Similarity.s6AnnFiltered(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the metadata predicate must key the join — pre-filter, not post-filter:\n$p")
  }

  test("s2 LSH candidate join is an equi join on (band, bucket), never nested-loop") {
    val p = plan(Similarity.s2Found(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation must stay keyed on band buckets:\n$p")
  }

  test("t11 split is scan-shaped: no hash shuffle, only the presentation sort") {
    val p = plan(operators.PipelineExt.t11Split(spark, sf))
    // the split assignment itself is per-row; the only exchange allowed is
    // the range partitioning of the final ORDER BY
    assert(!p.contains("hashpartitioning"),
      s"t11 must not shuffle on any key:\n$p")
  }

  test("t17 weighted sample is scan-shaped: no hash shuffle, only the presentation sort") {
    // keep/weight decisions are pure per-row expressions — at 100 TB this
    // must run entirely map-side inside the scan
    val p = plan(operators.PipelineExt.t17WeightedSample(spark, sf))
    assert(!p.contains("hashpartitioning"),
      s"t17 must not shuffle on any key:\n$p")
  }

  test("d10 bloom decontamination: might_contain pre-filter feeds a shuffle verify join") {
    // at toy SF the optimizer may (correctly) turn the verify join into a
    // broadcast from size stats; the audit asks what d10 DECLARES, so
    // disable auto-broadcast — d8 still broadcasts under this setting
    // (explicit hint), proving the two operators differ where intended
    val p = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      (plan(operators.CurationExt.d10DecontaminateBloom(spark, sf)),
        plan(operators.CurationExt.d8Decontaminate(spark, sf)))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(p._1.contains("might_contain"),
      s"bloom pre-filter must appear in the corpus scan path:\n${p._1}")
    assert(p._1.contains("SortMergeJoin") || p._1.contains("ShuffledHashJoin"),
      s"d10's verify join must not require broadcast in the scale path:\n${p._1}")
    assert(p._2.contains("BroadcastHashJoin"),
      "d8 must keep its explicit broadcast for the tiny-eval fast path")
  }

  test("AQE splits skewed join partitions (platform path next to q22's manual salting)") {
    // q22 demonstrates salting for skew the PLAN can't see coming; this
    // audit pins the platform path for skew discovered at RUNTIME: AQE
    // re-plans a sort-merge join whose shuffle stats reveal a hot key.
    // Thresholds are shrunk so toy data triggers the same machinery a
    // 100 TB hot key would.
    val ns = spark.newSession()
    ns.conf.set("spark.sql.adaptive.enabled", "true")
    ns.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ns.conf.set("spark.sql.shuffle.partitions", "4")
    // 95% of left rows share key 7
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    val left = ns.range(0, 50000)
      .select(when(pmod(col("id"), lit(20)) =!= 0, lit(7L))
        .otherwise(col("id")).as("k"), col("id").as("payload"))
    val right = ns.range(0, 100).select(col("id").as("k"), col("id").as("r"))
    val joined = left.join(right, "k")
    // materialize THIS plan (count() would execute a different, agg-topped
    // query and leave joined's own AQE plan unfinalized)
    assert(joined.queryExecution.toRdd.count() > 0)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "AQE must have finalized")
    assert(p.contains("skew=true"),
      s"runtime skew split did not trigger:\n$p")
  }

  test("e19 SCD2: snapshot aggregate and both windows share ONE key exchange") {
    // the explicit repartition(cust) satisfies the aggregate's (cust, dt)
    // clustering and both windows' partitioning — a second hash exchange
    // means the pipeline re-shuffles the change log at 100 TB
    val p = plan(operators.EtlQueries.e19Scd2(spark, sf))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"aggregate + lag/lead must reuse one key exchange:\n$p")
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(p).size
    // + the final presentation sort's range exchange; nothing more
    assert(exchanges <= 2, s"unexpected extra exchange:\n$p")
  }

  test("e18: the runtime bloom filter is optimizer-injected, and declined for broadcast joins") {
    import org.apache.spark.sql.functions.col
    // injection case is gated in e18 itself (bloom_ok); here pin the
    // negative: with broadcast allowed, InjectRuntimeFilter correctly
    // declines (a broadcast join's build side already prunes the probe)
    val ns = spark.newSession()
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val fact = graft.Tables.lineitem(ns, sf).select(col("l_partkey"), col("l_extendedprice"))
    val dim = graft.Tables.part(ns, sf).filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    val broadcastPlan = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .queryExecution.optimizedPlan.toString
    assert(!broadcastPlan.contains("might_contain"),
      s"bloom filter should not be injected for a broadcastable join:\n$broadcastPlan")
  }

  test("t12 percentiles aggregate partially before the source shuffle") {
    val p = plan(operators.TextAnalysis.t12QualityPercentile(spark, sf))
    // percentile_disc plans as ObjectHashAggregate/SortAggregate with a
    // partial stage: two aggregate operators must appear
    val aggs = "(ObjectHashAggregate|SortAggregate|HashAggregate)".r
      .findAllIn(p).size
    assert(aggs >= 2, s"expect partial + final aggregate stages:\n$p")
  }
}
