package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Result-identity proof for d22's prefix-token candidate block (the
  * d10/e18 same-answer-better-plan pattern): the serving path generates
  * candidates by joining each doc's ~10% sorted-hash prefix against the
  * full token index — linear in corpus tokens — and the pigeonhole
  * argument in [[Dedup.d22Containment]]'s doc says that block is LOSSLESS
  * for the gate's `inter·10 ≥ mn·9` threshold. This spec executes both
  * the banded serving path and the unfiltered all-same-source-pairs twin
  * (the round-9 form) and requires bit-identical output, at the spec SF
  * and at the driver's correctness SF. */
class DedupIdentitySpec extends AnyFunSuite {
  import TestSession._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("d22: banded candidates reproduce the unfiltered pair join exactly (sf0.001 + sf0.01)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val banded = rows(Dedup.d22Containment(spark, dir))
      graft.operators.CacheScope.releaseAll(blocking = false)
      val full = rows(Dedup.d22ContainmentUnfiltered(spark, dir))
      assert(banded.nonEmpty, s"degenerate proof: zero containment pairs at $dir")
      assert(banded == full,
        s"banded/unfiltered divergence at $dir: ${banded.size} vs ${full.size} rows; " +
          s"first diff: ${banded.zipAll(full, "<missing>", "<missing>").find(p => p._1 != p._2)}")
    }
  }

  test("d23: the beyond-broadcast (budget=0) twin is bit-identical to the broadcast path") {
    // serving path: eval side fits the measured budget → broadcast hints.
    // budget=0 forces the beyond-broadcast form — same joins, no hints,
    // candidate join shuffles on the token key, verify join sort-merges
    // the corpus on c_id. The switch must never change a single row.
    val key = "graft.decontam.evalBroadcastBytes"
    val bcast = rows(Dedup.d23ContainmentDecontam(spark, sf))
    graft.operators.CacheScope.releaseAll(blocking = false)
    spark.conf.set(key, "0")
    try {
      val shuffled = rows(Dedup.d23ContainmentDecontam(spark, sf))
      assert(bcast.nonEmpty, "degenerate proof: zero decontamination pairs")
      assert(shuffled == bcast,
        s"budget switch changed the answer: ${shuffled.size} vs ${bcast.size} rows; " +
          s"first diff: ${shuffled.zipAll(bcast, "<missing>", "<missing>").find(p => p._1 != p._2)}")
    } finally {
      spark.conf.unset(key)
      graft.operators.CacheScope.releaseAll(blocking = false)
    }
  }

  test("d23: budget=0 drops every broadcast HINT; the in-budget path keeps them") {
    // The assertion is on the logical hints, not the physical exchanges:
    // at spec SF the planner's own statistics may (correctly) still pick
    // a broadcast join for the tiny frames — what the budget switch must
    // guarantee is that WE no longer force one when the eval side is
    // over budget, leaving the stats-driven choice to the planner.
    val key = "graft.decontam.evalBroadcastBytes"
    val served = Dedup.d23ContainmentDecontam(spark, sf)
      .queryExecution.optimizedPlan.toString
    graft.operators.CacheScope.releaseAll(blocking = false)
    spark.conf.set(key, "0")
    try {
      val beyond = Dedup.d23ContainmentDecontam(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(served.contains("strategy=broadcast"),
        "serving plan lost its in-budget eval broadcast hints")
      assert(!beyond.contains("strategy=broadcast"),
        "budget=0 plan still carries broadcast hints — the switch is dead code")
    } finally {
      spark.conf.unset(key)
      graft.operators.CacheScope.releaseAll(blocking = false)
    }
  }

  test("d22: the serving plan carries the prefix-token candidate join, the twin does not") {
    val served = Dedup.d22Containment(spark, sf).queryExecution.optimizedPlan.toString
    graft.operators.CacheScope.releaseAll(blocking = false)
    val twin = Dedup.d22ContainmentUnfiltered(spark, sf).queryExecution.optimizedPlan.toString
    // the banded path is the only d22 form with generators (two explodes:
    // prefix probe + full-token index)
    assert(served.contains("Generate explode"),
      "serving plan lost the prefix-token block (no explode present)")
    assert(!twin.contains("Generate explode"),
      "twin unexpectedly grew a generator — it must stay the plain pair join")
  }
}
