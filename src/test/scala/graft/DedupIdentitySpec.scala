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
